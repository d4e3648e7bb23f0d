"""Configuration system (component #5).

Re-implements the role of /root/reference/model/fv_control.F90
(fv_control_init:99, namelists :865-1156): runtime options arrive as
Fortran namelists in `input.nml`; here the same names map mechanically onto
the typed config dataclasses (DynConfig mirrors fv_core_nml field names
1:1 where implemented, MPConfig mirrors gfdl_mp_nml), so reference
namelists translate directly.
"""

import re
from dataclasses import fields

from ..model.dyn_core import DynConfig
from ..physics.gfdl_mp import MPConfig

# fv_core_nml names that map to differently-named/derived DynConfig fields
_ALIASES = {
    "npz_type": None,           # handled by set_eta
    "layout": None,             # decomposition: mesh shape (driver concern)
    "io_layout": None,
    "ntiles": None,             # always 6 (cubed sphere)
    "npy": None,                # npy == npx on the cube
    "grid_type": None,          # gnomonic only (so far)
    "rf_fast": None,
}


def parse_namelist(text):
    """Parse Fortran namelist text -> {group: {name: value}}.

    Handles the subset the reference uses: scalars, logicals (.T./.false.),
    strings, comma-separated arrays, '!' comments."""
    groups = {}
    cur = None
    for raw in text.splitlines():
        line = raw.split("!", 1)[0].strip()
        if not line:
            continue
        m = re.match(r"&(\w+)", line)
        if m:
            cur = {}
            groups[m.group(1).lower()] = cur
            line = line[m.end():].strip()
        if line.startswith("/"):
            cur = None
            continue
        if cur is None or not line:
            continue
        for part in re.finditer(r"(\w+)\s*=\s*([^=]+?)(?=(?:,?\s*\w+\s*=)|$)",
                                line):
            name, val = part.group(1).lower(), part.group(2).strip().rstrip(",")
            cur[name] = _convert(val)
    return groups


def _convert(val):
    v = val.strip()
    if re.fullmatch(r"\.?t(rue)?\.?", v, re.I):
        return True
    if re.fullmatch(r"\.?f(alse)?\.?", v, re.I):
        return False
    if v.startswith(("'", '"')):
        return v.strip("'\"")
    if "," in v:
        return [_convert(x) for x in v.split(",") if x.strip()]
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v.replace("d", "e").replace("D", "E"))
    except ValueError:
        return v


def dyn_config_from_namelist(nml, **required):
    """Build a DynConfig from a parsed (or dict) fv_core_nml group.

    `required`: npx/npz/dt if not present in the namelist. Unknown namelist
    options are collected and returned for visibility instead of silently
    dropped."""
    group = nml.get("fv_core_nml", nml) if isinstance(nml, dict) else {}
    known = {f.name for f in fields(DynConfig)}
    kwargs = dict(required)
    unknown = {}
    for name, value in group.items():
        if name in known:
            kwargs.setdefault(name, value)
        elif name not in _ALIASES:
            unknown[name] = value
    if "npx" not in kwargs and "npx" in group:
        kwargs["npx"] = group["npx"]
    return DynConfig(**kwargs), unknown


def mp_config_from_namelist(nml):
    group = nml.get("gfdl_mp_nml", nml) if isinstance(nml, dict) else {}
    known = {f.name for f in fields(MPConfig)}
    kwargs = {k: v for k, v in group.items() if k in known}
    unknown = {k: v for k, v in group.items() if k not in known}
    return MPConfig(**kwargs), unknown


def load_input_nml(path, **required):
    """Read an input.nml file -> (DynConfig, MPConfig, unknown-options)."""
    with open(path) as f:
        nml = parse_namelist(f.read())
    dyn, unk1 = dyn_config_from_namelist(nml, **required)
    mpc, unk2 = mp_config_from_namelist(nml)
    return dyn, mpc, {"fv_core_nml": unk1, "gfdl_mp_nml": unk2}


def grid_kwargs_from_namelist(nml):
    """fv_core_nml grid-refinement options -> build_grid_ops kwargs
    (do_schmidt/do_cube_transform + stretch_fac, target_lon/lat in degrees
    — fv_control.F90:930-959, converted to radians like fv_grid_tools)."""
    import math
    core = nml.get("fv_core_nml", {})
    kw = {}
    if core.get("do_schmidt") or core.get("do_cube_transform"):
        kw["stretch_fac"] = float(core.get("stretch_fac", 1.0))
        kw["target_lon"] = math.radians(float(core.get("target_lon", 0.0)))
        kw["target_lat"] = math.radians(float(core.get("target_lat", 0.0)))
        kw["do_cube_transform"] = bool(core.get("do_cube_transform", False))
    return kw
