"""CMIP-standard pressure-level diagnostics (component #29).

Re-implements GFDL_tools/fv_cmip_diag.F90 (`fv_cmip_diag_init` /
`fv_cmip_diag`:58): the CMIP-named output set interpolated to the CMIP
standard pressure tables — ta/ua/va/hus/zg/wap on plev19 (Amon) or plev8
(day), single-level CMOR fields (ta500, zg500, ua200, ...), and the
near-surface/column integrals the reference registers from the dycore
state. Built on io/derived.py's pressure interpolation and the
DiagManager registry, like fv_diag.
"""

import jax.numpy as jnp

import gfdl_atmos_cubed_sphere_tpu.constants as con

#: CMIP6 Amon standard 19 pressure levels (Pa)
PLEV19 = (100000., 92500., 85000., 70000., 60000., 50000., 40000., 30000.,
          25000., 20000., 15000., 10000., 7000., 5000., 3000., 2000.,
          1000., 500., 100.)
#: CMIP6 day-table 8 levels (Pa)
PLEV8 = (100000., 85000., 70000., 50000., 25000., 10000., 5000., 1000.)

#: single-level CMOR names the reference registers (fv_cmip_diag.F90
#: register loop): field -> pressure (Pa)
SINGLES = {
    "ta500": ("ta", 50000.0), "ta700": ("ta", 70000.0),
    "zg500": ("zg", 50000.0), "zg100": ("zg", 10000.0),
    "zg10": ("zg", 1000.0),
    "ua200": ("ua", 20000.0), "va200": ("va", 20000.0),
    "ua850": ("ua", 85000.0), "va850": ("va", 85000.0),
    "hus850": ("hus", 85000.0), "wap500": ("wap", 50000.0),
}


def fv_cmip_diag(dm, state, q, g, ak, bk, ptop, plevs=PLEV19,
                 hydrostatic=True, prefix="cmip/"):
    """Compute + send the CMIP set; returns the dict of arrays.

    state: dict with delp, pt (temperature), u, v [, w, delz, omga, phis];
    q: tracer dict (sphum used for hus/zg virtual effect)."""
    from .derived import interp_to_pressure_levels, layer_heights
    from ..model.fv_update_phys import cubed_to_latlon

    delp, pt, u, v = (state[k] for k in ("delp", "pt", "u", "v"))
    sph = (q or {}).get("sphum")
    plv = jnp.asarray(plevs)

    ua, va = cubed_to_latlon(u, v, g)
    ps = ptop + jnp.sum(delp, axis=1)
    peln = jnp.log(jnp.concatenate(
        [jnp.full_like(delp[:, :1], ptop),
         ptop + jnp.cumsum(delp, axis=1)], axis=1))
    phis = state.get("phis")
    phis2d = phis[:, 0] if phis is not None and phis.ndim == 4 \
        else (phis if phis is not None else jnp.zeros_like(ps))
    if not hydrostatic and state.get("delz") is not None:
        zmid_ag, _ = layer_heights(delz=state["delz"])
        zmid = zmid_ag + (phis2d / con.GRAV)[:, None]   # above sea level
    else:
        # hydrostatic heights from the hypsometric relation
        tv = pt * (1.0 + con.ZVIR * sph) if sph is not None else pt
        dlogp = peln[:, 1:] - peln[:, :-1]
        dz_half = con.RDGAS * tv * dlogp / con.GRAV
        ztop_rel = jnp.flip(jnp.cumsum(jnp.flip(dz_half, axis=1), axis=1),
                            axis=1)
        zedge_rel = jnp.concatenate(
            [ztop_rel, jnp.zeros_like(ztop_rel[:, :1])], axis=1)
        zsfc = phis2d / con.GRAV
        zmid = zsfc[:, None] + 0.5 * (zedge_rel[:, 1:] + zedge_rel[:, :-1])

    fields3d = {"ta": pt, "ua": ua, "va": va, "zg": zmid}
    if sph is not None:
        fields3d["hus"] = sph
    if state.get("omga") is not None:
        fields3d["wap"] = state["omga"]

    out = {}
    for name, f in fields3d.items():
        out[name] = interp_to_pressure_levels(f, delp, ptop, plv)
    for cmor, (src, p) in SINGLES.items():
        if src in fields3d:
            out[cmor] = interp_to_pressure_levels(
                fields3d[src], delp, ptop, jnp.asarray([p]))[:, 0]

    # CMOR surface/column fields from the dycore state
    out["ps"] = ps
    out["tas"] = pt[:, -1]                       # lowest-layer proxy
    out["uas"], out["vas"] = ua[:, -1], va[:, -1]
    if sph is not None:
        out["huss"] = sph[:, -1]
        out["prw"] = jnp.sum(delp * sph, axis=1) / con.GRAV
    if q:
        lwp = sum(q[k] for k in ("liq_wat", "rainwat") if k in q)
        iwp = sum(q[k] for k in ("ice_wat", "snowwat", "graupel") if k in q)
        if not isinstance(lwp, int):
            out["clwvi"] = jnp.sum(delp * lwp, axis=1) / con.GRAV
        if not isinstance(iwp, int):
            out["clivi"] = jnp.sum(delp * iwp, axis=1) / con.GRAV

    for name, arr in out.items():
        full = prefix + name
        if full not in dm._fields:
            dm.register(full)
        dm.send(full, arr)
    return out
