"""Diagnostics registry + state audits (component #26).

Re-implements the patterns of /root/reference/tools/fv_diagnostics.F90:
`prt_maxmin`/`prt_mxm` global min/max audits (:105), `range_check` fatal
bounds (:105, used fv_dynamics.F90:817-827), and a diag_manager-style field
registry (`register_diag_field`/`send_data`) writing time series to an
in-memory store or a NetCDF3 history file (scipy backend).
"""

import numpy as np
import jax.numpy as jnp

# The reference's 31 GFS standard pressure levels for the plev/levs suites
# (fv_diagnostics.F90:361), in hPa, top -> bottom.
STD_PLEVS = [1, 2, 3, 5, 7, 10, 20, 30, 50, 70, 100, 150, 200, 250, 300,
             350, 400, 450, 500, 550, 600, 650, 700, 750, 800, 850, 900,
             925, 950, 975, 1000]

# name -> (long_name, units) metadata mirroring register_diag_field calls
# in fv_diagnostics.F90 (subset; unlisted names register with blanks).
FIELD_CATALOG = {
    "ucomp": ("zonal wind", "m/sec"),
    "vcomp": ("meridional wind", "m/sec"),
    "temp": ("temperature", "K"),
    "delp": ("pressure thickness", "pa"),
    "delz": ("height thickness", "m"),
    "w": ("vertical wind", "m/sec"),
    "ps": ("surface pressure", "pa"),
    "slp": ("sea-level pressure", "mb"),
    "tm": ("mean 300-500 mb temp", "K"),
    "vort": ("vorticity", "1/s"),
    "pv": ("potential vorticity", "1/s"),
    "pv350K": ("350-K potential vorticity; needs x350 scaling",
               "(K m**2) / (kg s)"),
    "pv550K": ("550-K potential vorticity; needs x550 scaling",
               "(K m**2) / (kg s)"),
    "theta": ("potential temperature", "K"),
    "theta_e": ("equivalent potential temperature", "K"),
    "omega": ("omega", "Pa/s"),
    "divg": ("instantaneous divergence", "1/s"),
    "hght": ("height", "m"),
    "rh": ("relative humidity", "%"),
    "zsurf": ("surface height", "m"),
    "te": ("Total Energy", "J/m/s^2"),
    "ke": ("Total KE", "m^2/s^2"),
    "ws": ("wind speed", "m/s"),
    "reflectivity": ("Stoelinga simulated reflectivity", "dBz"),
    "max_reflectivity":
        ("Stoelinga simulated maximum (composite) reflectivity", "dBz"),
    "base_reflectivity":
        ("Stoelinga simulated base (1 km AGL) reflectivity", "dBz"),
    "4km_reflectivity": ("Stoelinga simulated base reflectivity", "dBz"),
    "echo_top": ("Echo top ( <= 18.5 dBz )", "m"),
    "m10C_reflectivity": ("Reflectivity at -10C level", "m"),
    "40dBz_height": ("Height of 40 dBz reflectivity", "m"),
    "cape": ("Convective available potential energy (surface-based)",
             "J/kg"),
    "cin": ("Convective inhibition (surface-based)", "J/kg"),
    "BRN": ("Bulk Richardson Number", "nondim"),
    "shear06": ("0--6 km shear", "m/s"),
    "srh01": ("0-1 km Storm Relative Helicity", "m/s**2"),
    "srh03": ("0-3 km Storm Relative Helicity", "m/s**2"),
    "srh25": ("2-5 km Storm Relative Helicity", "m/s**2"),
    "ustm": ("u Component of Storm Motion", "m/s"),
    "vstm": ("v Component of Storm Motion", "m/s"),
    "uh03": ("0-3 km Updraft Helicity", "m/s**2"),
    "uh25": ("2-5 km Updraft Helicity", "m/s**2"),
    "intqv": ("Vertically Integrated Water Vapor", "kg/m**2"),
    "intql": ("Vertically Integrated Cloud Water", "kg/m**2"),
    "intqi": ("Vertically Integrated Cloud Ice", "kg/m**2"),
    "intqr": ("Vertically Integrated Rain", "kg/m**2"),
    "intqs": ("Vertically Integrated Snow", "kg/m**2"),
    "intqg": ("Vertically Integrated Graupel", "kg/m**2"),
    "tq": ("Total water path", "kg/m**2"),
    "lw": ("Liquid water path", "kg/m**2"),
    "iw": ("Ice water path", "kg/m**2"),
    "tb": ("lowest layer temperature", "K"),
    "ctt": ("cloud_top temperature", "K"),
    "ctp": ("cloud_top pressure", "hPa"),
    "ctz": ("cloud_top height", "m"),
    "cat15": ("de-pression < 1000", "mb"),
    "cat25": ("de-pression < 980", "mb"),
    "cat35": ("de-pression < 964", "mb"),
    "cat45": ("de-pression < 944", "mb"),
    "f15": ("Cat15 frequency", "none"),
    "f25": ("Cat25 frequency", "none"),
    "f35": ("Cat35 frequency", "none"),
    "f45": ("Cat45 frequency", "none"),
    "uq": ("zonal moisture flux", "Kg/Kg*m/sec"),
    "vq": ("meridional moisture flux", "Kg/Kg*m/sec"),
    "ut": ("zonal heat flux", "K*m/sec"),
    "vt": ("meridional heat flux", "K*m/sec"),
    "uu": ("zonal flux of zonal wind", "(m/sec)^2"),
    "uv": ("zonal flux of meridional wind", "(m/sec)^2"),
    "vv": ("meridional flux of meridional wind", "(m/sec)^2"),
    "uw": ("vertical zonal momentum flux", "N/m**2"),
    "vw": ("vertical meridional momentum flux", "N/m**2"),
    "wq": ("vertical moisture flux", "Kg/Kg*m/sec"),
    "wt": ("vertical heat flux", "K*m/sec"),
    "ww": ("vertical flux of vertical wind", "(m/sec)^2"),
    "u_plev": ("zonal wind", "m/sec"),
    "v_plev": ("meridional wind", "m/sec"),
    "t_plev": ("temperature", "K"),
    "h_plev": ("height", "m"),
    "q_plev": ("specific humidity", "kg/kg"),
    "omg_plev": ("omega", "Pa/s"),
    "w_plev": ("vertical wind", "m/sec"),
    "vort_plev": ("vorticity", "1/s"),
    "rh_plev": ("relative humidity", "%"),
    "aam": ("angular momentum", "kg*m^2/s"),
    "pmask": ("masking pressure at lowest level", "mb"),
    "pmaskv2": ("masking pressure at lowest level", "mb"),
    "qn": ("cloud condensate", "kg/m/s^2"),
    "qp": ("precip condensate", "kg/m/s^2"),
    "pfhy": ("hydrostatic pressure", "pa"),
    "pfnh": ("non-hydrostatic pressure", "pa"),
    "ppnh": ("non-hydrostatic pressure perturbation", "pa"),
    "s200": ("200-mb wind_speed", "m/s"),
    "sl12": ("12th L wind_speed", "m/s"),
    "sl13": ("13th L wind_speed", "m/s"),
    "qn200": ("200mb condensate", "kg/m/s^2"),
    "qn500": ("500mb condensate", "kg/m/s^2"),
    "qn850": ("850mb condensate", "kg/m/s^2"),
    "rain5km": ("5-km AGL liquid water", "kg/kg"),
    "w5km": ("5-km AGL w-wind", "m/s"),
    "w2500m": ("2.5-km AGL w-wind", "m/s"),
    "w1km": ("1-km AGL w-wind", "m/s"),
    "wmaxup": ("column-maximum updraft (below 100 mb)", "m/s"),
    "wmaxdn": ("column-maximum downdraft (below 100 mb)", "m/s"),
    "x850": ("850-mb vertical comp. of helicity", "m/s**2"),
    "u100m": ("100-m AGL u-wind", "m/s"),
    "v100m": ("100-m AGL v-wind", "m/s"),
    "wind100m": ("100-m AGL windspeed", "m/s"),
    "us": ("surface u-wind", "m/sec"),
    "vs": ("surface v-wind", "m/sec"),
}


# ---- state audits ---------------------------------------------------------

def prt_maxmin(name, field, fac=1.0, out=print):
    """Global min/max printer (fv_diagnostics prt_maxmin)."""
    lo = float(jnp.min(field)) * fac
    hi = float(jnp.max(field)) * fac
    out(f" {name:<10s} max = {hi:24.17g}  min = {lo:24.17g}")
    return lo, hi


RANGE_LIMITS = {
    # fv_dynamics.F90:817-827 defaults
    "ua": (-280.0, 280.0), "va": (-280.0, 280.0),
    "u": (-280.0, 280.0), "v": (-280.0, 280.0),
    "pt": (130.0, 350.0), "w": (-80.0, 100.0),
}


def range_check(name, field, lo=None, hi=None):
    """Bounds audit (fv_diagnostics range_check). Returns (ok, min, max);
    raising is the caller's choice (JAX-friendly: no device sync in jit)."""
    if lo is None or hi is None:
        lo, hi = RANGE_LIMITS.get(name, (-np.inf, np.inf))
    fmin = float(jnp.min(field))
    fmax = float(jnp.max(field))
    ok = (fmin >= lo) and (fmax <= hi) and np.isfinite(fmin) and np.isfinite(fmax)
    return ok, fmin, fmax


def range_check_jit(name, field, lo=None, hi=None):
    """Jit-internal bounds audit: returns DEVICE scalars (ok, fmin, fmax)
    with no host sync, so the step function can carry audit flags through
    jit (the reference runs range_check every step, fv_dynamics.F90:
    817-827; host-side float() would serialize the dispatch pipeline)."""
    if lo is None or hi is None:
        lo, hi = RANGE_LIMITS.get(name, (-np.inf, np.inf))
    fmin = jnp.min(field)
    fmax = jnp.max(field)
    ok = ((fmin >= lo) & (fmax <= hi)
          & jnp.isfinite(fmin) & jnp.isfinite(fmax))
    return ok, fmin, fmax


def audit_state(fields):
    """Jit-safe audit of a dict of named fields -> dict of (ok, min, max)
    device scalars; reduce with audit_ok() for a single step-health flag."""
    return {k: range_check_jit(k, v) for k, v in fields.items()
            if v is not None}


def audit_ok(audit):
    """Fold an audit_state result into one boolean device scalar."""
    flags = [v[0] for v in audit.values()]
    out = flags[0]
    for f in flags[1:]:
        out = out & f
    return out


def coarse_diag(dm, fields, factor, strategy="area", area=None, prefix="crs_"):
    """Coarse-grained diagnostics mirror (coarse_grained_diagnostics.F90:78):
    send block-coarsened copies of `fields` to the DiagManager under
    prefix+name, auto-registering on first use."""
    from ..utils import coarse_graining as cg
    for name, f in fields.items():
        if f is None:
            continue
        cname = prefix + name
        if cname not in dm._fields:
            dm.register(cname, long_name=f"coarse {name}", units="")
        fa = np.asarray(f)
        if strategy == "area" and area is not None:
            c = cg.block_area_weighted_mean(fa, np.asarray(area), factor)
        else:
            c = cg.block_mean(fa, factor)
        dm.send(cname, c)


def nan_check(tree):
    """Names of fields containing NaN (the fv_debug NaN hunt,
    fv_dynamics.F90:592-604)."""
    bad = []
    for k, v in tree.items():
        if v is not None and bool(jnp.isnan(v).any()):
            bad.append(k)
    return bad


# ---- diag registry --------------------------------------------------------

def parse_diag_table(text):
    """Parse an FMS `diag_table` (the runtime field-selection file the
    reference reads through diag_manager_mod; format documented in FMS
    diag_table.html): a title line, a base-date line, then file lines
      "file_name", output_freq, "freq_units", file_format, "time_units",
      "time_long_name"
    and field lines
      "module_name", "field_name", "output_name", "file_name",
      "time_sampling", "reduction_method", "regional_section", packing

    Returns dict(title, base_date, files={name: dict(freq, freq_units)},
    fields=[dict(module, field, output_name, file, reduction)], and
    selected = {field_name, ...} — the set fv_diag uses to restrict which
    diagnostics are computed/registered)."""
    import re

    title = None
    base_date = None
    files = {}
    fields = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if not line.startswith('"'):
            toks = line.split()
            if (base_date is None and len(toks) >= 6
                    and all(t.lstrip("-").isdigit() for t in toks[:6])):
                base_date = tuple(int(t) for t in toks[:6])
            elif title is None:
                title = line
            continue
        parts = [p.strip().strip('"')
                 for p in re.findall(r'"[^"]*"|[^,]+', line)]
        parts = [p for p in parts if p]
        if len(parts) < 4:
            continue
        if parts[1].lstrip("-").isdigit():        # file line
            files[parts[0]] = dict(freq=int(parts[1]),
                                   freq_units=parts[2].strip())
        else:                                     # field line
            fields.append(dict(
                module=parts[0], field=parts[1], output_name=parts[2],
                file=parts[3],
                reduction=parts[5] if len(parts) > 5 else ".false."))
    return dict(title=title, base_date=base_date, files=files,
                fields=fields,
                selected={f["field"] for f in fields})


class DiagManager:
    """register_diag_field/send_data analog: named fields accumulated per
    step, flushed to a NetCDF3 history file or kept in memory.

    Time-interval averaging (diag_manager_mod's time_avg output semantics,
    diag_data freq handling): register with avg_interval=N to average every
    N sends into one output record instead of storing each send. Static
    (time-invariant) fields register with static=True and store once.

    `selection` (a set of field names, e.g. parse_diag_table(...)
    ["selected"]) restricts the manager to the listed fields: register()
    of any other name is a no-op returning None and send() to it returns
    False — the runtime field-selection semantics of the reference's
    diag_table (register_diag_field returns id -1 for unlisted fields
    and every send is guarded on id > 0)."""

    def __init__(self, selection=None):
        self._fields = {}
        self._store = {}
        self._acc = {}
        self.selection = set(selection) if selection is not None else None

    def register(self, name, long_name="", units="", avg_interval=0,
                 static=False):
        if self.selection is not None and name not in self.selection:
            return None
        self._fields[name] = dict(long_name=long_name, units=units,
                                  avg=int(avg_interval), static=static)
        self._store[name] = []
        if avg_interval:
            self._acc[name] = [None, 0.0]   # running sum, weight
        return name

    def send(self, name, data, weight=1.0):
        if name not in self._store:
            return False
        meta = self._fields[name]
        if meta.get("static"):
            if not self._store[name]:
                self._store[name].append(np.asarray(data))
            return True
        if meta.get("avg"):
            s, w = self._acc[name]
            d = np.asarray(data, np.float64) * weight
            self._acc[name] = [d if s is None else s + d, w + weight]
            if self._acc[name][1] >= meta["avg"] - 1e-12:
                s, w = self._acc[name]
                self._store[name].append((s / w))
                self._acc[name] = [None, 0.0]
            return True
        self._store[name].append(np.asarray(data))
        return True

    def flush_avg(self, name=None):
        """Emit any partial averaging interval as a record (end-of-run)."""
        names = [name] if name else list(self._acc)
        for nm in names:
            s, w = self._acc.get(nm, (None, 0.0))
            if s is not None and w > 0:
                self._store[nm].append(s / w)
                self._acc[nm] = [None, 0.0]

    def series(self, name):
        return np.stack(self._store[name]) if self._store[name] else None

    def write_netcdf(self, path):
        """History file via scipy NetCDF3 (diag_manager send_data sink)."""
        from scipy.io import netcdf_file
        with netcdf_file(path, "w") as f:
            first = True
            for name, rows in self._store.items():
                if not rows:
                    continue
                arr = np.stack(rows)
                if first:
                    f.createDimension("time", arr.shape[0])
                    first = False
                dims = ["time"]
                for i, s in enumerate(arr.shape[1:]):
                    dn = f"{name}_d{i}"
                    f.createDimension(dn, s)
                    dims.append(dn)
                var = f.createVariable(name, "f", tuple(dims))
                var[:] = arr.astype(np.float32)
                var.long_name = self._fields[name]["long_name"]
                var.units = self._fields[name]["units"]


# ---- derived diagnostics --------------------------------------------------

def zonal_mean(field, lat, bins=64):
    """Area-unweighted zonal-mean profile on latitude bins; field [6, ...,
    n, n], lat [6, n, n] (radians). Returns (lat_centers, mean[..., bins])."""
    f = np.asarray(field)
    la = np.asarray(lat)
    edges = np.linspace(-np.pi / 2, np.pi / 2, bins + 1)
    idx = np.clip(np.digitize(la, edges) - 1, 0, bins - 1)
    lead = f.shape[1:-2]
    fm = f.reshape((6,) + lead + (-1,))
    ix = idx.reshape(6, -1)
    out = np.zeros(lead + (bins,))
    cnt = np.zeros(bins)
    for t in range(6):
        np.add.at(out, (..., ix[t]), fm[t])
        np.add.at(cnt, ix[t], 1.0)
    return 0.5 * (edges[:-1] + edges[1:]), out / np.maximum(cnt, 1.0)


def surface_pressure(delp, ptop):
    return ptop + jnp.sum(delp, axis=1)


class ColumnDiag:
    """Pointwise column ("sounding") diagnostics at named lat-lon locations
    (tools/fv_diag_column.F90 fv_diag_column_init/read locations :60-200,
    sounding printout): each location is snapped to the nearest cube cell
    center at init; sample() extracts full columns, printout() formats them.
    """

    def __init__(self, geom, points):
        """points: list of (name, lon_deg, lat_deg)."""
        lon = np.asarray(geom.interior("aglon"))
        lat = np.asarray(geom.interior("aglat"))
        self.points = []
        for name, plon, plat in points:
            lo = np.deg2rad(plon % 360.0)
            la = np.deg2rad(plat)
            # nearest cell center by chord distance
            d = (np.cos(lat) * np.cos(la) * np.cos(lon - lo)
                 + np.sin(lat) * np.sin(la))
            t, j, i = np.unravel_index(np.argmax(d), lon.shape)
            self.points.append(dict(
                name=name, tile=int(t), j=int(j), i=int(i),
                lon=float(np.rad2deg(lon[t, j, i])),
                lat=float(np.rad2deg(lat[t, j, i]))))

    def sample(self, fields):
        """fields: dict name -> [T, K, n, n] (or [T, n, n]) arrays.
        Returns {point_name: {field: column ndarray}}."""
        out = {}
        for p in self.points:
            cols = {}
            for fname, arr in fields.items():
                if arr is None:
                    continue
                a = np.asarray(arr)
                cols[fname] = (a[p["tile"], :, p["j"], p["i"]]
                               if a.ndim == 4 else a[p["tile"], p["j"], p["i"]])
            out[p["name"]] = cols
        return out

    def printout(self, fields, out=print):
        """Formatted sounding block per point (the do_diag_debug printout)."""
        samples = self.sample(fields)
        for p in self.points:
            cols = samples[p["name"]]
            out(f"=== column '{p['name']}' at ({p['lat']:.2f}N, "
                f"{p['lon']:.2f}E) tile {p['tile']} ===")
            names = [k for k, v in cols.items() if np.ndim(v) == 1]
            scalars = {k: v for k, v in cols.items() if np.ndim(v) == 0}
            for k, v in scalars.items():
                out(f"  {k} = {float(v):.6g}")
            # group profile fields by column length (e.g. K vs K+1 vs 1)
            lengths = sorted({len(cols[nm]) for nm in names})
            for L in lengths:
                grp = [nm for nm in names if len(cols[nm]) == L]
                out("  k   " + "  ".join(f"{k:>12s}" for k in grp))
                for kk in range(L):
                    out(f"  {kk:3d} " + "  ".join(
                        f"{float(cols[nm][kk]):12.5g}" for nm in grp))
        return samples


def fv_diag(dm, state, q, g, ak, bk, ptop, plevs=(850.0e2, 500.0e2, 200.0e2),
            hydrostatic=True, prefix="", plev_suite=True):
    """Standard diagnostic sweep (fv_diagnostics.F90 fv_diag:1590): computes
    the core registered-field set from the prognostic state and sends each
    to the DiagManager `dm` (registering on first use).

    state: dict with delp, pt (temperature), u, v [, w, delz, omga];
    q: tracer dict or None.  Sends 3-D fields (ucomp, vcomp, temp, delp,
    vort, pv, tracers), 2-D fields (ps, slp, vort850, composite
    reflectivity, 2-5 km updraft helicity, CAPE/CIN, per-plev u/v/t/h), and
    returns the dict of computed arrays for callers that want them."""
    import jax.numpy as jnp

    import gfdl_atmos_cubed_sphere_tpu.constants as con
    from .derived import (relative_vorticity, potential_vorticity,
                          sea_level_pressure, interp_to_pressure_levels,
                          cape_cin, radar_reflectivity, updraft_helicity,
                          layer_heights, layer_pressures,
                          potential_temperature,
                          equivalent_potential_temperature,
                          relative_humidity, divergence, interp_to_height,
                          bunkers_motion, storm_relative_helicity,
                          wind_shear, echo_top, interp_to_theta, box_max,
                          bulk_richardson)
    from ..model.fv_update_phys import cubed_to_latlon

    delp, pt, u, v = (state[k] for k in ("delp", "pt", "u", "v"))
    sph = (q or {}).get("sphum")
    out = {}

    ua, va = cubed_to_latlon(u, v, g)
    out["ucomp"], out["vcomp"] = ua, va
    out["temp"] = pt
    out["delp"] = delp
    ps = ptop + jnp.sum(delp, axis=1)
    out["ps"] = ps
    vort = relative_vorticity(u, v, g)
    out["vort"] = vort
    out["pv"] = potential_vorticity(u, v, pt, delp, g, ptop=ptop)
    phis2 = (state["phis"][:, 0] if state.get("phis") is not None
             else jnp.zeros_like(ps))
    out["zsurf"] = phis2 / con.GRAV
    out["slp"] = sea_level_pressure(ps, phis2, pt[:, -1])
    if "omga" in state and state["omga"] is not None:
        out["omga"] = state["omga"]
    if q:
        for name, field in q.items():
            out[name] = field

    # ---- thermodynamic 3-D set (id_theta/theta_e/rh/divg/hght/ke/te) -----
    pe, peln, p_lay = layer_pressures(delp, ptop)
    out["theta"] = potential_temperature(pt, p_lay)
    out["divg"] = divergence(ua, va, g)
    out["ws"] = jnp.sqrt(ua ** 2 + va ** 2)
    out["ke"] = 0.5 * (ua ** 2 + va ** 2)
    if sph is not None:
        out["theta_e"] = equivalent_potential_temperature(pt, p_lay, sph)
        out["rh"] = relative_humidity(pt, p_lay, sph)
    w = state.get("w")
    delz = state.get("delz")
    if not hydrostatic and delz is not None:
        zm, zbot = layer_heights(delz=delz)
        dz = -delz
        out["delz"] = delz
    else:
        zm, zbot = layer_heights(pt=pt, peln=peln, sphum=sph)
        dz = None
    out["hght"] = zm + (phis2 / con.GRAV)[:, None]
    cv_air = con.CP_AIR - con.RDGAS
    out["te"] = (cv_air * pt + 0.5 * (ua ** 2 + va ** 2)
                 + con.GRAV * out["hght"])
    if w is not None:
        out["w"] = w

    # ---- pressure-level set (u/v/t/vort/rh/theta_e/omg/q _plev) ----------
    for p in plevs:
        tag = f"{int(p / 100)}"
        fields = [("u", ua), ("v", va), ("t", pt), ("vort", vort)]
        if sph is not None:
            fields += [("rh", out["rh"]), ("thetae", out["theta_e"]),
                       ("q", sph)]
        if "omga" in out:
            fields.append(("omg", out["omga"]))
        for nm, f in fields:
            out[f"{nm}{tag}"] = interp_to_pressure_levels(
                f, delp, ptop, jnp.asarray([p]))[:, 0]
    if "u200" in out:
        out["s200"] = jnp.sqrt(jnp.nan_to_num(out["u200"]) ** 2
                               + jnp.nan_to_num(out["v200"]) ** 2)
    # mass-weighted 300-500 hPa mean temperature (id_tm, the steering-layer
    # metric of fv_diagnostics.F90:1483)
    msk = ((p_lay >= 3.0e4) & (p_lay <= 5.0e4)).astype(pt.dtype)
    out["tm"] = (jnp.sum(pt * delp * msk, axis=1)
                 / jnp.maximum(jnp.sum(delp * msk, axis=1), 1.0))

    # ---- condensate integrals + cloud-top (intq*/lw/iw/ct*) --------------
    if q:
        qn = jnp.zeros_like(pt)
        for name, short in (("sphum", "intqv"), ("liq_wat", "intql"),
                            ("rainwat", "intqr"), ("ice_wat", "intqi"),
                            ("snowwat", "intqs"), ("graupel", "intqg")):
            if name in q:
                out[short] = jnp.sum(delp * q[name], axis=1) / con.GRAV
                if name != "sphum":
                    qn = qn + q[name]
        if "intql" in out and "intqr" in out:
            out["lw"] = out["intql"] + out["intqr"]
        if "intqi" in out and "intqs" in out and "intqg" in out:
            out["iw"] = out["intqi"] + out["intqs"] + out["intqg"]
        out["qn"] = qn
        cloudy = qn > 1.0e-6
        out["ctz"] = jnp.max(jnp.where(cloudy, out["hght"], -1.0), axis=1)
        big = jnp.asarray(1.0e30, pt.dtype)
        ctt = jnp.min(jnp.where(cloudy, pt, big), axis=1)
        ctp = jnp.min(jnp.where(cloudy, p_lay, big), axis=1)
        out["ctt"] = jnp.where(ctt >= big, jnp.nan, ctt)
        out["ctp"] = jnp.where(ctp >= big, jnp.nan, ctp)

    if q and "rainwat" in q:
        dbz, comp = radar_reflectivity(delp, pt, q,
                                       delz=state.get("delz"),
                                       peln=None if not hydrostatic
                                       else peln)
        out["reflectivity"] = dbz
        out["max_reflectivity"] = comp
        out["base_reflectivity"] = dbz[:, -1]
        out["4km_reflectivity"] = interp_to_height(dbz, zm, (4.0e3,))[:, 0]
        out["echo_top"] = echo_top(dbz, zm)

    # ---- severe-weather 2-D set (wz-interpolated winds, SRH, shear) ------
    out["us"], out["vs"] = ua[:, -1], va[:, -1]
    out["vorts"] = vort[:, -1]
    uvh = interp_to_height(ua, zm, (100.0,))[:, 0]
    vvh = interp_to_height(va, zm, (100.0,))[:, 0]
    out["u100m"], out["v100m"] = uvh, vvh
    out["wind100m"] = jnp.sqrt(uvh ** 2 + vvh ** 2)
    dzw = dz if dz is not None else (zm - zbot) * 2.0
    out["shear06"] = wind_shear(ua, va, zm, dzw)
    ustm, vstm = bunkers_motion(ua, va, zm, dzw)
    out["ustm"], out["vstm"] = ustm, vstm
    out["srh01"] = storm_relative_helicity(ua, va, zm, dzw, ustm, vstm,
                                           0.0, 1.0e3)
    out["srh03"] = storm_relative_helicity(ua, va, zm, dzw, ustm, vstm,
                                           0.0, 3.0e3)
    if w is not None:
        for zt, nm in ((1.0e3, "w1km"), (2.5e3, "w2500m"), (5.0e3, "w5km")):
            out[nm] = interp_to_height(w, zm, (zt,))[:, 0]
        out["wmaxup"] = jnp.max(jnp.maximum(w, 0.0), axis=1)
        out["wmaxdn"] = jnp.min(jnp.minimum(w, 0.0), axis=1)
        out["uh03"] = updraft_helicity(vort, w, zm, dzw, 0.0, 3.0e3)
        if delz is not None:
            out["uh25"] = updraft_helicity(vort, w, zm, -delz)
    if sph is not None:
        cape, cin = cape_cin(pt, delp, sph, ptop)
        out["cape"] = cape
        out["cin"] = cin
        # total water path (kg/m^2)
        out["tq"] = jnp.sum(delp * sph, axis=1) / con.GRAV
        out["BRN"] = bulk_richardson(cape, ua, va, zm, dzw)

    # ---- standard-pressure-level suites (id_u_plev + id_u_levs family,
    # fv_diagnostics.F90:985-1030, 574-600; 31 GFS standard levels) ------
    if plev_suite:
        pl = jnp.asarray([p * 100.0 for p in STD_PLEVS], pt.dtype)

        def on_plevs(f):
            return interp_to_pressure_levels(f, delp, ptop, pl)

        suites = {"u": ua, "v": va, "t": pt, "theta": out["theta"],
                  "vort": vort, "dp": delp,
                  "h": out["hght"]}
        if sph is not None:
            suites["q"] = sph
            suites["rh"] = out["rh"]
            suites["theta_e"] = out["theta_e"]
        if "omga" in out:
            suites["omg"] = out["omga"]
        elif w is not None and dz is not None:
            # omega ~ -rho g w = -(delp/dz) w when the core did not carry
            # omga through (pressure-velocity estimate, Pa/s)
            suites["omg"] = -delp / jnp.maximum(dz, 1.0e-3) * w
        if w is not None:
            suites["w"] = w
        for qk, short in (("liq_wat", "ql"), ("ice_wat", "qi"),
                          ("rainwat", "qr"), ("snowwat", "qs"),
                          ("graupel", "qg"), ("cld_amt", "cf")):
            if q and qk in q:
                suites[short] = q[qk]
        named_levels = (100, 200, 250, 300, 500, 700, 850, 925)
        for nm, f in suites.items():
            fp = on_plevs(f)
            out[f"{nm}_plev"] = fp
            # per-level named 2-D fields (id_*_levs: u850, z500, ...)
            for p in named_levels:
                k = STD_PLEVS.index(p)
                key = f"z{p}" if nm == "h" else f"{nm}{p}"
                out[key] = fp[:, k]
        # CMIP relative humidity singles (id_rh*_cmip)
        if sph is not None:
            for p in (10, 50, 100, 250, 300, 500, 700, 850, 925, 1000):
                k = STD_PLEVS.index(p) if p in STD_PLEVS else None
                if k is not None:
                    out[f"rh{p}_cmip"] = out["rh_plev"][:, k]

    # ---- 3-D flux products + vertical integrals (id_uq..id_iww,
    # fv_diagnostics.F90:1166-1256) --------------------------------------
    flux_pairs = [("uu", ua * ua), ("uv", ua * va), ("vv", va * va),
                  ("ut", ua * pt), ("vt", va * pt)]
    if sph is not None:
        flux_pairs += [("uq", ua * sph), ("vq", va * sph)]
    if w is not None:
        flux_pairs += [("uw", ua * w), ("vw", va * w), ("ww", w * w),
                       ("wt", w * pt)]
        if sph is not None:
            flux_pairs.append(("wq", w * sph))
    for nm, f in flux_pairs:
        out[nm] = f
        out[f"{nm}_vi"] = jnp.sum(f * delp, axis=1)

    # ---- isentropic PV (id_pv350K/id_pv550K; "needs x350/x550 scaling")
    pv_theta = interp_to_theta(out["pv"], out["theta"], (350.0, 550.0))
    out["pv350K"] = pv_theta[:, 0]
    out["pv550K"] = pv_theta[:, 1]

    # ---- misc 2-D/3-D singles matching the reference registry ----------
    out["tb"] = pt[:, -1]                       # lowest layer temperature
    out["pmask"] = p_lay[:, -1] / 100.0         # bottom-layer pressure, mb
    out["pmaskv2"] = pe[:, -1] / 100.0
    out["omega"] = out.get("omga", jnp.zeros_like(pt))
    out["delp_total"] = delp
    out["x850"] = out.get("vort850", vort[:, -1])
    K = pt.shape[1]
    if K > 13:
        out["sl12"] = out["ws"][:, 11]          # 12th-level wind speed
        out["sl13"] = out["ws"][:, 12]
    if q:
        out["qp"] = (q.get("rainwat", 0.0) + q.get("snowwat", 0.0)
                     + q.get("graupel", 0.0)) * jnp.ones_like(pt)
        for p in (200, 500, 850):
            if plev_suite:
                out[f"qn{p}"] = interp_to_pressure_levels(
                    out["qn"], delp, ptop, jnp.asarray([p * 100.0]))[:, 0]
        if "liq_wat" in q:
            out["rain5km"] = interp_to_height(
                q.get("rainwat", q["liq_wat"]), zm, (5.0e3,))[:, 0]
    out["srh25"] = storm_relative_helicity(ua, va, zm, dzw, ustm, vstm,
                                           2.0e3, 5.0e3)
    if "reflectivity" in out:
        # reflectivity on the -10 C level + height of the 40 dBz surface
        t_m10 = jnp.sum(
            jnp.where(jnp.cumsum((pt > 263.15).astype(pt.dtype),
                                 axis=1) == 1.0, out["reflectivity"], 0.0),
            axis=1)
        out["m10C_reflectivity"] = t_m10
        dbz40 = jnp.where(out["reflectivity"] >= 40.0, zm, -1.0)
        out["40dBz_height"] = jnp.max(dbz40, axis=1)

    # ---- hydrostatic/NH pressures (id_pfhy/id_pfnh/id_ppnh) ------------
    if not hydrostatic and delz is not None:
        rrg = con.RDGAS / con.GRAV
        tvx = pt if sph is None else pt * (1.0 + con.ZVIR * sph)
        out["pfnh"] = -rrg * delp / delz * tvx
        out["pfhy"] = p_lay
        out["ppnh"] = out["pfnh"] - p_lay
    else:
        out["pfhy"] = p_lay

    # ---- angular momentum + mountain torque (id_aam/id_amdt/id_mq) -----
    try:
        from ..model.thermodynamics import compute_aam
        aam, m_fac, _ = compute_aam(state["u"], state["v"], delp, g, ptop)
        out["aam"] = aam
    except Exception:
        pass

    # ---- hurricane category diagnostics (id_c15..id_f45,
    # fv_diagnostics.F90:1627-1630, 1977-2030, 2423-2530):
    # cat15: SLP<1000 mb within a storm mask = 7x7 surface wind max > 16
    # m/s, |lat|<45, terrain < 500 m, bottom/850-mb vorticity cyclonic,
    # warm core (tm >= 254 K, bottom T >= 281 K); cat25/35/45 additionally
    # need wind max > 20 m/s and SLP < 980/964/944. ----------------------
    lat = jnp.asarray(g.geom.interior("aglat"))
    ws_bot = out["ws"][:, -1]
    ws_max = box_max(ws_bot, 7)
    cyc = jnp.where(lat > 0.0, vort[:, -1] > 2.2e-5, vort[:, -1] < -2.2e-5)
    if "vort850" in out:
        v850 = jnp.nan_to_num(out["vort850"])
        cyc = cyc & jnp.where(lat > 0.0, v850 > 2.2e-5, v850 < -2.2e-5)
    storm = ((jnp.abs(lat) < jnp.deg2rad(45.0))
             & (phis2 / con.GRAV < 500.0) & (ws_max > 16.0) & cyc
             & (out["tm"] >= 254.0) & (pt[:, -1] >= 281.0))
    slp_mb = out["slp"] / 100.0
    cat_crt = storm & (ws_max > 20.0)
    for tag, crit, thresh in (("15", storm, 1000.0),
                              ("25", cat_crt, 980.0),
                              ("35", cat_crt, 964.0),
                              ("45", cat_crt, 944.0)):
        hit = crit & (slp_mb < thresh)
        out[f"cat{tag}"] = jnp.where(hit, thresh - slp_mb, 0.0)
        out[f"f{tag}"] = hit.astype(pt.dtype)

    out["zsurf_t"] = out["zsurf"]

    for name, arr in out.items():
        full = prefix + name
        if full not in dm._fields:
            dm.register(full, *FIELD_CATALOG.get(name, ("", "")))
        dm.send(full, arr)
    return out


def consv_checker(before, after, g, ptop, te_err=1.0e-5, tw_err=1.0e-6,
                  hydrostatic=True, out=print, strict=False):
    """Energy/water conservation audit (the reference's consv_checker,
    fv_control.F90:1145 te_err/tw_err namelist; checks printed from
    fv_dynamics).

    before/after: state dicts with delp, pt (temperature), u, v [, w,
    delz, phis] and optional q dict under "q". Returns
    (te_rel_err, tw_rel_err); warns via `out` beyond thresholds, raises
    if strict."""
    import jax.numpy as jnp
    from ..model.thermodynamics import (total_energy_2d_hydro,
                                        total_energy_2d_nh, g_mean)
    import gfdl_atmos_cubed_sphere_tpu.constants as con

    def te(st):
        delp, pt = st["delp"], st["pt"]
        q = st.get("q") or {}
        sph = q.get("sphum")
        tv = pt * (1.0 + con.ZVIR * sph) if sph is not None else pt
        phis = st.get("phis")
        if phis is None:
            phis = jnp.zeros_like(delp[:, 0])
        elif phis.ndim == 4:
            phis = phis[:, 0]
        if hydrostatic or st.get("w") is None:
            pe = ptop + jnp.cumsum(delp, axis=1)
            pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe],
                                 axis=1)
            te2 = total_energy_2d_hydro(st["u"], st["v"], tv, delp,
                                        jnp.log(pe), pe, phis, g)
        else:
            te2 = total_energy_2d_nh(st["u"], st["v"], st["w"], tv,
                                     sph if sph is not None
                                     else jnp.zeros_like(delp),
                                     delp, st["delz"], phis, g)
        return g_mean(te2, g)

    def tw(st):
        q = st.get("q") or {}
        wat = sum((q[k] for k in ("sphum", "liq_wat", "ice_wat", "rainwat",
                                  "snowwat", "graupel") if k in q),
                  jnp.zeros_like(st["delp"]))
        return g_mean(jnp.sum(st["delp"] * wat, axis=1), g)

    te0, te1 = float(te(before)), float(te(after))
    te_rel = abs(te1 - te0) / max(abs(te0), 1e-30)
    tw0, tw1 = float(tw(before)), float(tw(after))
    tw_rel = abs(tw1 - tw0) / max(abs(tw0), 1e-30) if tw0 != 0.0 else 0.0
    if te_rel > te_err:
        msg = f"consv_checker: TE error {te_rel:.3e} > te_err {te_err:.1e}"
        if strict:
            raise AssertionError(msg)
        out(msg)
    if tw_rel > tw_err:
        msg = f"consv_checker: TW error {tw_rel:.3e} > tw_err {tw_err:.1e}"
        if strict:
            raise AssertionError(msg)
        out(msg)
    return te_rel, tw_rel
