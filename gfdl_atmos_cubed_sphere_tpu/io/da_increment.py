"""Data-assimilation increments and IAU (components #22 partial).

Re-implements the behavior of /root/reference/tools/fv_treat_da_inc.F90
(`read_da_inc`:82 — apply a GSI lat-lon analysis increment to the model
state at restart) and /root/reference/tools/fv_iau_mod.F90
(`IAU_initialize`:121 / `getiauforcing` — spread an analysis increment
over a time window as per-step forcing instead of a one-shot add).

The increment file layout follows the GSI convention the reference reads
(fv_treat_da_inc.F90:150-260): lat-lon fields on the model's km levels
named u_inc, v_inc, T_inc, delp_inc, delz_inc, sphum_inc, liq_wat_inc,
o3mr_inc (any subset). Horizontal mapping to the cube uses the
precomputed bilinear weights of io/external_ic.py; wind increments are
A-grid lat-lon vectors scattered to the D grid with the
update_dwinds_phys projection (same as the reference's edge-vector sums,
fv_treat_da_inc.F90:300-420).
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .external_ic import (latlon_bilinear_weights, interp_to_cube,
                          d_winds_from_latlon, read_latlon_netcdf)

#: increment-file field -> model state field (cell scalars)
SCALAR_INC = {
    "T_inc": "pt",          # sensible temperature increment
    "delp_inc": "delp",
    "delz_inc": "delz",
    "sphum_inc": "sphum",
    "liq_wat_inc": "liq_wat",
    "o3mr_inc": "o3mr",
    "icmr_inc": "ice_wat",
}


def cube_increments(raw, geom, g=None):
    """Map a lat-lon increment dict onto the cube.

    raw: dict with 'lon' [nx], 'lat' [ny] (degrees) and fields
    [km, ny, nx]. Returns dict: model-field name -> [6, km, n, n]
    cube-cell increments, with 'u'/'v' as D-grid wind increments when
    u_inc/v_inc are present (g required for the D-grid projection)."""
    lon_t = geom.interior("aglon")     # cell-center lon/lat [6, n, n] (rad)
    lat_t = geom.interior("aglat")
    w = latlon_bilinear_weights(np.deg2rad(np.asarray(raw["lon"])),
                                np.deg2rad(np.asarray(raw["lat"])),
                                lon_t, lat_t)
    def to_cube(f):
        # interp_to_cube on [km, NY, NX] yields [km, 6, n, n]; model layout
        # is [6, km, n, n]
        return jnp.moveaxis(jnp.asarray(interp_to_cube(np.asarray(f), w)),
                            0, 1)

    out = {}
    for src, dst in SCALAR_INC.items():
        if src in raw:
            out[dst] = to_cube(raw[src])
    if "u_inc" in raw and "v_inc" in raw:
        ua = to_cube(raw["u_inc"])
        va = to_cube(raw["v_inc"])
        if g is None:
            out["ua"], out["va"] = ua, va
        else:
            out["u"], out["v"] = d_winds_from_latlon(ua, va, g)
    return out


def read_da_inc(path_or_raw, geom, g=None):
    """fv_treat_da_inc.F90 read_da_inc:82 — load + regrid an increment
    file (or an already-read dict) to cube increments."""
    raw = path_or_raw
    if isinstance(path_or_raw, str):
        raw = read_latlon_netcdf(path_or_raw)
    return cube_increments(raw, geom, g=g)


def apply_da_inc(state, inc, scale=1.0):
    """One-shot restart application (read_da_inc's in-place adds,
    fv_treat_da_inc.F90:300-507): state and inc are dicts keyed by model
    field names; missing keys pass through."""
    out = dict(state)
    for k, dq in inc.items():
        if k in out and out[k] is not None:
            out[k] = out[k] + scale * dq
    return out


# ---------------------------------------------------------------------------
# IAU — incremental analysis update (fv_iau_mod.F90)
# ---------------------------------------------------------------------------

@dataclass
class IAUConfig:
    """fv_iau_mod.F90 namelist analogs: iau_delthrs (window, hours ->
    seconds here), iau_filter_increments (Dolph-filtered weights,
    :needs nudge-time symmetric window), time offset of the increment
    valid time relative to window center."""
    window_s: float = 21600.0
    filtered: bool = False


class IAU:
    """Spread `inc` over the IAU window: each call to forcing(t) returns
    the per-second tendency dict to add to the state this step
    (getiauforcing — constant 1/window weight, or Dolph-Chebyshev-like
    raised-cosine filtered weights when cfg.filtered)."""

    def __init__(self, inc, cfg: IAUConfig, t_start=0.0):
        self.inc = inc
        self.cfg = cfg
        self.t0 = t_start

    def weight(self, t):
        """Per-second weight at model time t (0 outside the window;
        integrates to ~1 over the window)."""
        x = (t - self.t0) / self.cfg.window_s
        if x < 0.0 or x >= 1.0:
            return 0.0
        if not self.cfg.filtered:
            return 1.0 / self.cfg.window_s
        # raised-cosine (Hann) filtered IAU: smooth ramp in/out, unit mass
        return (1.0 - np.cos(2.0 * np.pi * x)) / self.cfg.window_s

    def forcing(self, t, dt):
        """Dict of per-step increments (weight * dt * inc); empty dict
        outside the window."""
        wt = self.weight(t) * dt
        if wt == 0.0:
            return {}
        return {k: wt * v for k, v in self.inc.items()}

    def apply(self, state, t, dt):
        return apply_da_inc(state, self.inc,
                            scale=self.weight(t) * dt) \
            if self.weight(t) else state
