"""External forcing inputs (component #34) + age-of-air tracer.

Re-implements the behavior of:
- /root/reference/tools/external_sst.F90 (:20-30) — shared NCEP/AMIP SST
  + anomaly store sampled onto the cube;
- /root/reference/tools/external_aero.F90 (`load_aero`:55, `read_aero`:172)
  — monthly aerosol climatology on pressure levels, time-interpolated and
  remapped to model layers for the microphysics;
- /root/reference/tools/w_forcing.F90 (`do_w_forcing`:56) — idealized
  vertical-velocity forcing for grid_type 4 (bubble forcing type 1,
  PBL specified-divergence nudging type 101);
- /root/reference/driver/solo/hswf.F90 (`age_of_air`:209) — idealized
  age-of-air clock tracer.

TPU style: everything is a pure array->array function; the time/space
interpolation weights are precomputed host-side (numpy) and the hot path
is dense einsum/where — no gathers on the minor axis.
"""

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


# ---- external SST ---------------------------------------------------------

@dataclass
class ExternalSST:
    """sst_ncep/sst_anom store (external_sst.F90:25-27): lat-lon SST fields
    plus cached bilinear weights onto the cube A-grid."""
    lons: np.ndarray            # [nlon] radians
    lats: np.ndarray            # [nlat] radians
    sst_ncep: np.ndarray        # [nlat, nlon] K
    sst_anom: np.ndarray = None
    forecast_mode: bool = False
    _wt: object = field(default=None, repr=False)

    def to_cube(self, geom, anomaly=False):
        """Sample SST (+anomaly) onto cube cell centers [6, n, n]."""
        from ..io.external_ic import latlon_bilinear_weights, interp_to_cube
        if self._wt is None:
            self._wt = latlon_bilinear_weights(
                self.lons, self.lats,
                geom.interior("aglon"), geom.interior("aglat"))
        f = self.sst_ncep if not anomaly else self.sst_ncep + self.sst_anom
        return interp_to_cube(jnp.asarray(f, jnp.float32), self._wt)


# ---- aerosol climatology --------------------------------------------------

@dataclass
class AeroClimatology:
    """Monthly aerosol climatology (external_aero.F90 load_aero:55):
    fields[name] has shape [12, kc, nlat, nlon] on climo pressure layers
    with interface pressures p_edge_c [kc+1] (Pa)."""
    lons: np.ndarray
    lats: np.ndarray
    p_edge_c: np.ndarray
    fields: dict
    _wt: object = field(default=None, repr=False)

    def at_time(self, month_frac):
        """Linear time interpolation between bracketing months
        (read_aero:172 time_interp role). month_frac in [0, 12)."""
        m0 = int(np.floor(month_frac)) % 12
        m1 = (m0 + 1) % 12
        w = float(month_frac - np.floor(month_frac))
        return {k: (1.0 - w) * v[m0] + w * v[m1]
                for k, v in self.fields.items()}

    def to_model(self, geom, delp, ptop, month_frac):
        """Horizontal bilinear + vertical log-p interpolation of the
        climatology onto model layers (read_aero:172 remap role).
        Returns dict of [6, K, n, n]."""
        from ..io.external_ic import latlon_bilinear_weights, interp_to_cube
        if self._wt is None:
            self._wt = latlon_bilinear_weights(
                self.lons, self.lats,
                geom.interior("aglon"), geom.interior("aglat"))
        snap = self.at_time(month_frac)

        pe = ptop + jnp.cumsum(delp, axis=1)
        pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
        p_lay = 0.5 * (pe[:, 1:] + pe[:, :-1])          # [6,K,n,n]
        pc = 0.5 * (self.p_edge_c[1:] + self.p_edge_c[:-1])
        lpc = np.log(pc)
        kc = len(pc)
        lp = jnp.log(p_lay)

        out = {}
        for name, fc in snap.items():
            cube = jnp.stack([interp_to_cube(jnp.asarray(fc[k], jnp.float32),
                                             self._wt) for k in range(kc)],
                             axis=1)                     # [6,kc,n,n]
            # piecewise-linear in log-p, clamped at the ends; dense one-hot
            # contraction instead of a minor-axis gather (TPU-friendly).
            idx = jnp.sum((lp[..., None] > jnp.asarray(lpc)).astype(lp.dtype),
                          axis=-1)
            k0 = jnp.clip(idx - 1.0, 0.0, float(kc - 2))
            oh0 = (k0[..., None] == jnp.arange(kc, dtype=lp.dtype)).astype(
                lp.dtype)
            oh1 = (k0[..., None] + 1.0 == jnp.arange(kc, dtype=lp.dtype)
                   ).astype(lp.dtype)
            lpcj = jnp.asarray(lpc, lp.dtype)
            l0 = jnp.einsum("tknmc,c->tknm", oh0, lpcj)
            l1 = jnp.einsum("tknmc,c->tknm", oh1, lpcj)
            f0 = jnp.einsum("tknmc,tcnm->tknm", oh0, cube)
            f1 = jnp.einsum("tknmc,tcnm->tknm", oh1, cube)
            w = jnp.clip((lp - l0) / (l1 - l0), 0.0, 1.0)
            out[name] = (1.0 - w) * f0 + w * f1
        return out


# ---- idealized w forcing --------------------------------------------------

@dataclass
class WForcingConfig:
    """w_forcing_nml analog (w_forcing.F90 module header)."""
    w_forcing_type: int = 1
    a: float = 0.02             # forcing amplitude (m/s^2), type 1
    i0: int = 0                 # bubble center (cell index), type 1
    j0: int = 0
    L: float = 10.0e3           # x half-extent (m)
    R: float = 10.0e3           # y radius (m)
    H: float = 1.5e3            # height center (m)
    D: float = 1.5e3            # height radius (m)
    divg: float = 5.0e-6        # large-scale divergence (1/s), type 101
    tau: float = 900.0          # nudging timescale (s), type 101
    start: float = 0.0
    end: float = -1.0           # <0: always on
    dx_const: float = 1.0e3


def do_w_forcing(w, delz, phis, cfg: WForcingConfig, dt, time):
    """Apply idealized w forcing (w_forcing.F90 do_w_forcing:56), grid_type 4
    only. w/delz: [T, K, n, n]; phis: [T, n, n] (unpadded compute arrays).

    type 1: add an ellipsoidal acceleration bubble centered at (j0, i0, H).
    type 101: nudge w toward the specified-divergence profile w = -D*z
    with implicit relaxation, skipping the top-2 sponge levels."""
    if cfg.end > 0 and (time < cfg.start or time > cfg.end):
        return w
    T, K, n, _ = w.shape
    zsfc = phis[:, None] / 9.80665
    # height at the TOP of each layer (delz < 0): reverse cumsum of |delz|
    zint = zsfc + jnp.flip(jnp.cumsum(jnp.flip(-delz, axis=1), axis=1),
                           axis=1)
    zmid = zint + 0.5 * delz            # mid = top + delz/2

    if cfg.w_forcing_type == 1:
        ii = jnp.arange(n, dtype=w.dtype)
        xL = jnp.abs(ii - cfg.i0) * cfg.dx_const
        rad_y = ((ii - cfg.j0) * cfg.dx_const) ** 2 / (cfg.R * cfg.R)
        rad = rad_y[None, None, :, None] + ((zmid - cfg.H) / cfg.D) ** 2
        radm1 = jnp.maximum(1.0 - jnp.sqrt(rad), 0.0)
        mask = (xL[None, None, None, :] <= cfg.L).astype(w.dtype)
        return w + cfg.a * radm1 * radm1 * dt * mask
    if cfg.w_forcing_type == 101:
        dttau = dt / cfg.tau
        forc = 1.0 / (1.0 + dttau)
        wls = -cfg.divg * (zmid - zsfc)          # w_ls = -D * z_AGL
        wnew = (w + dttau * wls) * forc
        k = jnp.arange(K)[None, :, None, None]
        return jnp.where(k >= 2, wnew, w)
    raise ValueError(f"w_forcing_type {cfg.w_forcing_type} not implemented")


# ---- age of air -----------------------------------------------------------

def age_of_air(q_age, pe_layers, time, p_source=75000.0, ascale=5.0e-6 / 60.0):
    """Idealized age-of-air clock (hswf.F90 age_of_air:209): below the
    source level the tracer is pinned to ascale*time; elsewhere it is
    advected freely. q_age/pe_layers(top-interface p per layer): [T,K,n,n]."""
    if time < 1.0e-6:
        return jnp.zeros_like(q_age)
    return jnp.where(pe_layers >= p_source,
                     jnp.full_like(q_age, ascale * time), q_age)
