"""Analysis nudging + incremental analysis update (components #28, #22).

Re-implements the core mechanisms of /root/reference/tools/fv_nudge.F90
(fv_nwp_nudge:66 — Newtonian relaxation of winds/T/ps toward gridded
analyses with per-field timescales and a pressure-dependent weight),
tools/fv_treat_da_inc.F90 (read_da_inc:82 — one-shot analysis increment)
and tools/fv_iau_mod.F90 (IAU_initialize:121 — the same increment spread
evenly over a time window).
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NudgeConfig:
    """fv_nwp_nudge_nml subset (fv_nudge.F90:229)."""
    tau_winds: float = 21600.0     # relaxation timescales (s)
    tau_t: float = 86400.0
    tau_q: float = 86400.0
    tau_ps: float = 21600.0
    p_wvp: float = 100.0e2         # no nudging above this pressure
    p_full: float = 300.0e2        # full-strength below this


def _vertical_weight(pm, cfg: NudgeConfig):
    """Ramp 0 -> 1 between p_wvp and p_full (fv_nudge's kbot/strat masks)."""
    return jnp.clip((pm - cfg.p_wvp) / (cfg.p_full - cfg.p_wvp), 0.0, 1.0)


def nwp_nudge(dt, state, target, pm, cfg: NudgeConfig = NudgeConfig()):
    """Implicit Newtonian relaxation toward the analysis.

    state/target: dicts with any of u, v, pt, sphum (same shapes);
    pm: layer pressures [6,K,n,n] for the vertical weight.
    Returns updated state dict."""
    out = dict(state)
    w = _vertical_weight(pm, cfg)
    for name, tau in (("u", cfg.tau_winds), ("v", cfg.tau_winds),
                      ("pt", cfg.tau_t), ("sphum", cfg.tau_q)):
        if name in state and name in target:
            r = dt / tau
            if name == "u":      # spread the cell weight to y-walls
                wf = jnp.concatenate(
                    [w[:, :, :1], 0.5 * (w[:, :, :-1] + w[:, :, 1:]),
                     w[:, :, -1:]], axis=2)
            elif name == "v":    # x-walls
                wf = jnp.concatenate(
                    [w[..., :1], 0.5 * (w[..., :-1] + w[..., 1:]),
                     w[..., -1:]], axis=3)
            else:
                wf = w
            out[name] = (state[name] + r * wf * target[name]) / (1.0 + r * wf)
    return out


def apply_da_increment(state, increments, frac=1.0):
    """One-shot analysis increment (read_da_inc): state += frac * inc."""
    out = dict(state)
    for k, inc in increments.items():
        if k in out and out[k] is not None:
            out[k] = out[k] + frac * inc
    return out


class IAU:
    """Incremental analysis update (fv_iau_mod.F90): spread an increment
    evenly over `window` seconds of `dt`-steps."""

    def __init__(self, increments, window, dt):
        self.increments = increments
        self.nsteps = max(1, int(round(window / dt)))
        self.frac = 1.0 / self.nsteps
        self.applied = 0

    def step(self, state):
        if self.applied >= self.nsteps:
            return state
        self.applied += 1
        return apply_da_increment(state, self.increments, self.frac)


# ---------------------------------------------------------------------------
# Climate nudging (GFDL_tools/fv_climate_nudge.F90) and analysis-data
# nudging (GFDL_tools/fv_ada_nudge.F90).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ClimateNudgeConfig:
    """fv_climate_nudge_nml subset (fv_climate_nudge.F90:97).

    A tau < 0 disables nudging of that field (reference do_* flags,
    fv_climate_nudge.F90:146)."""
    u_tau: float = -1.0
    v_tau: float = -1.0
    t_tau: float = -1.0
    q_tau: float = -1.0
    ps_tau: float = -1.0
    skip_top_q: int = 2            # no q nudging in the top layers
    skip_bot_q: int = 0
    use_pdep_nudge: bool = False   # strength ~ pfull/p_relax aloft
    p_relax: float = 30.0e2        # fv_nudge.F90 P_relax default
    p_norelax: float = 0.0


def _pdep_profile(pm, cfg: ClimateNudgeConfig):
    """Pressure-dependent nudging profile (fv_nudge.F90:351-359): full
    strength below p_relax, linearly reduced ~ p/p_relax above, floored at
    0.01, and zero above p_norelax."""
    prof = jnp.where(pm < cfg.p_relax,
                     jnp.maximum(0.01, pm / cfg.p_relax), 1.0)
    return jnp.where(pm < cfg.p_norelax, 0.0, prof)


def time_interp_climatology(clim, frac):
    """Linear interpolation between two bracketing climatology snapshots.

    clim: dict name -> (field_t0, field_t1); frac in [0, 1] (the reference
    reads monthly means and interpolates in read_climate_nudge_data.F90).
    Returns dict name -> field."""
    return {k: (1.0 - frac) * v0 + frac * v1 for k, (v0, v1) in clim.items()}


def climate_nudge(dt, state, clim, pm, cfg: ClimateNudgeConfig,
                  ak=None, bk=None, ptop=None):
    """Newtonian relaxation toward climatology (fv_climate_nudge.F90:264).

    state: dict with u, v, pt (temperature), sphum, delp; clim: dict of
    targets on the model grid/levels (use time_interp_climatology +
    io.external_ic.remap_column_field to get them there); pm: layer
    pressures [6,K,n,n].  ps nudging rescales delp by the hybrid-coordinate
    increment d(delp) = d(bk)*d(ps) (the reference adjusts the pressure
    thickness consistently with ak/bk).  Returns (state, tendencies)."""
    out = dict(state)
    tend = {}
    prof = _pdep_profile(pm, cfg) if cfg.use_pdep_nudge else jnp.ones_like(pm)
    K = pm.shape[1]

    def relax(x, tgt, tau, w):
        r = (dt / tau) * w
        xn = (x + r * tgt) / (1.0 + r)
        return xn, (xn - x) / dt

    for name, tau in (("u", cfg.u_tau), ("v", cfg.v_tau), ("pt", cfg.t_tau),
                      ("sphum", cfg.q_tau)):
        if tau <= 0.0 or name not in state or name not in clim:
            continue
        w = prof
        if name == "u":
            w = jnp.concatenate([w[:, :, :1],
                                 0.5 * (w[:, :, :-1] + w[:, :, 1:]),
                                 w[:, :, -1:]], axis=2)
        elif name == "v":
            w = jnp.concatenate([w[..., :1],
                                 0.5 * (w[..., :-1] + w[..., 1:]),
                                 w[..., -1:]], axis=3)
        elif name == "sphum" and (cfg.skip_top_q or cfg.skip_bot_q):
            kmask = jnp.ones((K,), pm.dtype)
            if cfg.skip_top_q:
                kmask = kmask.at[:cfg.skip_top_q].set(0.0)
            if cfg.skip_bot_q:
                kmask = kmask.at[K - cfg.skip_bot_q:].set(0.0)
            w = w * kmask[None, :, None, None]
        out[name], tend[name] = relax(state[name], clim[name], tau, w)

    if cfg.ps_tau > 0.0 and "ps" in clim and ak is not None:
        delp = state["delp"]
        ps = jnp.asarray(ak)[0] + jnp.sum(delp, axis=1)
        r = dt / cfg.ps_tau
        ps_new = (ps + r * clim["ps"]) / (1.0 + r)
        dbk = jnp.asarray(bk, delp.dtype)
        dbk = (dbk[1:] - dbk[:-1])[None, :, None, None]
        out["delp"] = delp + dbk * (ps_new - ps)[:, None]
        tend["ps"] = (ps_new - ps) / dt
    return out, tend


def ada_nudge(dt, state, analysis, pm, cfg: ClimateNudgeConfig):
    """Analysis-data nudging (fv_ada_nudge.F90:85): same relaxation core as
    climate_nudge but toward 6-hourly analyses; provided as a thin alias so
    reference namelists translate (fv_ada_nudge_nml mirrors the taus)."""
    return climate_nudge(dt, state, analysis, pm, cfg)


# ---------------------------------------------------------------------------
# Inline TC vortex breeding (tools/fv_nudge.F90 breed_slp_inline:~2000).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BreedConfig:
    """fv_nwp_nudge_nml vortex-breeding subset (fv_nudge.F90:184-200)."""
    tau_vt_slp: float = 1200.0
    tau_vt_rad: float = 4.0
    r_lo: float = 2.0
    r_hi: float = 5.0
    del_r: float = 250.0e3
    r_min: float = 200.0e3
    r_inc: float = 25.0e3
    slp_env: float = 101010.0
    tm_max: float = 315.0          # skip deepening when sfc layer too hot
    dps_min: float = 500.0         # max single-step deepening increment (Pa)
    k_breed_p: float = 100.0e2     # layers above this pressure untouched
    phis_max: float = 250.0 * 9.80665  # no breeding over high terrain


def breed_slp_inline(dt, delp, pt_bot, phis, storms, g, ak, cfg=BreedConfig()):
    """Inline sea-level-pressure vortex breeding (fv_nudge.F90
    breed_slp_inline).  For each observed storm (lon, lat, slp_obs in
    rad/rad/Pa), relax the local surface pressure toward a Gaussian target
    profile p(r) = p_env - (p_env - slp_obs)*exp(-c (r/r_vor)^2) by scaling
    sub-k0 layer thicknesses; removed mass is restored globally so total
    air mass is conserved (the reference conserves water/geopotential "at
    the expense of dry air mass").

    delp [6,K,n,n]; pt_bot [6,n,n] lowest-layer temperature; phis [6,n,n];
    storms: array [S, 3] of (lon, lat, slp_obs).  Returns new delp.
    jit-safe: S is static, invalid storms are masked by slp_obs >= slp_env.
    """
    import jax

    storms = jnp.asarray(storms)
    akv = jnp.asarray(ak, delp.dtype)
    area = jnp.asarray(g.geom.interior("area"), delp.dtype)
    lon = jnp.asarray(g.geom.interior("aglon"), delp.dtype)
    lat = jnp.asarray(g.geom.interior("aglat"), delp.dtype)
    K = delp.shape[1]
    ps = akv[0] + jnp.sum(delp, axis=1)
    # layers strictly above k_breed_p stay untouched (k0 mask per level)
    pedge_ref = akv[0] + jnp.cumsum(jnp.mean(delp, axis=(0, 2, 3)))
    kmask = (pedge_ref > cfg.k_breed_p).astype(delp.dtype)  # [K]
    # standard SLP reduction from the lowest-layer temperature
    from ..constants import GRAV, RDGAS

    tstar = pt_bot * (1.0 + 3.25e-3 * phis / (GRAV * 2.0))
    slp = ps * jnp.exp(phis / (RDGAS * tstar))

    def one_storm(dps_accum, storm):
        slon, slat, slp_o = storm[0], storm[1], storm[2]
        valid = (slp_o < cfg.slp_env) & (slp_o > 87500.0) & \
                (jnp.abs(slat) < jnp.deg2rad(45.0))
        # great-circle distance to the storm center
        cosd = (jnp.sin(slat) * jnp.sin(lat) +
                jnp.cos(slat) * jnp.cos(lat) * jnp.cos(lon - slon))
        dist = g.geom.radius * jnp.arccos(jnp.clip(cosd, -1.0, 1.0))
        r_vor = cfg.r_min + (cfg.slp_env - slp_o) / 25.0e2 * cfg.r_inc
        # environmental SLP: area-weighted ring mean [r_vor, r_vor+del_r]
        ring = ((dist > r_vor) & (dist < r_vor + cfg.del_r) &
                (phis < cfg.phis_max)).astype(delp.dtype)
        p_env = (jnp.sum(ring * slp * area) /
                 jnp.maximum(jnp.sum(ring * area), 1e-30))
        f1 = dist / r_vor
        p_hi = p_env - (p_env - slp_o) * jnp.exp(-cfg.r_hi * f1 ** 2)
        p_lo = p_env - (p_env - slp_o) * jnp.exp(-cfg.r_lo * f1 ** 2)
        tau_vt = jnp.maximum(jnp.abs(dt), cfg.tau_vt_slp *
                             (1.0 + (960.0e2 - slp_o) / 100.0e2))
        relx0 = jnp.minimum(1.0, jnp.abs(dt) / tau_vt)
        inside = (dist < r_vor) & (phis < cfg.phis_max)
        # under-development: deepen toward p_hi, capped; temperature guard
        deepen = relx0 * jnp.exp(-cfg.tau_vt_rad * f1 ** 2) * \
            (ps - p_hi) * jnp.clip((cfg.tm_max - pt_bot) / 10.0, 0.0, 1.0)
        deepen = jnp.minimum(deepen, cfg.dps_min)
        # over-development: fill toward p_lo
        fill = jnp.maximum(0.5, relx0) * (slp - p_lo)
        dps = jnp.where(ps > p_hi, jnp.maximum(deepen, 0.0),
                        jnp.where(slp < p_lo, jnp.minimum(fill, 0.0), 0.0))
        dps = jnp.where(inside & valid, dps, 0.0)
        return dps_accum + dps, None

    S = storms.shape[0]
    dps_tot, _ = jax.lax.scan(one_storm, jnp.zeros_like(ps), storms)
    # scale breeding-layer thicknesses: f = 1 - dps/(ps - pbreed)
    pbreed = akv[0] + jnp.cumsum(delp * (1.0 - kmask)[None, :, None, None],
                                 axis=1)[:, -1]
    fac = 1.0 - dps_tot / jnp.maximum(ps - pbreed, 1.0)
    delp_new = delp * (kmask[None, :, None, None] * (fac[:, None] - 1.0) + 1.0)
    # conserve global air mass: restore the sunk mass uniformly
    mass_sink = jnp.sum(dps_tot * area)
    total = jnp.sum(jnp.sum(delp_new, axis=1) * area)
    return delp_new * (1.0 + mass_sink / total)


# ---------------------------------------------------------------------------
# Surface-pressure nudging with sigma-distributed mass adjustment + the
# global bias corrections (fv_nudge.F90 ps_nudging:833,
# ps_bias_correction:993, temp_bias_correction:1060)
# ---------------------------------------------------------------------------

def ps_bias_correction(ps_dt, area, esl=0.01):
    """Remove the global-mean bias of a ps increment without reversing any
    local sign (ps_bias_correction:993): the area-weighted mean bias is
    subtracted from the same-signed cells only, rescaled by their area
    fraction, and clipped at zero."""
    w = area / jnp.sum(area)
    bias = jnp.sum(w * ps_dt)

    def debias(psdt):
        same = jnp.where(bias > 0.0, psdt > 0.0, psdt < 0.0)
        psum = jnp.maximum(jnp.sum(jnp.where(same, area, 0.0)), 1e-30)
        adj = bias * jnp.sum(area) / psum
        corrected = jnp.where(
            same,
            jnp.where(bias > 0.0, jnp.maximum(0.0, psdt - adj),
                      jnp.minimum(0.0, psdt - adj)),
            psdt)
        return corrected

    return jnp.where(jnp.abs(bias) < esl, ps_dt, debias(ps_dt))


def temp_bias_correction(t_dt, area):
    """Per-level removal of the area-mean temperature-increment bias
    (temp_bias_correction:1060, the same-signed-cell form)."""
    w = (area / jnp.sum(area))[:, None]
    bias = jnp.sum(w * t_dt, axis=(0, 2, 3), keepdims=True)
    same = jnp.where(bias > 0.0, t_dt > 0.0, t_dt < 0.0)
    psum = jnp.maximum(jnp.sum(jnp.where(same, area[:, None], 0.0),
                               axis=(0, 2, 3), keepdims=True), 1e-30)
    adj = bias * jnp.sum(area) / psum
    return jnp.where(same,
                     jnp.where(bias > 0.0,
                               jnp.maximum(0.0, t_dt - adj),
                               jnp.minimum(0.0, t_dt - adj)),
                     t_dt)


def ps_nudging(dt, ak, bk, ps_target, delp, area=None, mask=1.0,
               phis=None, gz0=None, tau=21600.0, cap=10.0e2,
               terrain_decay=500.0, do_bias=True):
    """Nudge surface pressure toward the (terrain-adjusted) analysis by
    adding mass in the sigma part of the coordinate (ps_nudging:833):
    delp_k += (bk_{k+1}-bk_k) * dps. ps_target should already sit on the
    model terrain (io.external_ic.adjust_ps_to_terrain); where the obs
    surface geopotential gz0 is supplied, the increment decays with
    terrain mismatch |gz0-phis| over `terrain_decay` meters (the
    reference's mask factor). Returns (delp_new, applied dps)."""
    from .. import constants as con
    ps = float(ak[0]) + jnp.sum(delp, axis=1)
    ps_dt = ps_target - ps
    ps_dt = jnp.sign(ps_dt) * jnp.minimum(cap, jnp.abs(ps_dt))
    ps_dt = ps_dt * mask
    if phis is not None and gz0 is not None:
        fac = jnp.maximum(0.0, 1.0 - jnp.abs(gz0 - phis)
                          / (con.GRAV * terrain_decay))
        ps_dt = ps_dt * fac
    if do_bias and area is not None:
        ps_dt = ps_bias_correction(ps_dt, area)
    frac = jnp.minimum(1.0, dt / tau)
    dps = frac * ps_dt
    dbk = jnp.asarray(np.diff(np.asarray(bk)),
                      delp.dtype).reshape(1, -1, 1, 1)
    return delp + dbk * dps[:, None], dps


class ObsSchedule:
    """Two-time-level analysis stream (get_obs:1179): holds consecutive
    analyses with their valid times and serves the linear time
    interpolation the nudging tendencies consume."""

    def __init__(self, times, analyses):
        assert len(times) == len(analyses) >= 2
        self.times = list(times)
        self.analyses = list(analyses)

    def target_at(self, t):
        import bisect
        i = bisect.bisect_right(self.times, t) - 1
        i = max(0, min(i, len(self.times) - 2))
        t0, t1 = self.times[i], self.times[i + 1]
        a = (t - t0) / max(t1 - t0, 1e-12)
        a = min(max(a, 0.0), 1.0)
        out = {}
        for k in self.analyses[i]:
            out[k] = ((1.0 - a) * jnp.asarray(self.analyses[i][k])
                      + a * jnp.asarray(self.analyses[i + 1][k]))
        return out


def remap_analysis_to_model(ana, ak_src, bk_src, ps, ak, bk,
                            fields=("t", "sphum"), winds=("ua", "va"),
                            kord=8):
    """Vertical remap of an analysis on its own hybrid levels onto the
    model's (remap_tq:2026 / remap_uv:2106): mass-weighted scalars, winds
    on wall-mean pressures (here A-grid analysis winds, plain iv=-1)."""
    from ..ops import fv_mapz
    ps_ = jnp.asarray(ps)
    aks = jnp.asarray(ak_src).reshape((1,) * ps_.ndim + (-1,))
    bks = jnp.asarray(bk_src).reshape((1,) * ps_.ndim + (-1,))
    pe1 = aks + bks * ps_[..., None]
    akd = jnp.asarray(ak).reshape((1,) * ps_.ndim + (-1,))
    bkd = jnp.asarray(bk).reshape((1,) * ps_.ndim + (-1,))
    pe2 = akd + bkd * ps_[..., None]
    out = {}
    for name in fields:
        if name in ana:
            f = jnp.moveaxis(jnp.asarray(ana[name]), 1, -1)
            out[name] = jnp.moveaxis(
                fv_mapz.map1_ppm_ext(f, pe1, pe2, iv=(1 if name == "t"
                                                     else 0), kord=kord),
                -1, 1)
    for name in winds:
        if name in ana:
            f = jnp.moveaxis(jnp.asarray(ana[name]), 1, -1)
            out[name] = jnp.moveaxis(
                fv_mapz.map1_ppm_ext(f, pe1, pe2, iv=-1, kord=kord),
                -1, 1)
    return out
