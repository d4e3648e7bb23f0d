"""Hydrostatic FV3 dynamics driver: k_split remap loop over the acoustic core.

Re-implements /root/reference/model/fv_dynamics.F90 (fv_dynamics:79, the
k_split loop :460) and the hydrostatic branch of
/root/reference/model/fv_mapz.F90 Lagrangian_to_Eulerian:56 (kord_tm < 0
path: remap virtual temperature on log-p, winds on pe, tracers on pe).

State carried between calls: u, v (D winds), delp, pt = TEMPERATURE, q dict.
Inside the step pt becomes virtual potential temperature (fv_dynamics.F90
:393-399) and is converted back on the last remap step (fv_mapz.F90:800-825).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from .. import constants as con
from . import thermodynamics as thermo
from ..ops import fv_mapz, fv_sg
from .tracer_2d import tracer_2d
from ..ops.sw_core import _rl, _cl
from ..ops.fill_corners import fi
from .dyn_core import DynConfig, dyn_core_hydro, geopk

H = 3


def _k_last(a):
    return jnp.moveaxis(a, 1, -1)


def _k_lev(a):
    return jnp.moveaxis(a, -1, 1)


def remap_hydro(delp, ptv, u, v, q, pe_pad, peln_pad, pkz, ak, bk, g, cfg,
                akap, last_step):
    """Vertical remap back to the hybrid coordinate (fv_mapz.F90:56).

    delp/ptv (theta_v)/u/v interior [6, K, ...]; pe_pad/peln_pad padded
    interface arrays from the acoustic core. Returns updated fields (+pkz).
    """
    f = fi
    npx = g.npx
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    K = delp.shape[1]

    pe1 = _k_last(pe_pad[..., ctr, ctr])              # [6, n, n, K+1]
    peln1 = _k_last(peln_pad[..., ctr, ctr])
    pkz_i = _k_last(pkz[..., ctr, ctr])

    # theta_v -> virtual temperature (fv_mapz.F90:203-209)
    tv = _k_last(ptv) * pkz_i

    ps = pe1[..., -1:]
    akl = ak.reshape((1,) * 3 + (K + 1,))
    bkl = bk.reshape((1,) * 3 + (K + 1,))
    pe2 = akl + bkl * ps
    pn2 = jnp.log(pe2)
    pk2 = jnp.exp(akap * pn2)
    delp_new = _k_lev(pe2[..., 1:] - pe2[..., :-1])

    # remap virtual T on log-p (map_scalar, kord_tm<0)
    tv_new = fv_mapz.map1_ppm(tv, peln1, pn2, iv=1, kord=abs(cfg.kord_tm),
                              qmin=fv_mapz.T_MIN)

    # tracers on pe — one batched call for all tracers (mapn_tracer,
    # fv_operators.F90:234)
    q_new = {}
    if q:
        names_q = list(q.keys())
        # single-pass all-tracer remap: shared overlap-weight matrices,
        # batched matmul contraction (fv_operators.F90 mapn_tracer:234)
        qs_stack = jnp.stack([_k_last(q[k]) for k in names_q], axis=0)
        qk = fv_mapz.mapn_tracer(qs_stack, pe1, pe2, kord=cfg.kord_tr,
                                 fill=cfg.fill)
        for i, name in enumerate(names_q):
            q_new[name] = _k_lev(qk[i])

    # winds: u at y-walls uses the average of the adjacent cell rows' edges
    pe_u0 = 0.5 * (pe_pad[..., wsl, ctr] + _rl(pe_pad)[..., wsl, ctr])
    # _rl pads on the cell axis: row j-1 under wall j
    pe_u0 = _k_last(pe_u0)
    ps_u = pe_u0[..., -1:]
    pe_u1 = akl + bkl * ps_u
    u_new = fv_mapz.map1_ppm(_k_last(u), pe_u0, pe_u1, iv=-1,
                             kord=abs(cfg.kord_mt))
    pe_v0 = 0.5 * (pe_pad[..., ctr, wsl] + _cl(pe_pad)[..., ctr, wsl])
    pe_v0 = _k_last(pe_v0)
    ps_v = pe_v0[..., -1:]
    pe_v1 = akl + bkl * ps_v
    v_new = fv_mapz.map1_ppm(_k_last(v), pe_v0, pe_v1, iv=-1,
                             kord=abs(cfg.kord_mt))

    pkz_new = (pk2[..., 1:] - pk2[..., :-1]) / (akap * (pn2[..., 1:] - pn2[..., :-1]))

    return SimpleNamespace(delp=delp_new, tv=_k_lev(tv_new), u=_k_lev(u_new),
                           v=_k_lev(v_new), q=q_new or None,
                           pkz=_k_lev(pkz_new), pk2=_k_lev(pk2),
                           ps=_k_lev(ps)[:, 0])


def fv_dynamics_hydro(delp, pt, u, v, q, g, cfg: DynConfig, ak, bk, ptop,
                      u0=None, v0=None, mp_cfg=None):
    """One big (physics) timestep of hydrostatic dynamics.

    pt in/out is TEMPERATURE. q: dict of tracer fields or None; with a
    "sphum" tracer and cfg.adiabatic False the virtual-temperature (zvir)
    path of fv_dynamics.F90:373-399 is active. cfg.consv_te > 0 enables the
    global total-energy fixer (fv_mapz.F90:644-772); cfg.tau > 0 with
    u0/v0 enables the ideal-case Rayleigh_Super sponge."""
    akap = con.KAPPA
    mdt = cfg.dt / cfg.k_split
    zvir = 0.0
    if q and "sphum" in q and not cfg.adiabatic:
        zvir = thermo.ZVIR
    u, v = g.halo.reconcile_dgrid(u, v)

    # entry pressures + pt -> theta_v (fv_dynamics.F90:275-399)
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    pkz = (pk[:, 1:] - pk[:, :-1]) / (akap * (peln[:, 1:] - peln[:, :-1]))
    tv = pt * (1.0 + zvir * q["sphum"]) if zvir else pt

    te0 = None
    if cfg.consv_te > 0.0:
        te0 = thermo.total_energy_2d_hydro(u, v, tv, delp, peln, pe,
                                           g.phis_p[..., 3:-3, 3:-3], g)
    aam0 = None
    if cfg.consv_am:
        aam0, _, _ = thermo.compute_aam(u, v, delp, g, ptop)
    if cfg.tau > 0.0 and not cfg.rf_fast:
        if u0 is not None:
            u, v, _ = rayleigh_super(u, v, None, u0, v0, ak, bk, cfg, ptop)
        elif not cfg.is_ideal_case:
            # real-case amplitude-dependent drag (fv_dynamics.F90:369-370)
            import numpy as np
            akn, bkn = np.asarray(ak), np.asarray(bk)
            pm = ((akn[1:] + akn[:-1]) + (bkn[1:] + bkn[:-1]) * 1.0e5) * 0.5
            u, v, _, pt, _ = rayleigh_friction(u, v, None, pt, None, pm,
                                               cfg, ptop, g)
            tv = pt * (1.0 + zvir * q["sphum"]) if zvir else pt
    ptv = tv / pkz

    conv = jnp.zeros_like(delp)
    for n_map in range(cfg.k_split):
        last = n_map == cfg.k_split - 1
        dp1 = delp                                    # delp before acoustics
        res = dyn_core_hydro(delp, ptv, u, v, None, g, cfg, akap, ptop,
                             cfg.n_split, mdt / cfg.n_split, ak=ak, bk=bk)
        conv = conv + _mass_convergence(res.mfx, res.mfy, g)
        if q:
            # large-timestep transport on the accumulated flux capacitors
            # (fv_dynamics.F90:518-536)
            q, _ = tracer_2d(q, dp1, res.mfx, res.mfy, res.cx, res.cy, g,
                             hord_tr=cfg.hord_tr,
                             q_split=cfg.q_split if cfg.use_scan else
                             max(1, cfg.q_split))
        rm = remap_hydro(res.delp, res.pt, res.u, res.v, q, res.pe, res.peln,
                         res.pkz, ak, bk, g, cfg, akap, last_step=last)
        delp, u, v = rm.delp, rm.u, rm.v
        q = rm.q
        if last:
            dtmp = 0.0
            if te0 is not None:
                peln_i = jnp.log(ak.reshape((1, -1, 1, 1))
                                 + bk.reshape((1, -1, 1, 1)) * rm.ps[:, None])
                te1 = thermo.total_energy_2d_hydro(
                    u, v, rm.tv, delp, peln_i, jnp.exp(peln_i),
                    g.phis_p[..., 3:-3, 3:-3], g)
                dtmp = thermo.energy_fixer_dtmp(
                    te0, te1, rm.pkz, delp, rm.pk2, ptop, cfg.consv_te, g,
                    hydrostatic=True, reproduce=cfg.reproduce_sum)
            qs_new = q["sphum"] if zvir else None
            pt = rm.tv + (dtmp / con.CP_AIR) * rm.pkz
            if zvir:
                pt = pt / (1.0 + zvir * qs_new)
        else:
            ptv = rm.tv / rm.pkz

    # 6-category negative-moisture adjustment (fv_dynamics.F90:724 nwat==6)
    mp_diag = None
    if q and not cfg.adiabatic and "liq_wat" in q:
        pt, q = fv_sg.neg_adj3(pt, delp, q, hydrostatic=True)
        if mp_cfg is not None:
            # inline GFDL microphysics (intermediate_phys hook,
            # fv_mapz.F90:781)
            from ..physics.gfdl_mp import gfdl_mp_driver
            pt, q, mp_diag = gfdl_mp_driver(pt, delp, None, q, cfg.dt, ptop,
                                            cfg=mp_cfg, hydrostatic=True)

    if cfg.consv_am:
        u, v, _ = thermo.am_fixer(u, v, delp, aam0, g, ptop,
                                  reproduce=cfg.reproduce_sum)

    return SimpleNamespace(delp=delp, pt=pt, u=u, v=v, q=q, ps=rm.ps,
                           mp_diag=mp_diag, omga=_omega(conv, cfg.dt))


def _mass_convergence(mfx, mfy, g):
    """Per-layer mass convergence (Pa) from the accumulated wall mass
    fluxes (the dyn_core.F90:739/778 omga prep)."""
    rarea = g.rarea[..., 3:-3, 3:-3]
    return (mfx[..., :, :-1] - mfx[..., :, 1:]
            + mfy[..., :-1, :] - mfy[..., 1:, :]) * rarea


def _omega(conv, dt):
    """Vertical pressure velocity omga (Pa/s) at layer lower interfaces:
    the top-down cumulative sum of layer convergence rates
    (dyn_core.F90:1197-1214 om2d path, use_old_omega=.false.)."""
    return jnp.cumsum(conv, axis=1) / dt


def rayleigh_super(u, v, w, u0, v0, ak, bk, cfg, ptop):
    """Ideal-case Rayleigh sponge (fv_dynamics.F90 Rayleigh_Super:953):
    relax u/v toward the initial jet (and damp w) above rf_cutoff with
    rf(k) = dt/tau * sin^2(pi/2 * ln(cutoff/p)/ln(cutoff/ptop))."""
    import numpy as np
    K = u.shape[1]
    akn, bkn = np.asarray(ak), np.asarray(bk)
    pf = ((akn[1:] + akn[:-1]) + (bkn[1:] + bkn[:-1]) * 1.0e5) * 0.5
    rf = np.zeros(K)
    sday = 86400.0
    for k in range(K):
        if pf[k] < cfg.rf_cutoff:
            rf[k] = (cfg.dt / (cfg.tau * sday)
                     * np.sin(0.5 * np.pi * np.log(cfg.rf_cutoff / pf[k])
                              / np.log(cfg.rf_cutoff / ptop)) ** 2)
    rfk = jnp.asarray(rf, u.dtype).reshape(1, K, 1, 1)
    u = (u + rfk * u0) / (1.0 + rfk)
    v = (v + rfk * v0) / (1.0 + rfk)
    if w is not None:
        w = w / (1.0 + rfk)
    return u, v, w


def rayleigh_friction(u, v, w, pt, delz, pm, cfg, ptop, g,
                      hydrostatic=True, conserve=True):
    """Real-case Rayleigh friction (fv_dynamics.F90 Rayleigh_Friction:1126):
    amplitude-dependent drag above rf_cutoff. The damping rate is
    rf(k)*sqrt(|V|^2/u000) — strong winds are damped harder — applied to
    the D winds through staggered averages of the A-grid speed field, with
    the lost kinetic energy returned as heat when conserve (exact
    cp-or-cv bookkeeping incl. the delz rescale in the NH case).

    pm: [K] layer reference pressures. pt is TEMPERATURE here (called
    before the theta conversion, fv_dynamics.F90:369-370). Returns
    (u, v, w, pt, delz)."""
    import numpy as np
    from .fv_update_phys import cubed_to_latlon
    K = u.shape[1]
    sday, u000 = 86400.0, 4900.0
    pmn = np.asarray(pm, np.float64)
    rf = np.where(
        pmn < cfg.rf_cutoff,
        cfg.dt / (cfg.tau * sday)
        * np.sin(0.5 * np.pi * np.log(cfg.rf_cutoff / np.maximum(pmn, ptop))
                 / np.log(cfg.rf_cutoff / ptop)) ** 2,
        0.0)
    rfk = jnp.asarray(rf, u.dtype).reshape(1, K, 1, 1)

    ua, va = cubed_to_latlon(u, v, g)
    u2f = ua * ua + va * va
    if not hydrostatic and w is not None:
        u2f = u2f + w * w
    if conserve:
        fac = 1.0 - 1.0 / (1.0 + rfk * jnp.sqrt(u2f / u000)) ** 2
        if hydrostatic:
            pmk = jnp.asarray(pm, u.dtype).reshape(1, K, 1, 1)
            pt = pt + 0.5 * u2f / (con.CP_AIR - con.RDGAS * ptop / pmk) * fac
        else:
            rcv = 1.0 / (con.CP_AIR - con.RDGAS)
            heat = 0.5 * u2f * rcv * fac
            delz = delz / pt * (pt + heat)
            pt = pt + heat
    # damping coefficient field, halo-padded for the staggered averages
    n = u.shape[-1]
    u2f_d = g.halo.pad_cell(rfk * jnp.sqrt(u2f / u000))
    cy = u2f_d[..., H - 1:H + n + 1, H:H + n]     # cells j-1..n for y-walls
    u = u / (1.0 + 0.5 * (cy[..., :-1, :] + cy[..., 1:, :]))
    cx = u2f_d[..., H:H + n, H - 1:H + n + 1]     # cells i-1..n for x-walls
    v = v / (1.0 + 0.5 * (cx[..., :, :-1] + cx[..., :, 1:]))
    if not hydrostatic and w is not None:
        w = w / (1.0 + u2f_d[..., H:-H, H:-H])
    return u, v, w, pt, delz


def remap_nh(delp, ptv, u, v, w, delz, ws, q, pe_pad, peln_pad, ak, bk, g,
             cfg, akap, last_step, kord_wz=9):
    """Nonhydrostatic vertical remap (fv_mapz.F90 Lagrangian_to_Eulerian,
    hydrostatic=.false., kord_tm<0): theta_v -> T_v via the gas law
    (fv_mapz.F90:222), remap T_v on log-p, w with the ws bottom BC
    (iv=-2, :399-411), delz as specific volume (:414-422), winds on pe.
    """
    f = fi
    npx = g.npx
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    K = delp.shape[1]
    rrg = -con.RDGAS / con.GRAV
    k1k = akap / (1.0 - akap)

    pe1 = _k_last(pe_pad[..., ctr, ctr])
    peln1 = _k_last(peln_pad[..., ctr, ctr])

    # theta_v -> virtual temperature via the gas law (pt*pkz)
    tv = _k_last(ptv * jnp.exp(k1k * jnp.log(rrg * delp / delz * ptv)))

    ps = pe1[..., -1:]
    akl = ak.reshape((1,) * 3 + (K + 1,))
    bkl = bk.reshape((1,) * 3 + (K + 1,))
    pe2 = akl + bkl * ps
    pn2 = jnp.log(pe2)
    pk2 = jnp.exp(akap * pn2)
    dp2 = pe2[..., 1:] - pe2[..., :-1]
    delp_new = _k_lev(dp2)

    tv_new = fv_mapz.map1_ppm(tv, peln1, pn2, iv=1, kord=abs(cfg.kord_tm),
                              qmin=fv_mapz.T_MIN)

    w_new = fv_mapz.map1_ppm(_k_last(w), pe1, pe2, qs=ws, iv=-2,
                             kord=abs(kord_wz))

    # delz as specific volume (remap conservatively, then rescale)
    sv = _k_last(-delz / delp)
    sv_new = fv_mapz.map1_ppm(sv, pe1, pe2, iv=1, kord=abs(cfg.kord_tm))
    delz_new = _k_lev(-sv_new * dp2)

    q_new = {}
    if q:
        names_q = list(q.keys())
        # single-pass all-tracer remap (mapn_tracer, shared weights)
        qs_stack = jnp.stack([_k_last(q[k]) for k in names_q], axis=0)
        qk = fv_mapz.mapn_tracer(qs_stack, pe1, pe2, kord=cfg.kord_tr,
                                 fill=cfg.fill)
        for i, name in enumerate(names_q):
            q_new[name] = _k_lev(qk[i])

    pe_u0 = _k_last(0.5 * (pe_pad[..., wsl, ctr] + _rl(pe_pad)[..., wsl, ctr]))
    pe_u1 = akl + bkl * pe_u0[..., -1:]
    u_new = fv_mapz.map1_ppm(_k_last(u), pe_u0, pe_u1, iv=-1,
                             kord=abs(cfg.kord_mt))
    pe_v0 = _k_last(0.5 * (pe_pad[..., ctr, wsl] + _cl(pe_pad)[..., ctr, wsl]))
    pe_v1 = akl + bkl * pe_v0[..., -1:]
    v_new = fv_mapz.map1_ppm(_k_last(v), pe_v0, pe_v1, iv=-1,
                             kord=abs(cfg.kord_mt))

    # post-remap pkz from the gas law with T_v (fv_mapz.F90:482)
    delp_k = _k_lev(dp2)
    delz_k = delz_new
    tvk = _k_lev(tv_new)
    pkz_new = jnp.exp(akap * jnp.log(rrg * delp_k / delz_k * tvk))

    return SimpleNamespace(delp=delp_new, tv=tvk, u=_k_lev(u_new),
                           v=_k_lev(v_new), w=_k_lev(w_new), delz=delz_new,
                           q=q_new or None, pkz=pkz_new, pk2=_k_lev(pk2),
                           ps=_k_lev(_k_last(ps))[:, 0])


def fv_dynamics_nh(delp, pt, u, v, w, delz, q, g, cfg: DynConfig, ak, bk,
                   ptop, dp0, u0=None, v0=None, mp_cfg=None):
    """One big timestep of nonhydrostatic dynamics (fv_dynamics.F90,
    hydrostatic=.false.). pt in/out is TEMPERATURE; w vertical velocity
    (m/s); delz layer height thickness (m, negative). dp0: reference
    pressure thickness profile (for update_dz interface interpolation)."""
    from .dyn_core import dyn_core_nh

    akap = con.KAPPA
    rrg = -con.RDGAS / con.GRAV
    cv_air = con.CP_AIR - con.RDGAS
    mdt = cfg.dt / cfg.k_split
    zvir = 0.0
    if q and "sphum" in q and not cfg.adiabatic:
        zvir = thermo.ZVIR
    u, v = g.halo.reconcile_dgrid(u, v)

    # entry: layer p**kappa from the gas law, pt -> theta_v (normalized)
    tv = pt * (1.0 + zvir * q["sphum"]) if zvir else pt
    pkz = jnp.exp(akap * jnp.log(rrg * delp / delz * tv))

    te0 = None
    if cfg.consv_te > 0.0:
        te0 = thermo.total_energy_2d_nh(u, v, w, tv,
                                        q["sphum"] if zvir else None,
                                        delp, delz,
                                        g.phis_p[..., 3:-3, 3:-3], g)
    aam0 = None
    if cfg.consv_am:
        aam0, _, _ = thermo.compute_aam(u, v, delp, g, ptop)
    if cfg.tau > 0.0 and not cfg.rf_fast:
        if u0 is not None:
            u, v, w = rayleigh_super(u, v, w, u0, v0, ak, bk, cfg, ptop)
        elif not cfg.is_ideal_case:
            import numpy as np
            akn, bkn = np.asarray(ak), np.asarray(bk)
            pm = ((akn[1:] + akn[:-1]) + (bkn[1:] + bkn[:-1]) * 1.0e5) * 0.5
            u, v, w, pt, delz = rayleigh_friction(
                u, v, w, pt, delz, pm, cfg, ptop, g, hydrostatic=False)
            tv = pt * (1.0 + zvir * q["sphum"]) if zvir else pt
    ptv = tv / pkz

    conv = jnp.zeros_like(delp)
    for n_map in range(cfg.k_split):
        last = n_map == cfg.k_split - 1
        dp1 = delp
        res = dyn_core_nh(delp, ptv, u, v, w, delz, None, g, cfg, akap,
                          ptop, cfg.n_split, mdt / cfg.n_split, dp0,
                          ak=ak, bk=bk,
                          q=q if cfg.do_fast_phys else None,
                          fast_cfg=mp_cfg if cfg.do_fast_phys else None,
                          zvir=zvir)
        if cfg.do_fast_phys and res.q is not None:
            q = res.q
        conv = conv + _mass_convergence(res.mfx, res.mfy, g)
        if q:
            q, _ = tracer_2d(q, dp1, res.mfx, res.mfy, res.cx, res.cy, g,
                             hord_tr=cfg.hord_tr,
                             q_split=cfg.q_split if cfg.use_scan else
                             max(1, cfg.q_split))
        rm = remap_nh(res.delp, res.pt, res.u, res.v, res.w, res.delz,
                      res.ws, q, res.pe, res.peln, ak, bk, g, cfg, akap,
                      last_step=last, kord_wz=cfg.kord_wz)
        delp, u, v, w, delz = rm.delp, rm.u, rm.v, rm.w, rm.delz
        q = rm.q
        if last:
            dtmp = 0.0
            if te0 is not None:
                te1 = thermo.total_energy_2d_nh(
                    u, v, w, rm.tv, q["sphum"] if zvir else None,
                    delp, delz, g.phis_p[..., 3:-3, 3:-3], g)
                dtmp = thermo.energy_fixer_dtmp(
                    te0, te1, rm.pkz, delp, rm.pk2, ptop, cfg.consv_te, g,
                    hydrostatic=False, reproduce=cfg.reproduce_sum)
            pt = rm.tv + (dtmp / cv_air) * rm.pkz
            if zvir:
                pt = pt / (1.0 + zvir * q["sphum"])
        else:
            ptv = rm.tv / rm.pkz

    mp_diag = None
    if q and not cfg.adiabatic and "liq_wat" in q:
        pt, q = fv_sg.neg_adj3(pt, delp, q, delz=delz, hydrostatic=False)
        if mp_cfg is not None:
            from ..physics.gfdl_mp import gfdl_mp_driver
            pt, q, mp_diag = gfdl_mp_driver(pt, delp, delz, q, cfg.dt, ptop,
                                            cfg=mp_cfg, hydrostatic=False,
                                            w=w)
            w = mp_diag.pop("w", w)

    if cfg.consv_am:
        u, v, _ = thermo.am_fixer(u, v, delp, aam0, g, ptop,
                                  reproduce=cfg.reproduce_sum)

    return SimpleNamespace(delp=delp, pt=pt, u=u, v=v, w=w, delz=delz,
                           q=q, ps=rm.ps, mp_diag=mp_diag,
                           omga=_omega(conv, cfg.dt))
