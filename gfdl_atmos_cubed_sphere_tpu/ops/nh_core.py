"""Nonhydrostatic vertical solvers and height advection.

Re-implements /root/reference/model/nh_utils.F90:
  update_dz_c:59   (C-stage upwind height advection)
  update_dz_d:204  (D-stage fv_tp_2d height advection, edge_profile winds)
  Riem_Solver_C (:323) and Riem_Solver3 (Riem_Solver3test:~530) with the
  operational fully-implicit SIM1_solver (:1277, a_imp > 0.999).
All column solves are batched over (tile, y, x) with lax.scan along k — the
reference's per-(i,j) Fortran loops become one vectorized tridiagonal sweep.

Adiabatic (use_cond=False, moist_kappa=False) path; cp2 == akap.
"""

from functools import lru_cache
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as con
from .fill_corners import fi, fill_4corners_cell, cube_edges
from .tp_core import fv_tp_2d, deln_damp_fluxes

H = 3
DZ_MIN = 2.0          # nh_utils.F90 dz_min (module parameter, = 2 m)
R3 = 1.0 / 3.0


def _kfirst(a):
    """[.., K, y, x] -> [K, .., y, x]"""
    return jnp.moveaxis(a, -3, 0)


def _kmid(a):
    return jnp.moveaxis(a, 0, -3)


def sim1_solver(dt, dm2, pm2, pem, w2, dz2, pt2, ws, gama, akap, p_fac,
                alpha=1.0):
    """Semi-implicit Riemann/vertical-sound-wave solver.

    alpha=1 (default) is the fully-implicit SIM1_solver (nh_utils.F90:1277);
    0.5 < alpha < 1 is the off-centered SIM_solver (:1396): the pressure
    force is alpha*new + beta*old with beta = 1-alpha, adding the explicit
    wk terms and the final pp blend of pe2.

    All fields [.., K, y, x] (interfaces [.., K+1, y, x]); ws [.., y, x].
    dm2 = delp/grav; pm2 log-mean layer pressure; pem hydrostatic interface
    pressure; pt2 virtual (potential->actual in caller) temperature.
    Returns (pe2 [.., K+1, y, x] nonhydro pressure perturbation at
    interfaces, w2 updated, dz2 updated).
    """
    rgas = con.RDGAS
    beta = 1.0 - alpha
    ra = 1.0 / alpha
    t2 = beta / alpha
    t1g = 2.0 * (alpha * dt) ** 2
    rdt = 1.0 / dt
    capa1 = akap - 1.0
    gm2 = gama            # 1/(1-kappa), scalar in the adiabatic path

    K = dm2.shape[-3]
    dm = _kfirst(dm2)
    pm = _kfirst(pm2)
    pe_m = _kfirst(pem)       # [K+1, ...]
    w1 = _kfirst(w2)
    dz = _kfirst(dz2)
    pt = _kfirst(pt2)

    # cell-mean nonhydro pressure perturbation from the gas law
    pe = jnp.exp(gm2 * jnp.log(-dm / dz * rgas * pt)) - pm    # [K, ...]

    g_rat = dm[:-1] / dm[1:]                                   # [K-1, ...]
    bb = jnp.concatenate([2.0 * (1.0 + g_rat),
                          2.0 * jnp.ones_like(dm[:1])], axis=0)
    dd = jnp.concatenate([3.0 * (pe[:-1] + g_rat * pe[1:]),
                          3.0 * pe[-1:]], axis=0)

    # ---- tridiagonal for interface pressure perturbation pp --------------
    bet0 = bb[0]
    pp1 = jnp.zeros_like(dd[0])
    pp2 = dd[0] / bet0

    def fwd(carry, x):
        bet, ppk = carry
        bbk, ddk, gr_km1 = x
        gam = gr_km1 / bet
        bet = bbk - gam
        ppk1 = (ddk - ppk) / bet
        return (bet, ppk1), (gam, ppk1)

    (_, _), (gam_f, pp_rest) = jax.lax.scan(
        fwd, (bet0, pp2), (bb[1:], dd[1:], g_rat))
    # pp indices: pp[0]=0, pp[1]=pp2, pp[2..K]=pp_rest
    pp = jnp.concatenate([pp1[None], pp2[None], pp_rest], axis=0)  # [K+1,...]

    # backward substitution pp(k) -= gam(k)*pp(k+1), k = K..2; gam_f rows
    # 0..K-2 hold gam(2..K), pp rows 1..K-1 hold pp(2..K)
    ppi = pp[1:]                      # pp(2)..pp(K+1)
    pK = ppi[-1]                      # pp(K+1), unchanged

    def bwd2(carry, x):
        gamk, ppk = x
        ppk = ppk - gamk * carry
        return ppk, ppk

    _, pp_b = jax.lax.scan(bwd2, pK, (gam_f[::-1], ppi[:-1][::-1]))
    pp = jnp.concatenate([pp1[None], pp_b[::-1], pK[None]], axis=0)

    # ---- implicit w solve -------------------------------------------------
    aa = (t1g * 0.5 * (gm2 + gm2) / (dz[:-1] + dz[1:])) * pe_m[1:-1]  # [K-1]
    # off-centered explicit shear terms wk(k) = t2*aa(k)*(w1(k-1)-w1(k))
    # (SIM_solver:1464-1468); identically zero for alpha = 1
    wk = t2 * aa * (w1[:-1] - w1[1:]) if beta != 0.0 else None
    ws_k = ws
    bet = dm[0] - aa[0]
    w0 = (dm[0] * w1[0] + dt * pp[1]
          + (wk[0] if wk is not None else 0.0)) / bet

    def wfwd(carry, x):
        bet, wkm1 = carry
        dmk, w1k, dpp, aak, aak1, dwk = x
        gam = aak / bet
        bet = dmk - (aak + aak1 + aak * gam)
        wk_ = (dmk * w1k + dt * dpp + dwk - aak * wkm1) / bet
        return (bet, wk_), (gam, wk_)

    dpp = pp[2:-1] - pp[1:-2]         # for k=2..K-1 (0-based rows 1..K-2)
    dwk_mid = (wk[1:] - wk[:-1] if wk is not None
               else jnp.zeros_like(aa[:-1]) * dm[1:-1])
    if K > 2:
        (betf, _), (gam_w, w_mid) = jax.lax.scan(
            wfwd, (bet, w0),
            (dm[1:-1], w1[1:-1], dpp, aa[:-1], aa[1:], dwk_mid))
    else:
        betf = bet
        gam_w = jnp.zeros((0,) + w0.shape, w0.dtype)
        w_mid = jnp.zeros((0,) + w0.shape, w0.dtype)

    p1 = t1g * gm2 / dz[-1] * pe_m[-1]
    gamK = aa[-1] / betf
    betK = dm[-1] - (aa[-1] + p1 + aa[-1] * gamK)
    w_prev = w_mid[-1] if K > 2 else w0
    # bottom: SIM1 forcing -p1*ws; SIM adds -wk(km) and the t2*w1 blend
    # (SIM_solver:1487-1492): wk1*(t2*w1(km) - ra*ws)
    bot_extra = (p1 * (t2 * w1[-1] - ra * ws_k) - wk[-1] if wk is not None
                 else -p1 * ws_k)
    wK = (dm[-1] * w1[-1] + dt * (pp[-1] - pp[-2]) + bot_extra
          - aa[-1] * w_prev) / betK

    gam_full = jnp.concatenate([gam_w, gamK[None]], axis=0)   # gam rows 1..K-1
    w_fwd = jnp.concatenate([w0[None], w_mid], axis=0)        # rows 0..K-2

    def wbwd(carry, x):
        gamk1, wk = x
        wk = wk - gamk1 * carry
        return wk, wk

    _, w_b = jax.lax.scan(wbwd, wK, (gam_full[::-1], w_fwd[::-1]))
    w_new = jnp.concatenate([w_b[::-1], wK[None]], axis=0)

    # ---- new nonhydro pressure + dz ---------------------------------------
    dpe = dm * (w_new - w1) * rdt
    if beta != 0.0:
        # off-centered pressure recovery (SIM_solver:1511-1516)
        dpe = (dpe - beta * (pp[1:] - pp[:-1])) * ra
    pe_new = jnp.concatenate(
        [jnp.zeros_like(dpe[:1]), jnp.cumsum(dpe, axis=0)], axis=0)

    p1K = (pe_new[-2] + 2.0 * pe_new[-1]) * R3
    dzK = -dm[-1] * rgas * pt[-1] * jnp.exp(
        capa1 * jnp.log(jnp.maximum(p_fac * pm[-1], p1K + pm[-1])))

    def dzbwd(carry, x):
        p1 = carry
        pek, bbk, pek1, grk, pek2, dmk, ptk, pmk = x
        p1 = (pek + bbk * pek1 + grk * pek2) * R3 - grk * p1
        dzk = -dmk * rgas * ptk * jnp.exp(
            capa1 * jnp.log(jnp.maximum(p_fac * pmk, p1 + pmk)))
        return p1, dzk

    if K > 1:
        xs = (pe_new[:-2][::-1], bb[:-1][::-1], pe_new[1:-1][::-1],
              g_rat[::-1], pe_new[2:][::-1], dm[:-1][::-1],
              pt[:-1][::-1], pm[:-1][::-1])
        _, dz_rest = jax.lax.scan(dzbwd, p1K, xs)
        dz_new = jnp.concatenate([dz_rest[::-1], dzK[None]], axis=0)
    else:
        dz_new = dzK[None]

    if beta != 0.0:
        # blend toward the implicit interface pressure (SIM_solver:1533-1535)
        pe_new = pe_new + beta * (pp - pe_new)

    return _kmid(pe_new), _kmid(w_new), _kmid(dz_new)


def rim_2d_solver(ms, bdt, dm2, pm2, w2, dz2, pt2, ws, gama, akap,
                  c_core=False):
    """Explicit Riemann-invariant solver (nh_utils.F90 RIM_2D:751),
    dispatched for |a_imp| <= 0.5 (nh_core.F90:175-177). `ms` acoustic
    substeps of dt = bdt/ms; per substep, up/down characteristics are
    traced through the column and the invariants r_lo/r_hi accumulated
    over the levels each wave crosses within dt (with surface reflection
    and the moving-surface 2*ws source).

    TPU-native formulation: the reference's per-interface characteristic
    walks (variable trip counts, goto-terminated) become clipped-fraction
    weight matrices W[e, j] = clip((budget(e) - transit_before(e, j)) /
    dts(j), 0, 1) built from prefix sums of the per-level acoustic transit
    times dts, contracted against dm / r_lo / r_hi in one einsum — O(K^2)
    but fully vectorized over (tile, y, x) columns. The `1 < ms < 8`
    semi-implicit pre-pass for acoustically thick top levels (bdt <= dts)
    is reproduced with per-column ks0 masks, including the whole-column
    (ks0 == km) shortcut.

    Deviation: the characteristic walks stop at kt1 = max(ks1, ktop)
    rather than max(1, ktop) — the reference can read one stale level
    below the pre-pass boundary in the exotic ktop == ks1-1 > 0 case.

    Memory: materializes [.., K+1, K] weight tensors per substep — fine
    for this non-default solver family (operational default is SIM1).

    Shapes as sim1_solver; pm2 is the layer-mean pressure. c_core=True
    (Riem_Solver_C call, nh_utils.F90:454) leaves w untouched.
    Returns (pe2 interface pressure increment [.., K+1, y, x], w2, dz2).
    """
    rgas = con.RDGAS
    grg = gama * rgas
    rdt = 1.0 / bdt
    ms = int(ms)
    dt = bdt / ms
    pre_active = 1 < ms < 8
    K = dm2.shape[-3]

    kl = lambda x: jnp.moveaxis(x, -3, -1)        # [.., K, y, x] -> [.., y, x, K]
    dm = kl(dm2)
    pm = kl(pm2)
    wm0 = kl(w2) * dm                              # momentum
    dz0 = kl(dz2)
    pt1 = kl(pt2)
    ws2 = 2.0 * ws
    j_lev = jnp.arange(K)                          # 0-based level (Fortran k-1)
    e_int = jnp.arange(K + 1)                      # 0-based interface (ke-1)

    def acoustic(dz, wm):
        rden = -rgas * dm / dz
        pf = jnp.exp(gama * jnp.log(rden * pt1))
        dts = -dz / jnp.sqrt(grg * pf / rden)
        return pf, dts

    def safediv(a, b):
        return a / jnp.where(b != 0.0, b, 1.0)

    # ---- pre-pass: semi-implicit thick top levels (RIM_2D:797-856) -------
    pf0, dts0 = acoustic(dz0, wm0)
    if pre_active:
        thick0 = bdt > dts0
        ks0 = jnp.where(jnp.any(thick0, -1), jnp.argmax(thick0, -1), K)
        ks0 = jnp.maximum(ks0, 1)                  # ks0 = 0 is out of the
        ks1 = ks0                                  # reference's index range
    else:
        ks0 = ks1 = jnp.zeros(dm.shape[:-1], jnp.int32) + 1

    cm = dm / dts0
    wc = wm0 / dts0
    ppp = pf0 - pm
    wbar_mid_pre = safediv(wc[..., :-1] + wc[..., 1:] + ppp[..., 1:]
                           - ppp[..., :-1], cm[..., :-1] + cm[..., 1:])
    wbar_pre = jnp.concatenate(
        [safediv(wc[..., :1] + ppp[..., :1], cm[..., :1]),
         wbar_mid_pre, ws[..., None]], axis=-1)            # [.., K+1]
    pbar_pre = jnp.concatenate(
        [jnp.zeros_like(wbar_pre[..., :1]),
         bdt * (cm * wbar_pre[..., 1:] - wc + ppp)], axis=-1)

    ks1e = ks1[..., None]
    if pre_active:
        # partial pre-pass state: levels k <= ks0-1 advanced over bdt
        pre_j = j_lev <= ks1e - 2
        dwb = bdt * (wbar_pre[..., 1:] - wbar_pre[..., :-1])
        dz_pre = jnp.where(pre_j, dz0 + dwb, dz0)
        dpb = pbar_pre[..., 1:] - pbar_pre[..., :-1]
        w_pre = jnp.where(pre_j, (wm0 + dpb) / dm, wm0 / dm)
        pbar_b = jnp.where(
            ks1 > 1,
            jnp.take_along_axis(pbar_pre, ks1[..., None] - 1,
                                -1)[..., 0] / ms,
            0.0)
        pe1_0 = jnp.where((e_int >= 1) & (e_int <= ks1e - 1), pbar_pre, 0.0)
    else:
        dz_pre, w_pre = dz0, wm0 / dm
        pbar_b = jnp.zeros(dm.shape[:-1], dm.dtype)
        pe1_0 = jnp.zeros_like(wbar_pre)

    # ---- ms explicit substeps (RIM_2D:858-975) ---------------------------
    def substep(carry, _):
        dz, wm, pe1 = carry
        pf, dts = acoustic(dz, wm)
        ptmp1 = dts * (pf - pm)
        r_lo = wm + ptmp1
        r_hi = wm - ptmp1

        thick = (dt > dts) & (j_lev >= ks1e - 1)
        ktop = jnp.where(jnp.any(thick, -1), jnp.argmax(thick, -1), K)
        kt1 = jnp.maximum(ks1, ktop)
        ktop_e = ktop[..., None]
        kt1_e = kt1[..., None]

        P = jnp.concatenate([jnp.zeros_like(dts[..., :1]),
                             jnp.cumsum(dts, axis=-1)], axis=-1)  # [.., K+1]
        PK = P[..., -1:]

        # direct treatment of thick levels (RIM_2D:878-886)
        zf = dt / dts
        dmask = (j_lev >= ks1e - 1) & (j_lev <= ktop_e - 1)
        mb_d = jnp.where(dmask, zf * dm, 0.0)
        rb_d = jnp.where(dmask, zf * r_lo, 0.0)
        rt_d = jnp.where(dmask, zf * r_hi, 0.0)
        zcol = jnp.zeros_like(mb_d[..., :1])
        m_bot = jnp.concatenate([mb_d, zcol], -1)
        r_bot = jnp.concatenate([rb_d, zcol], -1)
        m_top = jnp.concatenate([zcol, mb_d], -1)
        r_top = jnp.concatenate([zcol, rt_d], -1)

        dts_j = dts[..., None, :]
        P_e = P[..., :, None]
        j_b = j_lev
        e_b = e_int[..., :, None]

        # upward characteristics into interface e (RIM_2D:896-911)
        wt = jnp.clip((dt - (P_e - P[..., None, 1:])) / dts_j, 0.0, 1.0)
        wt = jnp.where((j_b >= kt1_e[..., None] - 1) & (j_b <= e_b - 1)
                       & (e_b >= ktop_e[..., None] + 1), wt, 0.0)
        m_top = m_top + jnp.einsum("...ej,...j->...e", wt, dm)
        r_top = r_top + jnp.einsum("...ej,...j->...e", wt, r_hi)

        # downward + surface-reflected characteristics (RIM_2D:913-945)
        w1 = jnp.clip((dt - (P[..., None, :-1] - P_e)) / dts_j, 0.0, 1.0)
        bot_e = (e_b >= ktop_e[..., None]) & (e_b <= K - 1)
        w1 = jnp.where((j_b >= e_b) & bot_e, w1, 0.0)
        b = dt - (PK - P)                               # [.., K+1]
        wr = jnp.clip((b[..., :, None] - (PK[..., None, :] - P[..., None, 1:]))
                      / dts_j, 0.0, 1.0)
        wr = jnp.where((j_b >= kt1_e[..., None] - 1) & bot_e, wr, 0.0)
        seg2_m = jnp.einsum("...ej,...j->...e", wr, dm)
        m_bot = (m_bot + jnp.einsum("...ej,...j->...e", w1, dm) + seg2_m)
        s2max = PK - jnp.take_along_axis(P, kt1_e - 1, -1)
        refl = jnp.where((b > 0.0) & (b <= s2max), seg2_m * ws2[..., None],
                         0.0)
        r_bot = (r_bot + jnp.einsum("...ej,...j->...e", w1, r_lo)
                 - jnp.einsum("...ej,...j->...e", wr, r_hi) + refl)

        # interface velocities and pressure impulses (RIM_2D:947-958)
        wbar_mid = safediv(r_bot + r_top, m_top + m_bot)
        wbar = jnp.where((e_int >= ks1e) & (e_int <= K - 1), wbar_mid,
                         wbar_pre if pre_active else
                         jnp.concatenate([safediv(r_bot[..., :1],
                                                  m_bot[..., :1]),
                                          wbar_pre[..., 1:]], -1))
        if pre_active:
            wbar = jnp.where((e_int == 0) & (ks1e == 1),
                             safediv(r_bot[..., :1], m_bot[..., :1]), wbar)
        wbar = wbar.at[..., -1].set(ws)
        pbar = jnp.where(e_int >= ks1e, m_top * wbar - r_top,
                         jnp.where(e_int == ks1e - 1, pbar_b[..., None],
                                   0.0))
        pe1 = pe1 + jnp.where(e_int >= ks1e, pbar, 0.0)

        upd = j_lev >= ks1e - 1
        dz = jnp.where(upd, dz + dt * (wbar[..., 1:] - wbar[..., :-1]), dz)
        wm = jnp.where(upd, wm + pbar[..., 1:] - pbar[..., :-1], wm)
        return (dz, wm, pe1), None

    (dz_f, wm_f, pe1), _ = jax.lax.scan(
        substep, (dz_pre, wm0, pe1_0), None, length=ms)

    low = j_lev >= ks1e - 1
    dz_out = jnp.where(low, dz_f, dz_pre)
    w_out = jnp.where(low, wm_f / dm, w_pre)
    pe2 = jnp.where(e_int >= 1, pe1 * rdt, 0.0)

    if pre_active:
        # whole-column-thick shortcut (RIM_2D:826-843)
        full = (ks0 == K)[..., None]
        dwb = bdt * (wbar_pre[..., 1:] - wbar_pre[..., :-1])
        dpb = pbar_pre[..., 1:] - pbar_pre[..., :-1]
        dz_out = jnp.where(full, dz0 + dwb, dz_out)
        w_out = jnp.where(full, (wm0 + dpb) / dm, w_out)
        pe2 = jnp.where(full & (e_int >= 1), pbar_pre * rdt, pe2)

    km = lambda x: jnp.moveaxis(x, -1, -3)
    w_ret = w2 if c_core else km(w_out)
    return km(pe2), w_ret, km(dz_out)


def sim3_solver(dt, dm2, pem, w2, dz2, pt2, ws, gama, akap, p_fac,
                scale_m=0.0, alpha=1.0):
    """SIM3-family semi-implicit solver (nh_utils.F90 SIM3_solver:984,
    SIM3p0_solver:1134). Unlike SIM1/SIM (which work on the nonhydrostatic
    pressure *perturbation*), this family reconstructs the FULL edge
    pressure by a tridiagonal profile fit of the gas-law cell pressure with
    a hydrostatic half-layer correction at the bottom (r2g/r6g terms), then
    solves the implicit w system against it.

    alpha=1 is SIM3p0 (a_imp < -0.999); 0.5 < alpha < 1 is SIM3 with
    off-centering alpha = |a_imp| (-0.999 <= a_imp < -0.5). scale_m adds
    the vertical-motion damping term -scale_m*dm(1) to the off-diagonals.

    Shapes as sim1_solver. Returns (pe2 perturbation at interfaces
    [.., K+1, y, x], w2, dz2).
    """
    rgas = con.RDGAS
    beta = 1.0 - alpha
    ra = 1.0 / alpha
    t2 = beta / alpha
    t1g = gama * 2.0 * (alpha * dt) ** 2
    rdt = 1.0 / dt
    capa1 = akap - 1.0
    r2g = con.GRAV / 2.0
    r6g = con.GRAV / 6.0

    K = dm2.shape[-3]
    dm = _kfirst(dm2)
    pe_m = _kfirst(pem)       # [K+1, ...]
    w1 = _kfirst(w2)
    dz = _kfirst(dz2)
    pt = _kfirst(pt2)

    # full gas-law pressure at cell centers
    pc = jnp.exp(gama * jnp.log(-dm / dz * rgas * pt))        # [K, ...]

    g_rat = dm[:-1] / dm[1:]                                   # [K-1, ...]
    bb = jnp.concatenate([2.0 * (1.0 + g_rat),
                          2.0 * jnp.ones_like(dm[:1])], axis=0)
    dd = jnp.concatenate([3.0 * (pc[:-1] + g_rat * pc[1:]),
                          3.0 * pc[-1:] + r2g * dm[-1:]], axis=0)

    # ---- tridiagonal for FULL interface pressure ------------------------
    # pe(1) = pem(1) fixed; forward produces pe(2)..pe(K+1)
    bet0 = bb[0]
    pe_top = pe_m[0]
    pe_2 = (dd[0] - pe_top) / bet0

    def fwd(carry, x):
        bet, pek = carry
        bbk, ddk, gr_km1 = x
        gam = gr_km1 / bet
        bet = bbk - gam
        pek1 = (ddk - pek) / bet
        return (bet, pek1), (gam, pek1)

    (_, _), (gam_f, pe_rest) = jax.lax.scan(
        fwd, (bet0, pe_2), (bb[1:], dd[1:], g_rat))
    pei = jnp.concatenate([pe_2[None], pe_rest], axis=0)      # pe(2)..pe(K+1)
    pK = pei[-1]

    def bwd2(carry, x):
        gamk, pk = x
        pk = pk - gamk * carry
        return pk, pk

    _, pe_b = jax.lax.scan(bwd2, pK, (gam_f[::-1], pei[:-1][::-1]))
    pe_full = jnp.concatenate([pe_top[None], pe_b[::-1], pK[None]], axis=0)

    pp = pe_full - pe_m                                        # perturbation

    # ---- implicit w solve ----------------------------------------------
    aa0 = t1g / (dz[:-1] + dz[1:]) * pe_full[1:-1]            # [K-1, ...]
    wk = t2 * aa0 * (w1[:-1] - w1[1:]) if beta != 0.0 else None
    aa = aa0 - scale_m * dm[0]

    bet = dm[0] - aa[0]
    w0 = (dm[0] * w1[0] + dt * pp[1]
          + (wk[0] if wk is not None else 0.0)) / bet

    def wfwd(carry, x):
        bet, wkm1 = carry
        dmk, w1k, dpp, aak, aak1, dwk = x
        gam = aak / bet
        bet = dmk - (aak + aak1 + aak * gam)
        wk_ = (dmk * w1k + dt * dpp + dwk - aak * wkm1) / bet
        return (bet, wk_), (gam, wk_)

    dpp = pp[2:-1] - pp[1:-2]
    dwk_mid = (wk[1:] - wk[:-1] if wk is not None
               else jnp.zeros_like(aa[:-1]) * dm[1:-1])
    if K > 2:
        (betf, _), (gam_w, w_mid) = jax.lax.scan(
            wfwd, (bet, w0),
            (dm[1:-1], w1[1:-1], dpp, aa[:-1], aa[1:], dwk_mid))
    else:
        betf = bet
        gam_w = jnp.zeros((0,) + w0.shape, w0.dtype)
        w_mid = jnp.zeros((0,) + w0.shape, w0.dtype)

    wk1 = t1g / dz[-1] * pe_full[-1]
    gamK = aa[-1] / betf
    betK = dm[-1] - (aa[-1] + wk1 + aa[-1] * gamK)
    w_prev = w_mid[-1] if K > 2 else w0
    bot_extra = (wk1 * (t2 * w1[-1] - ra * ws) - wk[-1] if wk is not None
                 else -wk1 * ws)
    wK = (dm[-1] * w1[-1] + dt * (pp[-1] - pp[-2]) + bot_extra
          - aa[-1] * w_prev) / betK

    gam_full = jnp.concatenate([gam_w, gamK[None]], axis=0)
    w_fwd = jnp.concatenate([w0[None], w_mid], axis=0)

    def wbwd(carry, x):
        gamk1, wkv = x
        wkv = wkv - gamk1 * carry
        return wkv, wkv

    _, w_b = jax.lax.scan(wbwd, wK, (gam_full[::-1], w_fwd[::-1]))
    w_new = jnp.concatenate([w_b[::-1], wK[None]], axis=0)

    # ---- updated perturbation -> clamped full pressure -> dz -------------
    dpe = dm * (w_new - w1) * rdt
    if beta != 0.0:
        dpe = (dpe - beta * (pp[1:] - pp[:-1])) * ra
    pert = jnp.concatenate(
        [jnp.zeros_like(dpe[:1]), jnp.cumsum(dpe, axis=0)], axis=0)
    pe_new = jnp.concatenate(
        [pe_m[:1],
         jnp.maximum(p_fac * pe_m[1:], pert[1:] + pe_m[1:])], axis=0)

    p1K = (pe_new[-2] + 2.0 * pe_new[-1]) * R3 - r6g * dm[-1]
    dzK = -dm[-1] * rgas * pt[-1] * jnp.exp(capa1 * jnp.log(p1K))

    def dzbwd(carry, x):
        p1 = carry
        pek, bbk, pek1, grk, pek2, dmk, ptk = x
        p1 = (pek + bbk * pek1 + grk * pek2) * R3 - grk * p1
        dzk = -dmk * rgas * ptk * jnp.exp(capa1 * jnp.log(p1))
        return p1, dzk

    if K > 1:
        xs = (pe_new[:-2][::-1], bb[:-1][::-1], pe_new[1:-1][::-1],
              g_rat[::-1], pe_new[2:][::-1], dm[:-1][::-1], pt[:-1][::-1])
        _, dz_rest = jax.lax.scan(dzbwd, p1K, xs)
        dz_new = jnp.concatenate([dz_rest[::-1], dzK[None]], axis=0)
    else:
        dz_new = dzK[None]

    pe_out = pe_new - pe_m
    if beta != 0.0:
        pe_out = pe_out + beta * (pp - pe_out)

    return _kmid(pe_out), _kmid(w_new), _kmid(dz_new)


def imp_diff_w(cd, delz, ws, w):
    """Implicit vertical diffusion of w (nh_utils.F90 imp_diff_w:688),
    applied after the Riemann solver when d2bg_zq > 0 (nh_core.F90:188-190).

    cd: diffusion coefficient (m^2/s * dt, the reference passes d2bg_zq);
    delz [.., K, y, x] (negative heights); ws [.., y, x] surface w BC.
    Returns diffused w.
    """
    K = w.shape[-3]
    dzl = _kfirst(delz)
    wl = _kfirst(w)

    dz_i = 0.5 * (dzl[:-1] + dzl[1:])          # dz(k) for k=2..K  [K-1,...]
    c = -cd / (dz_i * dzl[:-1])                # c(k) for k=1..K-1

    bet0 = 1.0 - c[0]
    wt0 = wl[0] / bet0

    def fwd(carry, x):
        bet, wtm1 = carry
        ck_m1, ck, ak, wk = x
        gam = ck_m1 / bet
        bet = (1.0 + ak - ck) + ak * gam
        wt = (wk + ak * wtm1) / bet
        return (bet, wt), (gam, wt)

    a_mid = cd / (dz_i[:-1] * dzl[1:-1])       # a(k), k=2..K-1
    if K > 2:
        (betf, _), (gam_mid, wt_mid) = jax.lax.scan(
            fwd, (bet0, wt0), (c[:-1], c[1:], a_mid, wl[1:-1]))
    else:
        betf = bet0
        gam_mid = jnp.zeros((0,) + wt0.shape, wt0.dtype)
        wt_mid = jnp.zeros((0,) + wt0.shape, wt0.dtype)

    gamK = c[-1] / betf
    dzK2 = dzl[-1] * dzl[-1]
    aK = cd / (0.5 * (dzl[-2] + dzl[-1]) * dzl[-1]) if K > 1 else 0.0
    wt_prev = wt_mid[-1] if K > 2 else wt0
    wK = ((wl[-1] + 2.0 * ws * cd / dzK2 + aK * wt_prev)
          / (1.0 + aK + 2.0 * cd / dzK2 + aK * gamK))

    gam_full = jnp.concatenate([gam_mid, gamK[None]], axis=0)  # gam(2..K)
    wt_full = jnp.concatenate([wt0[None], wt_mid], axis=0)     # wt(1..K-1)

    def bwd(carry, x):
        gamk1, wtk = x
        wk = wtk - gamk1 * carry
        return wk, wk

    _, w_b = jax.lax.scan(bwd, wK, (gam_full[::-1], wt_full[::-1]))
    w_new = jnp.concatenate([w_b[::-1], wK[None]], axis=0)
    return _kmid(w_new)


def riem_solver_c(dt2, delpc, ptc, w3, gz, phis_p, ws, akap, ptop, p_fac,
                  a_imp=1.0, ms=1):
    """C-stage semi-implicit solver (nh_utils.F90 Riem_Solver_C:323).

    delpc/ptc/w3 [6,K,Y,X] padded rim; gz height*grav interfaces (in m*g? --
    here gz in geopotential units m^2/s^2? No: heights in m (zh), converted
    to geopotential on output as the reference does). Returns (pef full
    pressure at interfaces, gz geopotential interfaces).
    """
    gama = 1.0 / (1.0 - akap)
    rgrav = 1.0 / con.GRAV

    pem = ptop + jnp.concatenate(
        [jnp.zeros_like(delpc[:, :1]), jnp.cumsum(delpc, axis=1)], axis=1)
    dz2 = gz[:, 1:] - gz[:, :-1]
    pm2 = delpc / (jnp.log(pem[:, 1:]) - jnp.log(pem[:, :-1]))
    dm = delpc * rgrav

    # C-stage dispatch (nh_utils.F90:450-460): a_imp < -0.01 -> SIM3p0;
    # -0.01 <= a_imp <= 0.5 -> explicit RIM_2D (c_core=.true., w frozen);
    # else SIM1
    if a_imp < -0.01:
        pe2, w2, dz2n = sim3_solver(dt2, dm, pem, w3, dz2, ptc, ws,
                                    gama, akap, p_fac)
    elif a_imp <= 0.5:
        pe2, _, dz2n = rim_2d_solver(ms, dt2, dm, pm2, w3, dz2, ptc, ws,
                                     gama, akap, c_core=True)
        w2 = w3
    else:
        from .pallas_nh import use_sim1_pallas, sim1_pallas
        if use_sim1_pallas(dm, 1.0):
            # whole column solve per (tile, y-strip) in VMEM
            pe2, w2, dz2n = sim1_pallas(dt2, dm, pm2, pem, w3, dz2, ptc,
                                        ws, gama, akap, p_fac)
        else:
            pe2, w2, dz2n = sim1_solver(dt2, dm, pm2, pem, w3, dz2, ptc,
                                        ws, gama, akap, p_fac)
    pef = pe2 + pem
    pef = pef.at[:, 0].set(jnp.full_like(pef[:, 0], ptop))

    # heights -> geopotential, rebuilt from the solved dz
    gz_bot = phis_p * rgrav
    incr = jnp.cumsum(dz2n[:, ::-1], axis=1)[:, ::-1]
    gz_new = jnp.concatenate([gz_bot[:, None] - incr,
                              gz_bot[:, None]], axis=1) * con.GRAV
    return pef, gz_new


def riem_solver3(dt, delp, pt, w, zh, zs, ws, akap, ptop, p_fac,
                 use_logp=False, a_imp=1.0, scale_m=0.0, d2bg_zq=0.0,
                 ms=1):
    """D-stage implicit solver (nh_core.F90 Riem_Solver3:47, dispatch
    :169-185): a_imp > 0.999 -> fully-implicit SIM1; 0.5 < a_imp <= 0.999
    -> off-centered SIM; |a_imp| <= 0.5 -> explicit RIM_2D with `ms`
    (m_split) substeps; a_imp < -0.999 -> SIM3p0; -0.999 <= a_imp < -0.5
    -> SIM3 (alpha = |a_imp|). d2bg_zq > 0 adds the post-solve implicit
    w-diffusion (imp_diff_w, nh_core.F90:188-190).

    delp/pt/w [6,K,Y,X] (padded or interior; shapes preserved); zh height
    interfaces [6,K+1,Y,X] (meters); zs surface height [6,Y,X]; ws [6,Y,X].
    Returns SimpleNamespace(w, delz, zh, ppe (nonhydro pert.), pem, peln2,
    pk3) -- pk3 = pe**kappa (or log p with use_logp).
    """
    gama = 1.0 / (1.0 - akap)
    rgrav = 1.0 / con.GRAV
    peln1 = np.log(ptop)
    ptk = np.exp(akap * peln1)

    pem = ptop + jnp.concatenate(
        [jnp.zeros_like(delp[:, :1]), jnp.cumsum(delp, axis=1)], axis=1)
    peln2 = jnp.log(pem)
    pk3 = jnp.exp(akap * peln2)
    pm2 = delp / (peln2[:, 1:] - peln2[:, :-1])
    dm = delp * rgrav
    dz2 = zh[:, 1:] - zh[:, :-1]

    if a_imp < -0.5:
        alpha = 1.0 if a_imp < -0.999 else float(abs(a_imp))
        pe2, w2, dz2n = sim3_solver(dt, dm, pem, w, dz2, pt, ws,
                                    gama, akap, p_fac, scale_m=scale_m,
                                    alpha=alpha)
    elif a_imp <= 0.5:
        pe2, w2, dz2n = rim_2d_solver(ms, dt, dm, pm2, w, dz2, pt, ws,
                                      gama, akap)
    else:
        alpha = 1.0 if a_imp > 0.999 else float(a_imp)
        from .pallas_nh import use_sim1_pallas, sim1_pallas
        if use_sim1_pallas(dm, alpha):
            pe2, w2, dz2n = sim1_pallas(dt, dm, pm2, pem, w, dz2, pt, ws,
                                        gama, akap, p_fac)
        else:
            pe2, w2, dz2n = sim1_solver(dt, dm, pm2, pem, w, dz2, pt, ws,
                                        gama, akap, p_fac, alpha=alpha)
    if d2bg_zq > 1.0e-4:
        w2 = imp_diff_w(d2bg_zq, dz2n, ws, w2)

    # rebuild zh from zs upward
    incr = jnp.cumsum(dz2n[:, ::-1], axis=1)[:, ::-1]
    zh_new = jnp.concatenate([zs[:, None] - incr, zs[:, None]], axis=1)

    if use_logp:
        pk3 = pk3.at[:, 1:].set(peln2[:, 1:])
    return SimpleNamespace(w=w2, delz=dz2n, zh=zh_new, ppe=pe2,
                           pem=pem, peln=peln2, pk3=pk3)


def update_dz_c(g, ut, vt, gz, zs, dp0, dt2, npx):
    """C-stage height advection (nh_utils.F90 update_dz_c:59).

    ut/vt: c_sw's dt2-scaled area fluxes [6,K,...]; gz heights [6,K+1,...]
    (padded, meters); zs padded surface height. First-order upwind per
    interface with dp0-weighted interface winds. Returns (gz_new, ws).
    """
    K = ut.shape[1]
    rdt = 1.0 / dt2
    d0 = dp0.reshape(1, K, 1, 1)
    top_r = dp0[0] / (dp0[0] + dp0[1])
    bot_r = dp0[K - 1] / (dp0[K - 2] + dp0[K - 1])

    def interface_wind(f3d):
        top = f3d[:, :1] + (f3d[:, :1] - f3d[:, 1:2]) * top_r
        bot = f3d[:, -1:] + (f3d[:, -1:] - f3d[:, -2:-1]) * bot_r
        mid = (d0[:, 1:] * f3d[:, :-1] + d0[:, :-1] * f3d[:, 1:]) / (
            d0[:, :-1] + d0[:, 1:])
        return jnp.concatenate([top, mid, bot], axis=1)     # [6, K+1, ...]

    xfx = interface_wind(ut)
    yfx = interface_wind(vt)

    from .sw_core import _cl, _cr, _rl, _rr
    edges = cube_edges(g)
    gx = fill_4corners_cell(gz, 1, npx) if edges else gz
    fx = xfx * jnp.where(xfx > 0.0, _cl(gx), _cr(gx))
    gy = fill_4corners_cell(gz, 2, npx) if edges else gz
    fy = yfx * jnp.where(yfx > 0.0, _rl(gy), _rr(gy))

    # ut/vt are full wall arrays [.., NC, NW] / [.., NW, NC]; valid on the
    # rim cells the C-stage needs (outermost padded cells are garbage)
    num = (gz * g.area + fx[..., :, :-1] - fx[..., :, 1:]
           + fy[..., :-1, :] - fy[..., 1:, :])
    den = (g.area + xfx[..., :, :-1] - xfx[..., :, 1:]
           + yfx[..., :-1, :] - yfx[..., 1:, :])
    gz_new = num / den

    ws = (zs - gz_new[:, -1]) * rdt
    # enforce monotonicity bottom-up: gz(k) >= gz(k+1) + dz_min
    gz_rev = gz_new[:, ::-1]                    # bottom first

    def mono(carry, row):
        row = jnp.maximum(row, carry + DZ_MIN)
        return row, row

    _, fixed = jax.lax.scan(mono, gz_rev[:, 0] - DZ_MIN,
                            jnp.moveaxis(gz_rev, 1, 0))
    gz_new = jnp.moveaxis(fixed, 0, 1)[:, ::-1]
    return gz_new, ws


@lru_cache(maxsize=8)
def _edge_profile_matrix(dp0_key):
    """Dense [K+1, K] interface-interpolation operator for the non-uniform
    edge_profile tridiagonal (nh_utils.F90:1638-1665): qe = E @ q. The
    system depends only on the reference dp0 profile, so it is solved once
    on the host and applied as a matmul (MXU-friendly)."""
    dp0 = np.asarray(dp0_key, np.float64)
    K = dp0.shape[0]
    A = np.zeros((K + 1, K + 1))
    B = np.zeros((K + 1, K))
    g0 = dp0[1] / dp0[0]
    A[0, 0] = g0 * (g0 + 0.5)
    A[0, 1] = -(1.0 + g0 * (g0 + 1.5))   # gam sign: qe1 + gam*qe2 moved LHS
    B[0, 0] = 2.0 * g0 * (g0 + 1.0)
    B[0, 1] = 1.0
    # interior rows k=2..K (1-based) : qe(k-1) + (2+2gk - ...) -- write the
    # original tridiagonal: qe(k-1)*1 + qe(k)*(2+2*gk) + qe(k+1)*gk = rhs
    for k in range(2, K + 1):
        gk = dp0[k - 2] / dp0[k - 1]
        A[k - 1, k - 2] = 1.0
        A[k - 1, k - 1] = 2.0 + 2.0 * gk
        A[k - 1, k] = gk
        B[k - 1, k - 2] = 3.0
        B[k - 1, k - 1] = 3.0 * gk
    gk = dp0[K - 2] / dp0[K - 1]
    a_bot = 1.0 + gk * (gk + 1.5)
    A[K, K - 1] = a_bot
    A[K, K] = gk * (gk + 0.5)
    B[K, K - 1] = 2.0 * gk * (gk + 1.0)
    B[K, K - 2] = 1.0
    E = np.linalg.solve(A, B)
    return E


def edge_profile(q, dp0):
    """Interface profile of a layer field along axis 1 via the precomputed
    operator; q [6, K, ...] -> [6, K+1, ...]."""
    E = _edge_profile_matrix(tuple(np.asarray(dp0).tolist()))
    Ej = jnp.asarray(E, q.dtype)
    return jnp.einsum("lk,tk...->tl...", Ej, q)


def update_dz_d(g, zh, crx, cry, xfx, yfx, zs, dp0, dt, hord, npx,
                damp, ndif, lim_fac=1.0):
    """D-stage height advection (nh_utils.F90 update_dz_d:204).

    zh [6,K+1,NC,NC] padded heights; crx/xfx [6,K,NC,NW], cry/yfx
    [6,K,NW,NC] layer Courant/area fluxes from d_sw; damp/ndif: del-n
    damping strength/order per level group (scalars here -- the caller
    splits groups). Returns (zh_new interior [6,K+1,n,n], ws [6,n,n]).
    """
    n = g.n
    ctr = slice(H, H + n)
    rdt = 1.0 / dt

    crx_a = edge_profile(crx, dp0)
    xfx_a = edge_profile(xfx, dp0)
    cry_a = edge_profile(cry, dp0)
    yfx_a = edge_profile(yfx, dp0)

    ra_x = g.area + xfx_a[..., :, :-1] - xfx_a[..., :, 1:]
    ra_y = g.area + yfx_a[..., :-1, :] - yfx_a[..., 1:, :]

    edges = cube_edges(g)
    fx, fy = fv_tp_2d(zh, crx_a, cry_a, hord, xfx_a, yfx_a, g.area,
                      ra_x, ra_y, g.dxa, g.dya, lim_fac=lim_fac,
                      edges=edges)
    num = (zh[..., ctr, ctr] * g.area[..., ctr, ctr]
           + fx[..., :, :-1] - fx[..., :, 1:]
           + fy[..., :-1, :] - fy[..., 1:, :])
    den = (ra_x[..., ctr, ctr] + ra_y[..., ctr, ctr] - g.area[..., ctr, ctr])
    zh_new = num / den

    if damp > 1.0e-5:
        # NOTE: the reference passes the RAW damp_vt coefficient to
        # del6_vt_flux here (update_dz_d -> del6_vt_flux, d2 = damp*q) --
        # unlike d_sw's (damp*da_min)**(nord+1) exponentiation
        fx2, fy2 = deln_damp_fluxes(zh, ndif, g, prefac=damp, edges=edges)
        wsl = slice(H, H + n + 1)
        zh_new = zh_new + (fx2[..., ctr, wsl][..., :, :-1]
                           - fx2[..., ctr, wsl][..., :, 1:]
                           + fy2[..., wsl, ctr][..., :-1, :]
                           - fy2[..., wsl, ctr][..., 1:, :]
                           ) * g.rarea[..., ctr, ctr]

    ws = (zs - zh_new[:, -1]) * rdt
    zh_rev = zh_new[:, ::-1]

    def mono(carry, row):
        row = jnp.maximum(row, carry + DZ_MIN)
        return row, row

    _, fixed = jax.lax.scan(mono, zh_rev[:, 0] - DZ_MIN,
                            jnp.moveaxis(zh_rev, 1, 0))
    zh_new = jnp.moveaxis(fixed, 0, 1)[:, ::-1]
    return zh_new, ws
