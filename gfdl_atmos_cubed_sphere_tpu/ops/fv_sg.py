"""Negative-water adjustment + column fillers (component #16 part).

Re-implements /root/reference/model/fv_sg.F90 neg_adj3:968 (6-category
negative-moisture fixer with energy-conserving phase borrowing), fillq:1337
(aggressive column filler for rain/graupel), and the water-vapor column
borrow (:1240-1286), as batched column ops with lax.scan along k.

Level axis is axis 1 ([6, K, y, x]); all scans move it to front.
"""

import jax
import jax.numpy as jnp

from .. import constants as con

CV_AIR = con.CP_AIR - con.RDGAS
ZVIR = con.RVGAS / con.RDGAS - 1.0


def _phase_fix(pt, qv, ql, qr, qi, qs, qg, lcpk, icpk):
    """Pointwise phase fixes (fv_sg.F90:1055-1150)."""
    # ---- ice phase -------------------------------------------------------
    qsum = qi + qs
    pos = qsum > 0.0
    qi_n = jnp.where(pos, jnp.where(qi < 0.0, 0.0,
                                    jnp.where(qs < 0.0, qsum, qi)), 0.0)
    qs_n = jnp.where(pos, jnp.where(qi < 0.0, qsum,
                                    jnp.where(qs < 0.0, 0.0, qs)), 0.0)
    qg_n = jnp.where(pos, qg, qg + qsum)
    qi, qs, qg = qi_n, qs_n, qg_n

    # graupel < 0: borrow from qs then qi
    dq = jnp.minimum(qs, -qg)
    take = qg < 0.0
    qs = jnp.where(take, qs - dq, qs)
    qg = jnp.where(take, qg + dq, qg)
    dq = jnp.minimum(qi, -qg)
    take = qg < 0.0
    qi = jnp.where(take, qi - dq, qi)
    qg = jnp.where(take, qg + dq, qg)
    # from rain (phase change, heating)
    take = (qg < 0.0) & (qr > 0.0)
    dq = jnp.where(take, jnp.minimum(qr, -qg), 0.0)
    qg = qg + dq
    qr = qr - dq
    pt = pt + dq * icpk
    # from cloud water
    take = (qg < 0.0) & (ql > 0.0)
    dq = jnp.where(take, jnp.minimum(ql, -qg), 0.0)
    qg = qg + dq
    ql = ql - dq
    pt = pt + dq * icpk
    # last resort: vapor
    take = (qg < 0.0) & (qv > 0.0)
    dq = jnp.where(take, jnp.minimum(0.999 * qv, -qg), 0.0)
    qg = qg + dq
    qv = qv - dq
    pt = pt + dq * (icpk + lcpk)

    # ---- liquid phase ----------------------------------------------------
    qsum = ql + qr
    pos = qsum > 0.0
    ql_n = jnp.where(pos, jnp.where(qr < 0.0, qsum,
                                    jnp.where(ql < 0.0, 0.0, ql)), 0.0)
    qr_n = jnp.where(pos, jnp.where(qr < 0.0, 0.0,
                                    jnp.where(ql < 0.0, qsum, qr)), qsum)
    ql, qr = ql_n, qr_n
    neg = qr < 0.0
    # fill negative rain from graupel (cooling)
    dq = jnp.where(neg, jnp.minimum(jnp.maximum(0.0, qg), -qr), 0.0)
    qr = qr + dq
    qg = qg - dq
    pt = pt - dq * icpk
    # from ice+snow (cooling)
    neg = qr < 0.0
    dq = jnp.where(neg, jnp.minimum(qi + qs, -qr), 0.0)
    qr = qr + dq
    dq1 = jnp.minimum(dq, qs)
    qs = qs - dq1
    qi = qi + dq1 - dq
    pt = pt - dq * icpk
    # from vapor (heating)
    neg = (qr < 0.0) & (qv > 0.0)
    dq = jnp.where(neg, jnp.minimum(0.999 * qv, -qr), 0.0)
    qv = qv - dq
    qr = qr + dq
    pt = pt + dq * lcpk
    return pt, qv, ql, qr, qi, qs, qg


def fillq(q, dp):
    """Aggressive column filler (fv_sg.F90 fillq:1337): fill negatives
    bottom-up from the column's positive reservoir, then remove the borrowed
    mass from positive layers bottom-up. q, dp: [6, K, y, x]."""
    qk = jnp.moveaxis(q, 1, 0)
    dpk = jnp.moveaxis(dp, 1, 0)
    sum1 = jnp.sum(jnp.maximum(qk, 0.0) * dpk, axis=0)
    active = sum1 >= 1.0e-12

    def fill(carry, x):
        s1, s2 = carry
        qq, dd = x
        need = (qq < 0.0) & (s1 > 0.0) & active
        dq = jnp.where(need, jnp.minimum(s1, -qq * dd), 0.0)
        return (s1 - dq, s2 + dq), qq + dq / dd

    # unroll=8 on all column sweeps: loop-overhead reduction, same ops
    (s1, s2), q_f = jax.lax.scan(fill, (sum1, jnp.zeros_like(sum1)),
                                 (qk[::-1], dpk[::-1]), unroll=8)

    def drain(s2, x):
        qq, dd = x
        can = (qq > 0.0) & (s2 > 0.0) & active
        dq = jnp.where(can, jnp.minimum(s2, qq * dd), 0.0)
        return s2 - dq, qq - dq / dd

    _, q_d = jax.lax.scan(drain, s2, (q_f, dpk[::-1]), unroll=8)
    return jnp.moveaxis(q_d[::-1], 0, 1)


def _fix_vapor_column(qv, dp):
    """Water-vapor column borrow (fv_sg.F90:1240-1286): push negatives down
    (borrowing from the layer above when possible), then fill a negative
    bottom layer from above."""
    qk = jnp.moveaxis(qv, 1, 0)
    dpk = jnp.moveaxis(dp, 1, 0)
    K = qk.shape[0]

    def down(carry, x):
        q_prev, push_mass, dp_prev = carry
        qq, dd = x
        q_eff = qq + push_mass / dd
        can = (q_eff < 0.0) & (q_prev > 0.0)
        dq = jnp.where(can, jnp.minimum(-q_eff * dd, q_prev * dp_prev), 0.0)
        q_prev = q_prev - dq / dp_prev
        q_eff = q_eff + dq / dd
        still = q_eff < 0.0
        push = jnp.where(still, q_eff * dd, 0.0)
        q_eff = jnp.where(still, 0.0, q_eff)
        return (q_eff, push, dd), q_prev

    # rows 0..K-2 finalized through the scan; bottom handled after
    init = (qk[0], jnp.zeros_like(qk[0]), dpk[0])
    (q_last, push, _), upper = jax.lax.scan(down, init, (qk[1:], dpk[1:]),
                                            unroll=8)
    # q_last is row K-1 pre-bottom-fix (it absorbed any pushed mass);
    # note: the reference does NOT zero a still-negative bottom; it borrows
    # from above (upward sweep)
    qbot = q_last + 0.0

    def up(carry, x):
        deficit = carry          # negative mass still needed at bottom (>0)
        qq, dd = x
        can = (deficit > 0.0) & (qq > 0.0)
        dq = jnp.where(can, jnp.minimum(deficit, qq * dd), 0.0)
        return deficit - dq, qq - dq / dd

    deficit0 = jnp.maximum(0.0, -qbot * dpk[-1])
    deficit, upper_fixed = jax.lax.scan(up, deficit0,
                                        (upper[::-1], dpk[:-1][::-1]),
                                        unroll=8)
    qbot = qbot + (deficit0 - deficit) / dpk[-1]
    qk_new = jnp.concatenate([upper_fixed[::-1], qbot[None]], axis=0)
    return jnp.moveaxis(qk_new, 0, 1)


def neg_adj3(pt, delp, q, peln=None, delz=None, hydrostatic=True):
    """Negative-moisture adjustment (fv_sg.F90 neg_adj3:968).

    pt: TEMPERATURE [6,K,y,x]; q: dict with the 6-category names (sphum,
    liq_wat, rainwat, ice_wat, snowwat, graupel; optional cld_amt).
    Returns (pt, q) adjusted; missing categories are treated as zero and
    returned unchanged."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(pt)
    qv, ql, qr, qi, qs, qg = (q.get(k, z) for k in names)

    if hydrostatic:
        lcpk = con.HLV / con.CP_AIR
        icpk = con.HLF / con.CP_AIR
    else:
        q_liq = jnp.maximum(0.0, ql + qr)
        q_sol = jnp.maximum(0.0, qi + qs)
        cpm = ((1.0 - (qv + q_liq + q_sol)) * CV_AIR + qv * con.CP_VAPOR
               + q_liq * con.C_LIQ + q_sol * con.C_ICE)
        lcpk = con.HLV / cpm
        icpk = con.HLF / cpm

    pt, qv, ql, qr, qi, qs, qg = _phase_fix(pt, qv, ql, qr, qi, qs, qg,
                                            lcpk, icpk)
    qg = fillq(qg, delp)
    qr = fillq(qr, delp)
    qv = _fix_vapor_column(qv, delp)

    out = dict(q)
    for k, v in zip(names, (qv, ql, qr, qi, qs, qg)):
        if k in q:
            out[k] = v
    if "cld_amt" in q:
        out["cld_amt"] = jnp.maximum(q["cld_amt"], 0.0)
    return pt, out


# ===========================================================================
# fv_sg_SHiELD (fv_sg.F90:76): 2-delta-z dry/moist convective adjustment
# ===========================================================================

RI_MAX = 1.0
RI_MIN = 0.25
USTAR2 = 1.0e-4
T2_MAX = 315.0
T2_MIN = 165.0


def fv_sg_adjust(dt, fv_sg_adj, delp, pe, peln, pkz, ta, q, ua, va,
                 hydrostatic=True, w=None, delz=None, m=3):
    """Dry/moist 2-dz instability adjustment (fv_sg_SHiELD, fv_sg.F90:76).

    Column-batched: all fields [6, K, y, x]; pe/peln interfaces
    [6, K+1, y, x]. ta: temperature; q: tracer dict (sphum + condensates
    optional); ua/va: A-grid winds. Returns (ta, q, ua, va, w, u_dt, v_dt).

    The reference's sequential bottom-up interface sweep is kept as a
    static python k-loop inside jit (it runs once per physics step)."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(ta)
    K = ta.shape[1]
    rdt = 1.0 / dt
    fra = dt / float(fv_sg_adj)
    xvir = ZVIR
    rk = con.CP_AIR / con.RDGAS + 1.0

    q0 = {k: v for k, v in q.items()}
    qv = q0.get("sphum", z)
    t0 = ta
    u0, v0 = ua, va
    w0 = w if w is not None else z
    pm = delp / (peln[:, 1:] - peln[:, :-1])

    def cp_cv(q0):
        qvv = q0.get("sphum", z)
        q_liq = q0.get("liq_wat", z) + q0.get("rainwat", z)
        q_sol = (q0.get("ice_wat", z) + q0.get("snowwat", z)
                 + q0.get("graupel", z))
        cpm = ((1.0 - (qvv + q_liq + q_sol)) * con.CP_AIR
               + qvv * con.CP_VAPOR + q_liq * con.C_LIQ + q_sol * con.C_ICE)
        cvm = ((1.0 - (qvv + q_liq + q_sol)) * CV_AIR
               + qvv * con.CV_VAP + q_liq * con.C_LIQ + q_sol * con.C_ICE)
        return cpm, cvm

    def qcon_of(q0):
        return (q0.get("liq_wat", z) + q0.get("ice_wat", z)
                + q0.get("snowwat", z) + q0.get("rainwat", z)
                + q0.get("graupel", z))

    def energies(t0, u0, v0, w0, q0):
        """gz, hd (and te for NH) columns (fv_sg.F90:200-260)."""
        tvm = t0 * (1.0 + xvir * q0.get("sphum", z))
        if hydrostatic:
            tvr = con.RDGAS * tvm
            dgz = tvr * (peln[:, 1:] - peln[:, :-1])
            gzh = jnp.concatenate(
                [jnp.cumsum(dgz[:, ::-1], 1)[:, ::-1][:, 1:],
                 jnp.zeros_like(dgz[:, :1])], axis=1)
            gz = gzh + tvr * (1.0 - pe[:, :-1] / pm)
            hd = con.CP_AIR * tvm + gz + 0.5 * (u0 ** 2 + v0 ** 2)
            return gz, hd, None
        cpm, cvm = cp_cv(q0)
        dgz2 = -con.GRAV * delz
        gzh = jnp.concatenate(
            [jnp.cumsum(dgz2[:, ::-1], 1)[:, ::-1][:, 1:],
             jnp.zeros_like(dgz2[:, :1])], axis=1)
        gz = gzh - 0.5 * con.GRAV * delz
        ke = 0.5 * (u0 ** 2 + v0 ** 2 + w0 ** 2)
        hd = cpm * t0 + gz + ke
        te = cvm * t0 + gz + ke
        return gz, hd, te

    gz, hd, te = energies(t0, u0, v0, w0, q0)

    for n in range(m):
        ratio = (0.25, 0.5, 0.999)[n] if m == 3 else (n + 1.0) / m
        qcon = qcon_of(q0)
        for k in range(K - 1, 0, -1):
            km1 = k - 1
            sl1 = (slice(None), km1)
            sl2 = (slice(None), k)
            tv1 = t0[sl1] * (1.0 + xvir * q0.get("sphum", z)[sl1]
                             - qcon[sl1])
            tv2 = t0[sl2] * (1.0 + xvir * q0.get("sphum", z)[sl2]
                             - qcon[sl2])
            pt1 = tv1 / pkz[sl1]
            pt2 = tv2 / pkz[sl2]
            ri = ((gz[sl1] - gz[sl2]) * (pt1 - pt2)
                  / (0.5 * (pt1 + pt2)
                     * ((u0[sl1] - u0[sl2]) ** 2
                        + (v0[sl1] - v0[sl2]) ** 2 + USTAR2)))
            ri = jnp.where((tv1 > T2_MAX) & (tv1 > tv2), 0.0, ri)
            ri = jnp.where(tv2 < T2_MIN, jnp.minimum(ri, 0.1), ri)
            ri_ref = jnp.minimum(
                RI_MAX, RI_MIN + (RI_MAX - RI_MIN)
                * jnp.maximum(0.0, 400.0e2 - pm[sl2]) / 200.0e2)
            boost = {1: 4.0, 2: 2.0, 3: 1.5}.get(k, 1.0)
            ri_ref = ri_ref * boost
            mix = ri < ri_ref
            mc = jnp.where(
                mix,
                ratio * delp[sl1] * delp[sl2] / (delp[sl1] + delp[sl2])
                * (1.0 - jnp.maximum(0.0, ri / ri_ref)) ** 2, 0.0)

            def swap(a):
                h0 = mc * (a[sl2] - a[sl1])
                a = a.at[sl1].add(h0 / delp[sl1])
                a = a.at[sl2].add(-h0 / delp[sl2])
                return a

            for nm_ in list(q0.keys()):
                q0[nm_] = swap(q0[nm_])
            qcon = qcon_of(q0)
            u0 = swap(u0)
            v0 = swap(v0)
            if hydrostatic:
                hd = swap(hd)
                # retrieve T on the two touched layers (fv_sg.F90:392-404);
                # simplification: invert hd = cp*Tv + gz + ke with the
                # initial gz instead of the reference's running gzh update
                t0 = t0.at[sl2].set(
                    (hd[sl2] - gz[sl2]
                     - 0.5 * (u0[sl2] ** 2 + v0[sl2] ** 2))
                    / (con.CP_AIR
                       * (1.0 + xvir * q0.get("sphum", z)[sl2])))
                t0 = t0.at[sl1].set(
                    (hd[sl1] - gz[sl1]
                     - 0.5 * (u0[sl1] ** 2 + v0[sl1] ** 2))
                    / (con.CP_AIR
                       * (1.0 + xvir * q0.get("sphum", z)[sl1])))
            else:
                te = swap(te)
                w0 = swap(w0)
                cpm, cvm = cp_cv(q0)
                for sl in (sl1, sl2):
                    kin = gz[sl] + 0.5 * (u0[sl] ** 2 + v0[sl] ** 2
                                          + w0[sl] ** 2)
                    t0 = t0.at[sl].set((te[sl] - kin) / cvm[sl])

    # fra relaxation toward the adjusted state (fv_sg.F90:458-505)
    ta_new = ta + (t0 - ta) * fra
    ua_new = ua + (u0 - ua) * fra
    va_new = va + (v0 - va) * fra
    q_new = {k: q[k] + (q0[k] - q[k]) * fra for k in q}
    w_new = None if w is None else w + (w0 - w) * fra
    u_dt = rdt * (ua_new - ua)
    v_dt = rdt * (va_new - va)
    return ta_new, q_new, ua_new, va_new, w_new, u_dt, v_dt


def fv_sg_adjust_am5(dt, tau, delp, pe, peln, pkz, ta, q, ua, va,
                     hydrostatic=True, w=None, delz=None, m=3, k_bot=None):
    """AM5 dry-convective 2-dz adjustment (fv_sg_AM5, fv_sg.F90:507).

    Differences from the SHiELD variant (fv_sg_adjust / fv_sg.F90:76):
      * ri_ref ramp anchored at 500 hPa over a 250 hPa range
        (fv_sg.F90:742) with NO near-top ri_ref boosts and no
        t2_max/t2_min guards on the Richardson number;
      * hydrostatic temperature retrieval is the exact running-gzh
        inversion tv = (hd - gzh - ke)/(rk - pe/pm); gzh += tv*dlnp;
        T = tv/(Rd + (Rv-Rd) qv)  (fv_sg.F90:800-812);
      * the nonhydrostatic total-energy exchange transports the
        STATIC-energy difference (h0 = mc*(hd(k)-hd(k-1)) applied to te,
        fv_sg.F90:786-789) and refreshes hd after each retrieval;
      * optional k_bot limits mixing to the levels above it (returns
        unchanged when k_bot < 3, fv_sg.F90:557-562).

    Same calling convention as fv_sg_adjust; `tau` is the relaxation
    timescale (the reference's integer `tau`). The sat_adj tail is
    compiled out in the reference (sat_adj=.false., fv_sg.F90:545) and
    omitted here."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(ta)
    K = ta.shape[1]
    kbot = K if k_bot is None else int(k_bot)
    if kbot < 3:
        return ta, q, ua, va, w, jnp.zeros_like(ua), jnp.zeros_like(va)
    rdt = 1.0 / dt
    fra = dt / float(tau)
    xvir = ZVIR
    rz = con.RVGAS - con.RDGAS
    rk = con.CP_AIR / con.RDGAS + 1.0

    q0 = {k: v for k, v in q.items()}
    t0 = ta
    u0, v0 = ua, va
    w0 = w if w is not None else z
    pm = delp / (peln[:, 1:] - peln[:, :-1])

    def cp_cv(q0):
        qvv = q0.get("sphum", z)
        q_liq = q0.get("liq_wat", z) + q0.get("rainwat", z)
        q_sol = (q0.get("ice_wat", z) + q0.get("snowwat", z)
                 + q0.get("graupel", z))
        cpm = ((1.0 - (qvv + q_liq + q_sol)) * con.CP_AIR
               + qvv * con.CP_VAPOR + q_liq * con.C_LIQ + q_sol * con.C_ICE)
        cvm = ((1.0 - (qvv + q_liq + q_sol)) * CV_AIR
               + qvv * con.CV_VAP + q_liq * con.C_LIQ + q_sol * con.C_ICE)
        return cpm, cvm

    def qcon_of(q0):
        return (q0.get("liq_wat", z) + q0.get("ice_wat", z)
                + q0.get("snowwat", z) + q0.get("rainwat", z)
                + q0.get("graupel", z))

    # initial gz/hd (and te for NH) columns — identical to the SHiELD
    # setup sweep (fv_sg.F90:616-677)
    tvm = t0 * (1.0 + xvir * q0.get("sphum", z))
    if hydrostatic:
        tvr = con.RDGAS * tvm
        dgz = tvr * (peln[:, 1:] - peln[:, :-1])
        gzh0 = jnp.concatenate(
            [jnp.cumsum(dgz[:, ::-1], 1)[:, ::-1][:, 1:],
             jnp.zeros_like(dgz[:, :1])], axis=1)
        gz = gzh0 + tvr * (1.0 - pe[:, :-1] / pm)
        hd = con.CP_AIR * tvm + gz + 0.5 * (u0 ** 2 + v0 ** 2)
        te = None
    else:
        cpm, cvm = cp_cv(q0)
        dgz2 = -con.GRAV * delz
        gzh0 = jnp.concatenate(
            [jnp.cumsum(dgz2[:, ::-1], 1)[:, ::-1][:, 1:],
             jnp.zeros_like(dgz2[:, :1])], axis=1)
        gz = gzh0 - 0.5 * con.GRAV * delz
        ke = 0.5 * (u0 ** 2 + v0 ** 2 + w0 ** 2)
        hd = cpm * t0 + gz + ke
        te = cvm * t0 + gz + ke

    qv_key = "sphum"
    for n in range(m):
        ratio = (0.25, 0.5, 0.999)[n] if m == 3 else (n + 1.0) / m
        qcon = qcon_of(q0)
        gzh = jnp.zeros_like(t0[:, 0])
        for k in range(kbot - 1, 0, -1):
            km1 = k - 1
            sl1 = (slice(None), km1)
            sl2 = (slice(None), k)
            qv0 = q0.get(qv_key, z)
            tv1 = t0[sl1] * (1.0 + xvir * qv0[sl1] - qcon[sl1])
            tv2 = t0[sl2] * (1.0 + xvir * qv0[sl2] - qcon[sl2])
            pt1 = tv1 / pkz[sl1]
            pt2 = tv2 / pkz[sl2]
            ri = ((gz[sl1] - gz[sl2]) * (pt1 - pt2)
                  / (0.5 * (pt1 + pt2)
                     * ((u0[sl1] - u0[sl2]) ** 2
                        + (v0[sl1] - v0[sl2]) ** 2 + USTAR2)))
            # AM5 ramp: 500 hPa anchor / 250 hPa range, no boosts
            ri_ref = jnp.minimum(
                RI_MAX, RI_MIN + (RI_MAX - RI_MIN)
                * jnp.maximum(0.0, 500.0e2 - pm[sl2]) / 250.0e2)
            mix = ri < ri_ref
            mc = jnp.where(
                mix,
                ratio * delp[sl1] * delp[sl2] / (delp[sl1] + delp[sl2])
                * (1.0 - jnp.maximum(0.0, ri / ri_ref)) ** 2, 0.0)

            def swap(a):
                h0 = mc * (a[sl2] - a[sl1])
                a = a.at[sl1].add(h0 / delp[sl1])
                a = a.at[sl2].add(-h0 / delp[sl2])
                return a

            for nm_ in list(q0.keys()):
                q0[nm_] = swap(q0[nm_])
            qcon = qcon_of(q0)
            u0 = swap(u0)
            v0 = swap(v0)
            if hydrostatic:
                hd = swap(hd)
                qv0 = q0.get(qv_key, z)
                # exact inversion, lower layer first (fv_sg.F90:800-812):
                # tv = Rd*Tvm from hd; gzh accumulates upward
                tv_k = ((hd[sl2] - gzh
                         - 0.5 * (u0[sl2] ** 2 + v0[sl2] ** 2))
                        / (rk - pe[:, k] / pm[sl2]))
                gzh = gzh + tv_k * (peln[:, k + 1] - peln[:, k])
                t0 = t0.at[sl2].set(tv_k / (con.RDGAS + rz * qv0[sl2]))
                t0 = t0.at[sl1].set(
                    (hd[sl1] - gzh
                     - 0.5 * (u0[sl1] ** 2 + v0[sl1] ** 2))
                    / ((rk - pe[:, km1] / pm[sl1])
                       * (con.RDGAS + rz * qv0[sl1])))
            else:
                # transport the static-energy difference into te
                # (fv_sg.F90:786-789), then w; retrieve T at constant
                # volume and refresh hd
                h0 = mc * (hd[sl2] - hd[sl1])
                te = te.at[sl1].add(h0 / delp[sl1])
                te = te.at[sl2].add(-h0 / delp[sl2])
                w0 = swap(w0)
                cpm, cvm = cp_cv(q0)
                for sl in (sl1, sl2):
                    kin = gz[sl] + 0.5 * (u0[sl] ** 2 + v0[sl] ** 2
                                          + w0[sl] ** 2)
                    t_new = (te[sl] - kin) / cvm[sl]
                    t0 = t0.at[sl].set(t_new)
                    hd = hd.at[sl].set(cpm[sl] * t_new + kin)

    # fra relaxation toward the adjusted state (fv_sg.F90:866-893)
    ta_new = ta + (t0 - ta) * fra
    ua_new = ua + (u0 - ua) * fra
    va_new = va + (v0 - va) * fra
    q_new = {k: q[k] + (q0[k] - q[k]) * fra for k in q}
    w_new = None if w is None else w + (w0 - w) * fra
    u_dt = rdt * (ua_new - ua)
    v_dt = rdt * (va_new - va)
    return ta_new, q_new, ua_new, va_new, w_new, u_dt, v_dt
