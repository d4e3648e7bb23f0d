"""Loop-literal NumPy oracle for the SIM1 implicit Riemann solver.

Transcribed statement-for-statement from
/root/reference/model/nh_utils.F90 SIM1_solver:1277-1396 (adiabatic path:
gm2 = gama, cp2 = kappa scalars, fast_tau_w_sec = 0). Deliberately slow
scalar code whose only job is to pin the vectorized JAX solver
(gfdl_atmos_cubed_sphere_tpu.ops.nh_core.sim1_solver) at 1e-12 f64."""
import numpy as np

R3 = 1.0 / 3.0


def sim1_solver_ref(dt, rgas, gama, kappa, dm2, pm2, pem, w2_in, dz2_in,
                    pt2, ws, p_fac):
    """dm2/pm2/pt2: [ni, km]; pem: [ni, km+1]; ws: [ni].
    Returns (pe [ni, km+1], w2, dz2)."""
    ni, km = dm2.shape
    pe = np.zeros((ni, km + 1))
    pp = np.zeros((ni, km + 1))
    aa = np.zeros((ni, km))
    bb = np.zeros((ni, km))
    dd = np.zeros((ni, km))
    w1 = np.zeros((ni, km))
    g_rat = np.zeros((ni, km))
    gam = np.zeros((ni, km))
    p1 = np.zeros(ni)
    bet = np.zeros(ni)
    w2 = w2_in.copy()
    dz2 = dz2_in.copy()
    pec = np.zeros((ni, km))          # cell-mean perturbation (pe(i,k) rows)

    t1g = 2.0 * dt * dt
    rdt = 1.0 / dt
    capa1 = kappa - 1.0

    for k in range(km):
        for i in range(ni):
            pec[i, k] = np.exp(gama * np.log(
                -dm2[i, k] / dz2[i, k] * rgas * pt2[i, k])) - pm2[i, k]
            w1[i, k] = w2[i, k]

    for k in range(km - 1):
        for i in range(ni):
            g_rat[i, k] = dm2[i, k] / dm2[i, k + 1]
            bb[i, k] = 2.0 * (1.0 + g_rat[i, k])
            dd[i, k] = 3.0 * (pec[i, k] + g_rat[i, k] * pec[i, k + 1])

    for i in range(ni):
        bet[i] = bb[i, 0]
        pp[i, 0] = 0.0
        pp[i, 1] = dd[i, 0] / bet[i]
        bb[i, km - 1] = 2.0
        dd[i, km - 1] = 3.0 * pec[i, km - 1]

    for k in range(1, km):
        for i in range(ni):
            gam[i, k] = g_rat[i, k - 1] / bet[i]
            bet[i] = bb[i, k] - gam[i, k]
            pp[i, k + 1] = (dd[i, k] - pp[i, k]) / bet[i]

    for k in range(km - 1, 0, -1):
        for i in range(ni):
            pp[i, k] = pp[i, k] - gam[i, k] * pp[i, k + 1]

    # w solver
    for k in range(1, km):
        for i in range(ni):
            aa[i, k] = (t1g * 0.5 * (gama + gama)
                        / (dz2[i, k - 1] + dz2[i, k]) * pem[i, k])
    for i in range(ni):
        bet[i] = dm2[i, 0] - aa[i, 1]
        w2[i, 0] = (dm2[i, 0] * w1[i, 0] + dt * pp[i, 1]) / bet[i]
    for k in range(1, km - 1):
        for i in range(ni):
            gam[i, k] = aa[i, k] / bet[i]
            bet[i] = dm2[i, k] - (aa[i, k] + aa[i, k + 1]
                                  + aa[i, k] * gam[i, k])
            w2[i, k] = (dm2[i, k] * w1[i, k]
                        + dt * (pp[i, k + 1] - pp[i, k])
                        - aa[i, k] * w2[i, k - 1]) / bet[i]
    for i in range(ni):
        p1[i] = t1g * gama / dz2[i, km - 1] * pem[i, km]
        gam[i, km - 1] = aa[i, km - 1] / bet[i]
        bet[i] = dm2[i, km - 1] - (aa[i, km - 1] + p1[i]
                                   + aa[i, km - 1] * gam[i, km - 1])
        w2[i, km - 1] = (dm2[i, km - 1] * w1[i, km - 1]
                         + dt * (pp[i, km] - pp[i, km - 1])
                         - p1[i] * ws[i]
                         - aa[i, km - 1] * w2[i, km - 2]) / bet[i]
    for k in range(km - 2, -1, -1):
        for i in range(ni):
            w2[i, k] = w2[i, k] - gam[i, k + 1] * w2[i, k + 1]

    for i in range(ni):
        pe[i, 0] = 0.0
    for k in range(km):
        for i in range(ni):
            pe[i, k + 1] = pe[i, k] + dm2[i, k] * (w2[i, k] - w1[i, k]) * rdt

    for i in range(ni):
        p1[i] = (pe[i, km - 1] + 2.0 * pe[i, km]) * R3
        dz2[i, km - 1] = -dm2[i, km - 1] * rgas * pt2[i, km - 1] * np.exp(
            capa1 * np.log(max(p_fac * pm2[i, km - 1],
                               p1[i] + pm2[i, km - 1])))

    for k in range(km - 2, -1, -1):
        for i in range(ni):
            p1[i] = ((pe[i, k] + bb[i, k] * pe[i, k + 1]
                      + g_rat[i, k] * pe[i, k + 2]) * R3
                     - g_rat[i, k] * p1[i])
            dz2[i, k] = -dm2[i, k] * rgas * pt2[i, k] * np.exp(
                capa1 * np.log(max(p_fac * pm2[i, k], p1[i] + pm2[i, k])))

    return pe, w2, dz2
