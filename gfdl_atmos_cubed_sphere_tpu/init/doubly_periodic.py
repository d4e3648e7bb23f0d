"""Doubly-periodic idealized initializations (component #23, the
init_double_periodic family of tools/test_cases.F90:195/4688+: supercell,
warm bubble). The reference reads a GFS skew-T sounding; here the standard
Weisman-Klemp (1982) analytic sounding plays that role.
"""

import numpy as np

from .. import constants as con


def weisman_klemp_sounding(K, ztop=20.0e3, theta0=300.0, theta_tr=343.0,
                           t_tr=213.0, z_tr=12.0e3, qv0=0.014, ps=1.0e5):
    """Uniform-z column: returns dict(z_mid, delz, pt (T), delp, sphum)
    profiles (1-D, top-to-bottom order like the model's k axis)."""
    dz = ztop / K
    z_mid = ztop - dz * (np.arange(K) + 0.5)        # k=0 at top
    # potential temperature profile (WK82 eq. 1)
    theta = np.where(
        z_mid <= z_tr,
        theta0 + (theta_tr - theta0) * (z_mid / z_tr) ** 1.25,
        theta_tr * np.exp(con.GRAV / (con.CP_AIR * t_tr) * (z_mid - z_tr)))
    # relative humidity profile (WK82 eq. 2), converted after T known
    rh = np.where(z_mid <= z_tr, 1.0 - 0.75 * (z_mid / z_tr) ** 1.25, 0.25)

    # integrate hydrostatic Exner function upward from the surface
    pi_sfc = (ps / 1.0e5) ** con.KAPPA
    zedge = ztop - dz * np.arange(K + 1)            # interfaces, k=0 top
    pi_edge = np.empty(K + 1)
    pi_edge[-1] = pi_sfc
    for k in range(K - 1, -1, -1):                  # integrate upward
        pi_edge[k] = pi_edge[k + 1] - con.GRAV * dz / (con.CP_AIR * theta[k])
    p_edge = 1.0e5 * pi_edge ** (1.0 / con.KAPPA)
    delp = p_edge[1:] - p_edge[:-1]
    p_mid = 0.5 * (p_edge[1:] + p_edge[:-1])
    t_mid = theta * (p_mid / 1.0e5) ** con.KAPPA

    # saturation mixing ratio (Tetens) -> qv with the WK cap
    es = 611.2 * np.exp(17.67 * (t_mid - 273.15) / (t_mid - 29.65))
    qs = 0.622 * es / np.maximum(p_mid - es, 1.0)
    qv = np.minimum(qv0, rh * qs)
    return dict(z_mid=z_mid, delz=np.full(K, -dz), pt=t_mid, delp=delp,
                sphum=qv, p_edge=p_edge)


def supercell_init(g, K, ztop=20.0e3, bubble_dtheta=3.0, bubble_r=10.0e3,
                   bubble_zc=1.5e3, bubble_zr=1.5e3, shear_u=25.0,
                   shear_depth=5.0e3, ntiles=1):
    """3-D doubly-periodic supercell state: WK sounding + thermal bubble +
    tanh westerly shear (test_cases.F90 supercell cases 30-37 analog).

    g: the doubly-periodic grid pack (build_grid_ops_dp). Returns dict of
    [T, K, n, n] fields (u/v on D walls)."""
    n = g.n
    T = ntiles
    prof = weisman_klemp_sounding(K, ztop=ztop)
    shp = (T, K, n, n)

    delp = np.broadcast_to(prof["delp"][None, :, None, None], shp).copy()
    delz = np.broadcast_to(prof["delz"][None, :, None, None], shp).copy()
    pt = np.broadcast_to(prof["pt"][None, :, None, None], shp).copy()
    qv = np.broadcast_to(prof["sphum"][None, :, None, None], shp).copy()

    # warm bubble in theta -> apply as a temperature perturbation
    dx = float(np.asarray(g.dxa[0, 0, 0, 0]))
    x = (np.arange(n) - n / 2 + 0.5) * dx
    y = (np.arange(n) - n / 2 + 0.5) * dx
    X, Y = np.meshgrid(x, y)
    Z = prof["z_mid"]
    r2 = ((X[None] / bubble_r) ** 2 + (Y[None] / bubble_r) ** 2
          + ((Z[:, None, None] - bubble_zc) / bubble_zr) ** 2)
    p_mid = 0.5 * (prof["p_edge"][1:] + prof["p_edge"][:-1])
    exner = (p_mid / 1.0e5) ** con.KAPPA
    dtheta = bubble_dtheta * np.cos(0.5 * np.pi * np.minimum(np.sqrt(r2), 1.0)) ** 2
    dtheta = np.where(r2 < 1.0, dtheta, 0.0)
    pt = pt + (dtheta * exner[:, None, None])[None]

    # tanh shear profile on D-grid u walls (constant in y)
    uz = shear_u * np.tanh(Z / shear_depth)
    u = np.broadcast_to(uz[None, :, None, None], (T, K, n + 1, n)).copy()
    v = np.zeros((T, K, n, n + 1))
    w = np.zeros(shp)
    phis = np.zeros((T, 1, n, n))
    return dict(delp=delp, pt=pt, delz=delz, sphum=qv, u=u, v=v, w=w,
                phis=phis)


def schar_ak_bk(K, dz=500.0, t00=300.0, n2_lo=1.0e-4, n2_hi=4.0e-4,
                z_n2=10.0e3, zt=8.0e3, p00=1.0e5):
    """Uniform-dz hybrid coordinate for the Schar case (test_cases.F90
    case 22 UNIFORM_DZ branch): integrate the constant-N Exner ladder
    upward, pure-pressure above the p_t transition (at z=zt), hybrid
    below."""
    kappa = con.KAPPA
    pk0 = p00 ** kappa
    th0 = t00 / pk0
    amp = con.GRAV ** 2 / (con.CP_AIR * n2_lo)
    ampb = con.GRAV ** 2 / (con.CP_AIR * n2_hi)

    ths_t = th0 * np.exp(zt * n2_lo / con.GRAV)
    pks_t = pk0 + amp * (1.0 / ths_t - 1.0 / th0)
    p_t = pks_t ** (1.0 / kappa)

    ak = np.zeros(K + 1)
    bk = np.zeros(K + 1)
    ak[K] = 0.0
    bk[K] = 1.0
    thp, pkp, ze = th0, pk0, 0.0
    for k in range(K - 1, -1, -1):
        ze += dz
        if ze >= z_n2:
            ths = thp * np.exp(dz * n2_hi / con.GRAV)
            pks = pkp + ampb * (1.0 / ths - 1.0 / thp)
        else:
            ths = thp * np.exp(dz * n2_lo / con.GRAV)
            pks = pkp + amp * (1.0 / ths - 1.0 / thp)
        pp = pks ** (1.0 / kappa)
        if pp <= p_t:
            ak[k] = pp
            bk[k] = 0.0
        else:
            ak[k] = p_t * (pp - p00) / (p_t - p00)
            bk[k] = (pp - p_t) / (p00 - p_t)
        thp, pkp = ths, pks
    return ak, bk


def schar_mountain_init(g, K, ak=None, bk=None, hm=2000.0, a_mtn=10.0e3,
                        lam=8.0e3, t00=300.0, n2_lo=1.0e-4, n2_hi=4.0e-4,
                        u_top=20.0, z_shear_lo=10.0e3, z_shear_hi=14.0e3,
                        ntiles=1):
    """Schar mountain-wave state on the doubly-periodic plane
    (test_cases.F90 case 22, :5630 "resting + shear flow over Schar
    topography"; CI configs d96_1k/d96_500m mtn_schar).

    Uniform-in-y ridge h(x) = hm exp(-(x/a)^2) cos^2(pi x/lam); constant
    N=0.01 below 14 km, 0.02 above; winds 0 below 10 km ramping linearly
    to u_top above 14 km.  Returns dict of [T, K, n, n] fields (pt is
    TEMPERATURE; delz/w included for the nonhydrostatic core)."""
    kappa = con.KAPPA
    p00 = 1.0e5
    pk0 = p00 ** kappa
    th0 = t00 / pk0
    amp = con.GRAV ** 2 / (con.CP_AIR * n2_lo)
    ampb = con.GRAV ** 2 / (con.CP_AIR * n2_hi)
    if ak is None:
        ak, bk = schar_ak_bk(K, t00=t00, n2_lo=n2_lo, n2_hi=n2_hi)

    n = g.n
    T = ntiles
    dx = float(np.asarray(g.dxa[0, 0, 0, 0]))
    x = (np.arange(n) - n / 2 + 0.5) * dx
    hx = hm * np.exp(-(x / a_mtn) ** 2) * np.cos(np.pi * x / lam) ** 2
    phis_z = np.broadcast_to(hx[None], (n, n))          # meters (scaled later)

    # surface pressure from the constant-N hydrostatic relation
    ths = th0 * np.exp(phis_z * n2_lo / con.GRAV)
    pks = pk0 + amp * (1.0 / ths - 1.0 / th0)
    ps = pks ** (1.0 / kappa)

    pe = ak[:, None, None] + ps[None] * bk[:, None, None]   # [K+1, n, n]
    peln = np.log(pe)
    pk_e = pe ** kappa
    delp = pe[1:] - pe[:-1]
    pkz = (delp / (peln[1:] - peln[:-1])) ** kappa

    # thermal profile, integrated bottom-up (reference step 2)
    pt = np.empty((K, n, n))
    delz = np.empty((K, n, n))
    gz = np.empty((K + 1, n, n))
    gz[K] = phis_z
    ths = np.exp(-phis_z * n2_lo / con.GRAV) / th0
    ths = ths - (pk_e[K] - pkz[K - 1]) / amp
    pt[K - 1] = pkz[K - 1] / ths
    delz[K - 1] = con.RDGAS / con.GRAV * pt[K - 1] * (peln[K - 1] - peln[K])
    gz[K - 1] = gz[K] - delz[K - 1]
    for k in range(K - 2, -1, -1):
        a_k = np.where(gz[k + 1] < 14.0e3, amp, ampb)
        ths = pkz[k + 1] / pt[k + 1] - (pkz[k + 1] - pkz[k]) / a_k
        pt[k] = pkz[k] / ths
        delz[k] = con.RDGAS / con.GRAV * pt[k] * (peln[k] - peln[k + 1])
        gz[k] = gz[k + 1] - delz[k]

    # shear wind from layer-mean height (reference step 3, uniform in y)
    zmid = 0.5 * (gz[:-1] + gz[1:])
    uz = np.where(gz[1:] < z_shear_lo, 0.0,
                  np.where(gz[1:] < z_shear_hi,
                           u_top / (z_shear_hi - z_shear_lo)
                           * (zmid - z_shear_lo), u_top))
    shp = (T, K, n, n)
    u = np.empty((T, K, n + 1, n))
    u[:, :, :n] = uz[None]
    u[:, :, n] = uz[None, :, 0]     # periodic wall
    v = np.zeros((T, K, n, n + 1))
    out = dict(
        delp=np.broadcast_to(delp[None], shp).copy(),
        pt=np.broadcast_to(pt[None], shp).copy(),
        delz=np.broadcast_to(delz[None], shp).copy(),
        w=np.zeros(shp), u=u, v=v,
        sphum=np.zeros(shp),
        phis=np.broadcast_to((phis_z * con.GRAV)[None, None], (T, 1, n, n)).copy())
    return out, ak, bk
