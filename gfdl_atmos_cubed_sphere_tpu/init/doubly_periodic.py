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
