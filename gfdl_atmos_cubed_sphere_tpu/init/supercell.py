"""Cube-grid supercell idealized cases (component #23).

Cases 30/31 (+ their negative tanh-hodograph variants) and the HIWPP
SuperK cases 36/37 of /root/reference/tools/test_cases.F90:
- 30/31: Weisman & Klemp (2002) sounding on pressure levels
  (SuperCell_Sounding, test_cases.F90:6500), quarter-circle hodograph
  winds Gaussian-decayed from OKC (test_cases.F90:2604-2752), warm bubble;
  case 30 zeroes planetary rotation.
- 36/37: z-coordinate Weisman-Klemp sounding (SuperK_Sounding, :6179),
  MPAS wind profile (SuperK_u, :6465), meridional gradient-wind balance
  via the 1001-latitude iteration with PPM edge values
  (balanced_K, :6310 + ppme, fv_diagnostics.F90:5371); case 37 adds the
  prescribed thermal at (180E, 0N).

All host-side NumPy f64 (init-time), mirroring init/tc_vortex.py's wall
-wind construction.
"""

import numpy as np

from .. import constants as con
from ..grid.gnomonic import normalize, xyz_to_lonlat

H = 3
ZVIR = con.RVGAS / con.RDGAS - 1.0
P00 = 1000.0e2
OKC = (np.deg2rad(262.0), np.deg2rad(35.0))


def supercell_sounding(npz, ps, pk1):
    """Weisman & Klemp (2002) sounding on the model's p**kappa layers
    (SuperCell_Sounding, test_cases.F90:6500). pk1 [npz]: layer-mean
    p**kappa. Returns (temperature [npz], sphum [npz])."""
    ns = 401
    tmin, qst, qv0 = 175.0, 3.0e-6, 1.4e-2
    ztr, ttr, ptr, pt0 = 12.0e3, 213.0, 343.0, 300.0
    pk0 = P00 ** con.KAPPA

    dz0 = 50.0
    zs = dz0 * np.arange(ns - 1, -1, -1.0)      # zs[ns-1]=0 surface
    qs = np.full(ns, qst)
    rh = np.full(ns, 0.25)
    pt = np.empty(ns)
    strat = zs > ztr
    pt[strat] = ptr * np.exp(con.GRAV * (zs[strat] - ztr)
                             / (con.CP_AIR * ttr))
    fac_z = (zs[~strat] / ztr) ** 1.25
    pt[~strat] = pt0 + (ptr - pt0) * fac_z
    rh[~strat] = 1.0 - 0.75 * fac_z
    qs[~strat] = qv0 - (qv0 - qst) * fac_z
    pt = pt / pk0

    pk = np.empty(ns)
    pk[-1] = ps ** con.KAPPA
    for _ in range(3):                          # iterate virtual effect
        tbar = 0.5 * (pt[:-1] * (1.0 + ZVIR * qs[:-1])
                      + pt[1:] * (1.0 + ZVIR * qs[1:]))
        dpk = con.GRAV * dz0 / (con.CP_AIR * tbar)
        pk[:-1] = pk[-1] - np.cumsum(dpk[::-1])[::-1]
        if (pk <= 0.0).any():
            raise ValueError("Super-Cell case: pk < 0")
        temp1 = pt * pk
        pp = np.exp(np.log(pk) / con.KAPPA)
        qsat = 380.0 / pp * np.exp(17.27 * (temp1 - 273.0) / (temp1 - 36.0))
        qs = np.minimum(qv0, rh * qsat)

    # interpolate to the model's pk1 (test_cases.F90:6590-6605)
    tp = np.interp(pk1, pk, pt)
    qp = np.interp(pk1, pk, qs)
    above = pk1 <= pk[0]
    tp[above] = pt[0] * pk[0] / pk1[above]      # isothermal above
    qp[above] = qst
    tp = np.maximum(tmin, tp * pk1)             # -> temperature
    return tp, qp


def _hodograph(zm, variant):
    """Quarter-circle (Harris) / tanh hodograph minus storm motion
    (test_cases.F90:2664-2698). Returns (ubar, vbar) at height zm."""
    us0 = 30.0
    if variant == "curved":                     # SRH = 40
        utmp = np.where(zm <= 2.0e3, 8.0 * (1.0 - np.cos(np.pi * zm / 4.0e3)),
                        np.where(zm <= 6.0e3,
                                 8.0 + (us0 - 8.0) * (zm - 2.0e3) / 4.0e3,
                                 us0))
        vtmp = np.where(zm <= 2.0e3, 8.0 * np.sin(np.pi * zm / 4.0e3),
                        8.0)
        return utmp - 8.0, vtmp - 4.0
    # tanh approximation (negative test_case; SRH = 39)
    utmp = 15.0 * (1.0 + np.tanh(zm / 2000.0 - 1.5))
    vtmp = 8.5 * np.tanh(zm / 1000.0)
    return utmp - 8.5, vtmp - 4.25


def _latlon_basis(lon, lat):
    ex = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], -1)
    ey = np.stack([-np.sin(lat) * np.cos(lon),
                   -np.sin(lat) * np.sin(lon), np.cos(lat)], -1)
    return ex, ey


def _gc_dist(lon1, lat1, lon2, lat2, radius):
    cosc = (np.sin(lat1) * np.sin(lat2)
            + np.cos(lat1) * np.cos(lat2) * np.cos(lon1 - lon2))
    return radius * np.arccos(np.clip(cosc, -1.0, 1.0))


def supercell(geom, npz, ak, bk, ptop, case=31, r0=10.0e3):
    """Cases 30/31/-30/-31 (test_cases.F90:2604): Weisman-Klemp sounding,
    hodograph winds decayed from OKC, 2 K warm bubble at z=1.4 km.

    Returns dict(delp, pt, u, v, w, delz, sphum, phis, ps,
    zero_rotation) — with zero_rotation True (case |30|) the caller must
    zero g.f0/g.fC before stepping (f0(:,:)=0, test_cases.F90:2609)."""
    n = geom.n
    R = geom.radius
    ak = np.asarray(ak, np.float64)
    bk = np.asarray(bk, np.float64)
    variant = "curved" if case > 0 else "tanh"

    ps = np.full((6, n, n), P00)
    phis = np.zeros_like(ps)
    delp = ((ak[1:] - ak[:-1])[None, :, None, None]
            + ps[:, None] * (bk[1:] - bk[:-1])[None, :, None, None])
    pe1 = ak + P00 * bk                          # 1-D edge pressures
    peln1 = np.log(pe1)
    pk1 = (pe1[1:] ** con.KAPPA - pe1[:-1] ** con.KAPPA) \
        / (con.KAPPA * (peln1[1:] - peln1[:-1]))
    ts1, qs1 = supercell_sounding(npz, P00, pk1)

    pt = np.broadcast_to(ts1[None, :, None, None], delp.shape).copy()
    sphum = np.broadcast_to(qs1[None, :, None, None], delp.shape).copy()
    delz1 = (con.RDGAS / con.GRAV * ts1 * (1.0 + ZVIR * qs1)
             * (peln1[:-1] - peln1[1:]))        # negative
    delz = np.broadcast_to(delz1[None, :, None, None], delp.shape).copy()
    ze1 = np.zeros(npz + 1)
    ze1[:-1] = -np.cumsum(delz1[::-1])[::-1]    # ze1[k] height of top edge
    zm1 = 0.5 * (ze1[:-1] + ze1[1:])
    ubar, vbar = _hodograph(zm1, variant)

    # D winds at wall midpoints with Gaussian decay from OKC
    gxyz = geom.arrays["grid_xyz"]
    cw = gxyz[:, H:H + n + 1, H:H + n + 1]
    es1 = geom.arrays["es"][:, H:H + n + 1, H:H + n, 0]
    ew2 = geom.arrays["ew"][:, H:H + n, H:H + n + 1, 1]

    def wall_wind(mid_xyz, tangent):
        lon, lat = xyz_to_lonlat(mid_xyz)
        ex, ey = _latlon_basis(lon, lat)
        dist = _gc_dist(lon, lat, OKC[0], OKC[1], R)
        decay = np.exp(-8.0 * dist / R)          # [6, ...]
        te_x = np.sum(tangent * ex, -1)
        te_y = np.sum(tangent * ey, -1)
        w = (ubar[:, None, None, None] * te_x[None]
             + vbar[:, None, None, None] * te_y[None]) * decay[None]
        return np.swapaxes(w, 0, 1)              # [6, npz, ...]

    midu = normalize(cw[:, :, :-1] + cw[:, :, 1:])
    midv = normalize(cw[:, :-1, :] + cw[:, 1:, :])
    u = wall_wind(midu, es1)
    v = wall_wind(midv, ew2)

    # warm bubble (test_cases.F90:2736-2752): +2 K within the ellipsoid
    ai = geom.interior
    aglon, aglat = ai("aglon"), ai("aglat")
    dist_a = _gc_dist(aglon, aglat, OKC[0], OKC[1], R)   # [6, n, n]
    pturb, zc = 2.0, 1.4e3
    ptmp = ((zm1 - zc) / zc) ** 2                        # [npz]
    d = np.sqrt(np.clip(ptmp[None, :, None, None]
                        + (dist_a[:, None] / r0) ** 2, 0.0, None))
    pt = np.where(d < 1.0, pt + pturb * (1.0 - d), pt)

    w = np.zeros_like(delp)
    return dict(delp=delp, pt=pt, u=u, v=v, w=w, delz=delz, sphum=sphum,
                phis=phis[:, None], ps=ps,
                zero_rotation=(abs(case) == 30))


# ---------------------------------------------------------------------------
# HIWPP SuperK (cases 36/37)
# ---------------------------------------------------------------------------

def ppme(p, delp):
    """PPM cell-edge values down a column (ppme, fv_diagnostics.F90:5371).
    p, delp: [J, K] -> edges [J, K+1]. Loop-literal transcription."""
    J, K = p.shape
    qe = np.zeros((J, K + 1))
    a6 = np.zeros((J, K + 1))                    # a6[:,k] = delp[k-1]+delp[k]
    for k in range(1, K):
        a6[:, k] = delp[:, k - 1] + delp[:, k]
    delq = p[:, 1:] - p[:, :-1]                  # [J, K-1]
    dc = np.zeros((J, K))
    for k in range(1, K - 1):
        c1 = (delp[:, k - 1] + 0.5 * delp[:, k]) / a6[:, k + 1]
        c2 = (delp[:, k + 1] + 0.5 * delp[:, k]) / a6[:, k]
        tmp = delp[:, k] * (c1 * delq[:, k] + c2 * delq[:, k - 1]) \
            / (a6[:, k] + delp[:, k + 1])
        qmax = np.max(p[:, k - 1:k + 2], axis=1) - p[:, k]
        qmin = p[:, k] - np.min(p[:, k - 1:k + 2], axis=1)
        dc[:, k] = np.sign(tmp) * np.minimum(np.abs(tmp),
                                             np.minimum(qmax, qmin))
    for k in range(2, K - 1):
        c1 = delq[:, k - 1] * delp[:, k - 1] / a6[:, k]
        a1 = a6[:, k - 1] / (a6[:, k] + delp[:, k - 1])
        a2 = a6[:, k + 1] / (a6[:, k] + delp[:, k])
        qe[:, k] = p[:, k - 1] + c1 + 2.0 / (a6[:, k - 1] + a6[:, k + 1]) \
            * (delp[:, k] * (c1 * (a1 - a2) + a2 * dc[:, k - 1])
               - delp[:, k - 1] * a1 * dc[:, k])
    # top: three-cell parabolic subgrid distribution
    s1 = delp[:, 0]
    s2 = delp[:, 1] + s1
    s3 = delp[:, 1] + delp[:, 2]
    s4 = s3 + delp[:, 3]
    ss3 = s3 + s1
    s32, s42, s34 = s3 * s3, s4 * s4, s3 * s4
    a3 = (delq[:, 1] - delq[:, 0] * s3 / s2) / (s3 * ss3)
    b2 = delq[:, 0] / s2 - a3 * (s1 + s2)
    sc = -b2 / (3.0 * np.where(a3 == 0.0, 1.0, a3))
    lin = p[:, 0] - delq[:, 0] * s1 / s2
    par = p[:, 0] - s1 * (a3 * s1 + b2)
    qe[:, 0] = np.where(np.abs(a3) > 1e-14,
                        np.where((sc < 0.0) | (sc > s1), par, lin), lin)
    dc[:, 0] = p[:, 0] - qe[:, 0]
    dm = delp[:, 0] / (s34 * ss3 * (delp[:, 1] + s3) * (s4 + delp[:, 0]))
    f1 = delp[:, 1] * s34 / (s2 * ss3 * (s4 + delp[:, 0]))
    f2 = (delp[:, 1] + s3) * (ss3 * (delp[:, 1] * s3 + s34
                                     + delp[:, 1] * s4)
                              + s42 * (delp[:, 1] + s3 + s32 / s2))
    f3 = -delp[:, 1] * (ss3 * (s32 * (s3 + s4) / (s4 - delp[:, 1])
                               + (delp[:, 1] * s3 + s34
                                  + delp[:, 1] * s4))
                        + s42 * (delp[:, 1] + s3))
    f4 = ss3 * delp[:, 1] * s32 * (delp[:, 1] + s3) / (s4 - delp[:, 1])
    qe[:, 1] = f1 * p[:, 0] + (f2 * p[:, 1] + f3 * p[:, 2]
                               + f4 * p[:, 3]) * dm
    # bottom: area-preserving cubic with 2nd deriv = 0 at the surface
    d1 = delp[:, K - 1]
    d2 = delp[:, K - 2]
    qm = (d2 * p[:, K - 1] + d1 * p[:, K - 2]) / (d1 + d2)
    dq = 2.0 * (p[:, K - 2] - p[:, K - 1]) / (d1 + d2)
    c1 = (qe[:, K - 2] - qm - d2 * dq) \
        / (d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1)))
    c3 = dq - 2.0 * c1 * (d2 * (5.0 * d1 + d2) - 3.0 * d1 ** 2)
    qe[:, K - 1] = qm - c1 * d1 * d2 * (d2 + 3.0 * d1)
    qe[:, K] = d1 * (8.0 * c1 * d1 ** 2 - c3) + qe[:, K - 1]
    return qe


def superk_sounding(npz, ze, p00=P00):
    """z-coordinate Weisman-Klemp sounding (SuperK_Sounding,
    test_cases.F90:6179, moist-pressure branch). ze [npz+1] edge heights
    (decreasing). Returns (pt: FV potential temp/pk0 [npz], qz [npz],
    pe [npz+1])."""
    nx_it, qst, qv0 = 5, 1.0e-6, 1.4e-2
    ztr, ttr, ptr, pt0 = 12.0e3, 213.0, 343.0, 300.0
    pk0 = p00 ** con.KAPPA
    zs = 0.5 * (ze[:-1] + ze[1:])
    qz = np.full(npz, qst)
    rh = np.full(npz, 0.25)
    pt = np.where(zs > ztr,
                  ptr * np.exp(con.GRAV * (zs - ztr) / (con.CP_AIR * ttr)),
                  pt0 + (ptr - pt0) * (np.minimum(zs, ztr) / ztr) ** 1.25)
    tro = zs <= ztr
    fac_z = (zs[tro] / ztr) ** 1.25
    rh[tro] = 1.0 - 0.75 * fac_z
    qz[tro] = qv0 - (qv0 - qst) * fac_z
    pt = pt / pk0

    pk = np.empty(npz + 1)
    pe = np.empty(npz + 1)
    pk[-1] = pk0
    pe[-1] = p00
    dz = ze[:-1] - ze[1:]                        # positive
    # dry first guess
    dpk = con.GRAV * dz / (con.CP_AIR * pt)
    pk[:-1] = pk[-1] - np.cumsum(dpk[::-1])[::-1]
    peln = np.log(pk) / con.KAPPA
    pe = np.exp(peln)
    dp0 = pe[1:] - pe[:-1]
    pm = dp0 / (peln[1:] - peln[:-1])
    temp = pt * pm ** con.KAPPA
    qz = np.minimum(qv0, rh * 380.0 / pm
                    * np.exp(17.27 * (temp - 273.0) / (temp - 36.0)))
    for _ in range(nx_it):
        dp = dp0 * (1.0 + qz)
        pe_kp1 = pe[0] + np.cumsum(dp)
        pk[-1] = pe_kp1[-1] ** con.KAPPA
        dpk = con.GRAV * dz / (con.CP_AIR * pt * (1.0 + ZVIR * qz))
        pk[:-1] = pk[-1] - np.cumsum(dpk[::-1])[::-1]
        peln = np.log(pk) / con.KAPPA
        pe = np.exp(peln)
        pm = (pe[1:] - pe[:-1]) / (peln[1:] - peln[:-1])
        temp = pt * pm ** con.KAPPA
        qz = np.minimum(qv0, rh * 380.0 / pm
                        * np.exp(17.27 * (temp - 273.0) / (temp - 36.0)))
    return pt, qz, pe


def superk_u(zz, tanh_prof=False):
    """MPAS wind profile + shear (SuperK_u, test_cases.F90:6465)."""
    zs, us = 5.0e3, 30.0
    if tanh_prof:
        uc = 12.0
        um = us * np.tanh(zz / zs) - uc
        dudz = (us / zs) / np.cosh(zz / zs) ** 2
        return um, dudz
    uc = 15.0
    um = np.where(zz > zs + 1.0e3, us,
                  np.where(np.abs(zz - zs) <= 1.0e3,
                           us * (-4.0 / 5.0 + 3.0 * zz / zs
                                 - 5.0 / 4.0 * (zz / zs) ** 2),
                           us * zz / zs))
    dudz = np.where(zz > zs + 1.0e3, 0.0,
                    np.where(np.abs(zz - zs) <= 1.0e3,
                             us / zs * (3.0 - 5.0 / 2.0 * zz / zs),
                             us / zs))
    return um - uc, dudz


def balanced_k(npz, ze1, ts1, qs1, uz1, dudz, ps0, ptop, aglat):
    """Meridional gradient-wind balance on a 1001-point latitude grid
    (balanced_K, test_cases.F90:6310): iterate the thermal-wind relation
    nt=5 times with PPM edge values, integrate surface pk with
    gradient-wind balance, hydrostatic pk aloft, convert to temperature,
    interpolate to the cube by |latitude|. ts1 is cp*theta_v. Returns
    (pt_cube temperature [6,npz,n,n], pe_cube [6,npz+1,n,n], ak, bk)."""
    nt, nlat = 5, 1001
    dlat = 0.5 * np.pi / (nlat - 1)
    lat = dlat * np.arange(nlat)
    latc = 0.5 * (lat[:-1] + lat[1:])
    dzc = np.broadcast_to((ze1[:-1] - ze1[1:])[None, :],
                          (nlat, npz)).copy()
    pt2 = np.broadcast_to(ts1[None, :], (nlat, npz)).copy()

    for _ in range(nt):
        pte = ppme(pt2, dzc)
        new = pt2.copy()
        for j in range(1, nlat):
            tmp1 = 0.5 * (pte[j - 1, :npz] + pte[j, :npz])
            tmp3 = 0.5 * (pte[j - 1, 1:] + pte[j, 1:])
            new[j] = new[j - 1] + dlat / (2.0 * con.GRAV) \
                * np.sin(2.0 * latc[j - 1]) * uz1 \
                * (uz1 * (tmp1 - tmp3) / dzc[j]
                   - (new[j - 1] + pt2[j]) * dudz)
        pt2 = new

    pk2 = np.zeros((nlat, npz + 1))
    pk2[0, -1] = ps0 ** con.KAPPA
    for j in range(1, nlat):
        pk2[j, -1] = pk2[j - 1, -1] - dlat * uz1[-1] * uz1[-1] \
            * np.sin(2.0 * latc[j - 1]) / (pt2[j - 1, -1] + pt2[j, -1])
    for k in range(npz - 1, -1, -1):
        pk2[:, k] = pk2[:, k + 1] - con.GRAV * dzc[:, k] / pt2[:, k]
    peln2 = np.log(pk2) / con.KAPPA
    pe2 = np.exp(peln2)
    pky = (pk2[:, 1:] - pk2[:, :-1]) \
        / (con.KAPPA * (peln2[:, 1:] - peln2[:, :-1]))
    t2 = pt2 * pky / (con.CP_AIR * (1.0 + ZVIR * qs1[None, :]))

    # interpolate to cube cells by |lat|
    frac = np.clip(np.abs(aglat) / dlat, 0.0, nlat - 1 - 1e-9)
    jj = frac.astype(int)
    fy = frac - jj
    pt_cube = (t2[jj] * (1.0 - fy[..., None]) + t2[jj + 1] * fy[..., None])
    pe_cube = (pe2[jj] * (1.0 - fy[..., None])
               + pe2[jj + 1] * fy[..., None])
    pt_cube = np.moveaxis(pt_cube, -1, 1)        # [6, npz, n, n]
    pe_cube = np.moveaxis(pe_cube, -1, 1)

    # ak/bk from the equator profile with a constant-pressure top
    pe1 = pe2[0]
    ak = np.zeros(npz + 1)
    bk = np.zeros(npz + 1)
    ak[0] = ptop
    pint = pe1[1]
    ak[1] = pint
    for k in range(2, npz + 1):
        bk[k] = (pe1[k] - pint) / (pe1[npz] - pint)
        ak[k] = pe1[k] - bk[k] * pe1[npz]
    ak[npz] = 0.0
    bk[npz] = 1.0
    pe_cube[:, 0] = ptop
    return pt_cube, pe_cube, ak, bk


def superk(geom, npz, case=36, ztop=20.0e3, adiabatic=False, r0=10.0e3):
    """HIWPP SuperK cases 36/37 (test_cases.F90:2987): uniform-dz levels to
    20 km, balanced zonal MPAS wind profile, case 37 adds the thermal at
    (180E, 0N). Planetary rotation is zeroed (f0=fC=0). Returns
    dict(delp, pt, u, v, w, delz, sphum, phis, ps, ak, bk, ptop,
    zero_rotation=True)."""
    n = geom.n
    R = geom.radius
    ze1 = np.zeros(npz + 1)
    ze1[0] = ztop
    for k in range(npz - 1, 0, -1):
        ze1[k] = ze1[k + 1] + ztop / npz
    zs1 = 0.5 * (ze1[:-1] + ze1[1:])

    ts1, qs1, pe1 = superk_sounding(npz, ze1)
    cp_thv = con.CP_AIR * ts1 * (1.0 + ZVIR * qs1)     # cp*theta_v/pk0... (FV defn)
    uz1, dudz = superk_u(zs1)
    ptop = pe1[0]

    ai = geom.interior
    aglat = ai("aglat")                                 # [6, n, n]
    aglon = ai("aglon")
    pt, pe, ak, bk = balanced_k(npz, ze1, cp_thv, qs1, uz1, dudz,
                                pe1[-1], ptop, aglat)
    ps = pe[:, -1]
    peln = np.log(pe)
    delp = pe[:, 1:] - pe[:, :-1]
    sphum = np.broadcast_to(qs1[None, :, None, None], delp.shape).copy()

    # top layer: keep T, adjust height; below: constant dz, adjust T
    delz = np.empty_like(delp)
    delz[:, 0] = (con.RDGAS / con.GRAV * pt[:, 0] * (1.0 + ZVIR * qs1[0])
                  * (peln[:, 0] - peln[:, 1]))
    for k in range(1, npz):
        delz[:, k] = ze1[k + 1] - ze1[k]
        pt[:, k] = delz[:, k] * con.GRAV \
            / (con.RDGAS * (1.0 + ZVIR * qs1[k])
               * (peln[:, k] - peln[:, k + 1]))

    # zonal wind profile on D walls: u = uz1(k) cos(lat) e.ex
    gxyz = geom.arrays["grid_xyz"]
    cw = gxyz[:, H:H + n + 1, H:H + n + 1]
    es1 = geom.arrays["es"][:, H:H + n + 1, H:H + n, 0]
    ew2 = geom.arrays["ew"][:, H:H + n, H:H + n + 1, 1]

    def wall_u(mid_xyz, tangent):
        lon, lat = xyz_to_lonlat(mid_xyz)
        ex, _ = _latlon_basis(lon, lat)
        te_x = np.sum(tangent * ex, -1)
        w = uz1[:, None, None, None] * np.cos(lat)[None] * te_x[None]
        return np.swapaxes(w, 0, 1)

    u = wall_u(normalize(cw[:, :, :-1] + cw[:, :, 1:]), es1)
    v = wall_u(normalize(cw[:, :-1, :] + cw[:, 1:, :]), ew2)

    if case == 37:
        pk0 = P00 ** con.KAPPA
        pkz = ((pe[:, 1:] ** con.KAPPA - pe[:, :-1] ** con.KAPPA)
               / (con.KAPPA * (peln[:, 1:] - peln[:, :-1])))
        pturb = 10.0 if adiabatic else 3.0
        zc = 1.5e3
        zm = 0.5 * (ze1[:-1] + ze1[1:])
        dist_a = _gc_dist(aglon, aglat, np.pi, 0.0, R)
        d = np.sqrt(np.clip(((zm[None, :, None, None] - zc) / zc) ** 2
                            + (dist_a[:, None] / r0) ** 2, 0.0, None))
        bump = (pkz / pk0) * pturb * np.cos(0.5 * np.pi
                                            * np.minimum(d, 1.0)) ** 2
        pt = np.where(d < 1.0, pt + bump, pt)

    w = np.zeros_like(delp)
    return dict(delp=delp, pt=pt, u=u, v=v, w=w, delz=delz, sphum=sphum,
                phis=np.zeros((6, 1, n, n)), ps=ps, ak=ak, bk=bk,
                ptop=float(ptop), zero_rotation=True)
