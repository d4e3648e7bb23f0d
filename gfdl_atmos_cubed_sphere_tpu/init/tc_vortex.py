"""Reed-Jablonowski idealized tropical cyclone (DCMIP 5X).

Re-implements /root/reference/tools/test_cases.F90 cases 55-57 (:3351-3620):
an analytic axisymmetric warm-core vortex in gradient-wind balance embedded
in a moist tropical sounding, on the sphere (case 55), environment-only
(case 56), or on a uniform f-plane (case 57). All math evaluated host-side
in float64; winds initialized directly on D-grid wall midpoints and
projected on the wall tangent vectors.
"""

import numpy as np

from .. import constants as con
from ..grid.gnomonic import xyz_to_lonlat, normalize

H = 3

# Reed & Jablonowski (2011) parameters (test_cases.F90:3466-3478, 3373-3375)
EXPPR = 1.5
EXPPZ = 2.0
GAMMA = 0.007           # K/m lapse rate
TS0 = 302.15            # surface T (K)
Q00 = 0.021             # surface specific humidity
ZTROP = 15000.0
ZP = 7000.0
DP_V = 1115.0           # vortex pressure depression (Pa)
RP = 282000.0           # vortex radius scale (m)
P00 = 101500.0          # background surface pressure (Pa)
QTROP = 1.0e-11
ZQ1 = 3000.0
ZQ2 = 8000.0
CEN_LON = np.pi         # vortex center (180E, 10N)
CEN_LAT = 10.0 * np.pi / 180.0

ZVIR = con.RVGAS / con.RDGAS - 1.0
T00 = TS0 * (1.0 + ZVIR * Q00)
EXPONENT = con.RDGAS * GAMMA / con.GRAV


def _dist_dir(lon, lat, radius):
    """Great-circle distance from the vortex center + azimuthal direction
    decomposition (d1: zonal factor, d2: meridional) at given lon/lat."""
    d1 = (np.sin(CEN_LAT) * np.cos(lat)
          - np.cos(CEN_LAT) * np.sin(lat) * np.cos(lon - CEN_LON))
    d2 = np.cos(CEN_LAT) * np.sin(lon - CEN_LON)
    d = np.maximum(1.0e-15, np.sqrt(d1 ** 2 + d2 ** 2))
    # great-circle distance
    cosc = (np.sin(CEN_LAT) * np.sin(lat)
            + np.cos(CEN_LAT) * np.cos(lat) * np.cos(lon - CEN_LON))
    r = radius * np.arccos(np.clip(cosc, -1.0, 1.0))
    return r, d1, d2, d


def _height_of(pm, ps):
    return (T00 / GAMMA) * (1.0 - (pm / ps) ** EXPONENT)


def _vt(r, z, cor, dp, rp):
    """Gradient-wind tangential velocity (test_cases.F90:3503-3507)."""
    rr = (r / rp) ** EXPPR
    tz = T00 - GAMMA * z
    denom = (EXPPZ * z * con.RDGAS * tz / (con.GRAV * ZP ** EXPPZ)
             + (1.0 - P00 / dp * np.exp(rr) * np.exp((z / ZP) ** EXPPZ)))
    arg = (cor * r / 2.0) ** 2 - EXPPR * rr * con.RDGAS * tz / denom
    return -cor * r / 2.0 + np.sqrt(np.maximum(arg, 0.0))


def tc_vortex(geom, npz, ak, bk, ptop, vortex=True, f_plane=False):
    """Build the TC initial state. Returns dict with delp, pt (temperature),
    u, v, w, delz, sphum, phis, ps (+ 'cor' scalar to use for an f-plane,
    case 57). vortex=False gives the environment only (case 56)."""
    n = geom.n
    R = geom.radius
    ak = np.asarray(ak, np.float64)
    bk = np.asarray(bk, np.float64)
    dp = DP_V if vortex else 0.0
    rp = RP if vortex else 1.0e25
    cor = 2.0 * geom.omega * np.sin(CEN_LAT)

    ai = geom.interior
    aglon, aglat = ai("aglon"), ai("aglat")               # [6, n, n]
    r_a, _, _, _ = _dist_dir(aglon, aglat, R)
    ps = P00 - dp * np.exp(-(r_a / rp) ** EXPPR)           # moist ps
    phis = np.zeros_like(ps)

    delp = ((ak[1:] - ak[:-1])[None, :, None, None]
            + ps[:, None] * (bk[1:] - bk[:-1])[None, :, None, None])
    pe = ptop + np.cumsum(delp, axis=1)
    pe = np.concatenate([np.full_like(pe[:, :1], ptop), pe], axis=1)
    pm = 0.5 * (pe[:, 1:] + pe[:, :-1])
    z_a = _height_of(pm, ps[:, None])
    trop = z_a > ZTROP

    # moisture + temperature (test_cases.F90:3552-3576)
    sphum = np.where(
        trop, QTROP,
        Q00 * np.exp(-z_a / ZQ1) * np.exp(-(z_a / ZQ2) ** EXPPZ))
    tz = T00 - GAMMA * z_a
    denom = (1.0 + EXPPZ * con.RDGAS * tz * z_a
             / (con.GRAV * ZP ** EXPPZ
                * (1.0 - P00 / dp * np.exp((r_a[:, None] / rp) ** EXPPR)
                   * np.exp((z_a / ZP) ** EXPPZ)))) if vortex else 1.0
    pt = np.where(trop, T00 - GAMMA * ZTROP,
                  tz / (1.0 + ZVIR * sphum) / denom)

    # D winds at wall midpoints (test_cases.F90:3484-3549)
    gxyz = geom.arrays["grid_xyz"]
    cw = gxyz[:, H:H + n + 1, H:H + n + 1]
    es1 = geom.arrays["es"][:, H:H + n + 1, H:H + n, 0]    # u-wall tangent
    ew2 = geom.arrays["ew"][:, H:H + n, H:H + n + 1, 1]    # v-wall tangent

    def wall_wind(mid_xyz, tangent):
        lon, lat = xyz_to_lonlat(mid_xyz)
        r, d1, d2, d = _dist_dir(lon, lat, R)
        ps_w = P00 - dp * np.exp(-(r / rp) ** EXPPR)
        pe_w = (ak[:, None, None, None]
                + ps_w[None] * bk[:, None, None, None])    # [K+1, 6, ...]
        pm_w = 0.5 * (pe_w[1:] + pe_w[:-1])
        z_w = _height_of(pm_w, ps_w[None])
        vt = _vt(r[None], z_w, cor, dp, rp) / d[None] if vortex else 0.0
        utmp = vt * d1[None]                               # zonal
        vtmp = vt * d2[None]                               # meridional
        ex = np.stack([-np.sin(lon), np.cos(lon),
                       np.zeros_like(lon)], -1)
        ey = np.stack([-np.sin(lat) * np.cos(lon),
                       -np.sin(lat) * np.sin(lon), np.cos(lat)], -1)
        te_x = np.sum(tangent * ex, -1)
        te_y = np.sum(tangent * ey, -1)
        w = utmp * te_x[None] + vtmp * te_y[None]
        w = np.where(z_w > ZTROP, 0.0, w)
        return np.moveaxis(w, 0, 1)                        # [6, K, ...]

    if vortex:
        midu = normalize(cw[:, :, :-1] + cw[:, :, 1:])     # u walls [6,n+1,n]
        midv = normalize(cw[:, :-1, :] + cw[:, 1:, :])     # v walls [6,n,n+1]
        u = wall_wind(midu, es1)
        v = wall_wind(midv, ew2)
    else:
        u = np.zeros((6, npz, n + 1, n))
        v = np.zeros((6, npz, n, n + 1))

    # nonhydrostatic fields (test_cases.F90:3600-3609); log(pe_k/pe_k+1)<0
    delz = (con.RDGAS * pt * (1.0 + ZVIR * sphum) / con.GRAV
            * np.log(pe[:, :-1] / pe[:, 1:]))
    w = np.zeros_like(delp)

    return dict(delp=delp, pt=pt, u=u, v=v, w=w, delz=delz, sphum=sphum,
                phis=phis[:, None], ps=ps,
                cor=(cor if f_plane else None))
