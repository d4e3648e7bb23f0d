"""DCMIP 1-1 3-D tracer-advection test (reference test_case 51).

Re-implements /root/reference/tools/test_cases.F90: init at :2369-2510
(isothermal atmosphere, constant-height layers, solid-body start winds) and
`case51_forcing` :4174-4501 wind_field=1 (the Nair-Lauritzen time-reversing
deformational flow: at t = T the tracers return to their initial state).
The reference ships the DCMIP tracer setup calls commented out; the
standard DCMIP 1-1 tracer set (two cosine bells, the correlated field,
slotted cylinders, and the complement) is provided here explicitly.

Winds are generated from the flow's streamfunction evaluated at grid
corner points, so the discrete C-grid flow is exactly nondivergent
(init_winds defOnGrid==1 pattern) and tracer mass is conserved to
roundoff.
"""

import numpy as np

from .. import constants as con
from ..grid.gnomonic import great_circle_angle

H = 3
DAY = 86400.0
PERIOD = 12.0 * DAY
T00 = 300.0


def _k1(a):
    return np.asarray(a)[:, None]


def case51_levels(npz):
    """Constant-height layers of an isothermal atmosphere: interface
    heights 12 km..0 and the matching hydrostatic pressures
    (test_cases.F90:2385-2428). Returns (zz0 [npz+1], pz0 [npz+1], ptop)."""
    zz0 = np.linspace(12000.0, 0.0, npz + 1)
    pz0 = 1.0e5 * np.exp(-zz0 * con.GRAV / (T00 * con.RDGAS))
    return zz0, pz0, float(pz0[0])


def _stream(lon, lat, time):
    """Streamfunction of the DCMIP 1-1 horizontal flow at `time`:
    psi = R*ubar*sin^2(lon') cos^2(lat) cos(pi t/T) - R*(2 pi R/T)/R sin(lat)
    with lon' = lon - 2 pi t / T and ubar = 10 R / T."""
    R = con.RADIUS
    ubar = 10.0 * R / PERIOD
    lonp = lon - 2.0 * np.pi * time / PERIOD
    return (R * ubar * np.sin(lonp) ** 2 * np.cos(lat) ** 2
            * np.cos(np.pi * time / PERIOD)
            - 2.0 * np.pi * R / PERIOD * R * np.sin(lat))


def case51_cgrid_winds(geom, time):
    """Exactly nondivergent C-grid winds at `time` from corner-point
    streamfunction differences (test_cases.F90:4404-4420 via psi_b).
    Returns padded (uc [6,1,P,P-1... x-wall], vc y-wall) float64."""
    psi_b = _stream(geom.arrays["lon"], geom.arrays["lat"], time)
    with np.errstate(all="ignore"):
        vc = (psi_b[:, :, 1:] - psi_b[:, :, :-1]) / geom.arrays["dx"]
        uc = -(psi_b[:, 1:, :] - psi_b[:, :-1, :]) / geom.arrays["dy"]
    return _k1(np.nan_to_num(uc)), _k1(np.nan_to_num(vc))


def _gc_dist(lon, lat, lon0, lat0):
    p0 = np.stack([np.cos(lat0) * np.cos(lon0),
                   np.cos(lat0) * np.sin(lon0), np.sin(lat0)])
    pa = np.stack([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon),
                   np.sin(lat)], axis=-1)
    return great_circle_angle(pa, p0)   # radians


def dcmip11_tracers(geom, npz):
    """The 4 standard DCMIP 1-1 tracers on the cube, vertically modulated
    by a Gaussian around z = 5 km (so the vertical-advection phase of the
    test is nontrivial). Returns dict q1..q4, each [6, npz, n, n]."""
    lon = geom.interior("aglon")
    lat = geom.interior("aglat")
    rt = 0.5
    lon1, lat1 = 5.0 * np.pi / 6.0, 0.0
    lon2, lat2 = 7.0 * np.pi / 6.0, 0.0
    d1 = _gc_dist(lon, lat, lon1, lat1)
    d2 = _gc_dist(lon, lat, lon2, lat2)

    # cosine bells
    b1 = np.where(d1 < rt, 0.5 * (1.0 + np.cos(np.pi * d1 / rt)), 0.0)
    b2 = np.where(d2 < rt, 0.5 * (1.0 + np.cos(np.pi * d2 / rt)), 0.0)
    q1h = 0.1 + 0.9 * (b1 + b2)
    # correlated field
    q2h = 0.9 - 0.8 * q1h ** 2
    # slotted cylinders
    sc = np.where((d1 <= rt) & (np.abs(lon - lon1) >= rt / 6.0), 1.0, 0.1)
    sc = np.where((d2 <= rt) & (np.abs(lon - lon2) >= rt / 6.0), 1.0, sc)
    sc = np.where((d1 <= rt) & (np.abs(lon - lon1) < rt / 6.0)
                  & (lat - lat1 < -5.0 * rt / 12.0), 1.0, sc)
    sc = np.where((d2 <= rt) & (np.abs(lon - lon2) < rt / 6.0)
                  & (lat - lat2 > 5.0 * rt / 12.0), 1.0, sc)
    q3h = sc
    q4h = 1.0 - 0.3 * (q1h + q2h + q3h)

    zz0, _, _ = case51_levels(npz)
    zmid = 0.5 * (zz0[:-1] + zz0[1:])
    zmod = np.exp(-((zmid - 5000.0) / 2500.0) ** 2)[None, :, None, None]
    out = {}
    for nm, qh in (("q1", q1h), ("q2", q2h), ("q3", q3h), ("q4", q4h)):
        out[nm] = qh[:, None] * zmod
    return out


def case51(geom, npz):
    """Initial state: uniform delp per level from the isothermal pressure
    table, isothermal pt, t=0 deformational C winds, DCMIP tracers."""
    n = geom.n
    _, pz0, ptop = case51_levels(npz)
    delp = np.broadcast_to(np.diff(pz0)[None, :, None, None],
                           (geom.topology.ntiles, npz, n, n)).copy()
    pt = np.full_like(delp, T00)
    uc, vc = case51_cgrid_winds(geom, 0.0)
    return dict(delp=delp, pt=pt, uc=uc, vc=vc, ptop=ptop,
                q=dcmip11_tracers(geom, npz))


def case52_levels(npz):
    """Case-52 ak/bk: uniform-height levels to 12 km in a gamma=6.5 K/km
    atmosphere (test_cases.F90:2531-2553)."""
    t00, gamma, p00 = 300.0, 0.0065, 1.0e5
    exponent = con.RDGAS * gamma / con.GRAV
    px = ((t00 - 9000.0 * gamma) / t00) ** (1.0 / exponent)
    dz = 12000.0 / npz
    ak = np.zeros(npz + 1)
    bk = np.zeros(npz + 1)
    for k in range(npz + 1):
        height = 12000.0 - dz * k
        zfac = ((t00 - height * gamma) / t00) ** (1.0 / exponent)
        if height >= 9000.0:
            ak[k] = p00 * zfac
            bk[k] = 0.0
        else:
            ak[k] = (zfac - 1.0) / (px - 1.0) * px * p00
            bk[k] = (zfac - px) / (1.0 - px)
    return ak, bk, float(ak[0])


def case52(geom, npz):
    """DCMIP 2.0 mountain-rest case (test_case 52, test_cases.F90:2514):
    isothermal-lapse atmosphere exactly at rest over a Schar-modulated
    cosine mountain at (270E, 0N). Any wind that develops is pressure
    -gradient discretization error — the PGF-error metric the reference CI
    tracks. Rotation is zeroed. Returns dict(delp, pt, u, v, w, delz,
    phis, ps, ak, bk, ptop, zero_rotation=True)."""
    n = geom.n
    t00, gamma, p00 = 300.0, 0.0065, 1.0e5
    exponent = con.RDGAS * gamma / con.GRAV
    ak, bk, ptop = case52_levels(npz)

    ai = geom.interior
    aglon, aglat = ai("aglon"), ai("aglat")
    r = _gc_dist(aglon, aglat, 3.0 * np.pi / 2.0, 0.0)
    r0 = 0.75 * np.pi
    zetam = np.pi / 16.0
    phis = np.where(
        r < r0,
        con.GRAV * 0.5 * 2000.0 * (1.0 + np.cos(np.pi * r / r0))
        * np.cos(np.pi * r / zetam) ** 2, 0.0)
    ps = p00 * (1.0 - gamma / t00 * phis / con.GRAV) ** (1.0 / exponent)

    pe = (ak[:, None, None, None]
          + bk[:, None, None, None] * ps[None]).transpose(1, 0, 2, 3)
    delp = pe[:, 1:] - pe[:, :-1]
    # analytic layer-mean temperature (test_cases.F90:2595)
    pt = (-con.GRAV * t00 * p00 / (con.RDGAS * gamma + con.GRAV) / delp
          * ((pe[:, :-1] / p00) ** (exponent + 1.0)
             - (pe[:, 1:] / p00) ** (exponent + 1.0)))
    delz = (con.RDGAS / con.GRAV * pt
            * np.log(pe[:, :-1] / np.maximum(pe[:, 1:], 1e-12)))
    u = np.zeros((6, npz, n + 1, n))
    v = np.zeros((6, npz, n, n + 1))
    w = np.zeros_like(delp)
    return dict(delp=delp, pt=pt, u=u, v=v, w=w, delz=delz,
                phis=phis[:, None], ps=ps, ak=ak, bk=bk, ptop=ptop,
                zero_rotation=True)
