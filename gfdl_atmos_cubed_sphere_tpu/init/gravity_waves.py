"""Gravity-wave / mountain-wave idealized cases (component #23 tail).

Host-side f64 transcriptions of /root/reference/tools/test_cases.F90:
  case 15/19 non-hydrostatic density current      (:1901-1996)
  case 16    non-rotating hydrostatic gravity wave (:1997-2069)
  case 17    rotating inertia-gravity wave         (:2070-2136)
  case 18    mountain-induced Rossby wave          (:2137-2190)
  cases 33/34/35 HIWPP Schar mountain waves        (:2757-2985)
and the vertical setup gw_1d (/root/reference/tools/fv_eta.F90:2350).

Cases 20/21 (lee vortices) and 32 (straight-hodograph supercell) raise:
20/21 are hybrid_z-only in the reference (FATAL otherwise,
test_cases.F90:2304) and 32 is unimplemented upstream
("test_case 32 not yet implemented", :2752).
"""

import numpy as np

from .. import constants as con
from .sw_cases import _project_dgrid, _k1, _unit_vect2
from ..grid.gnomonic import xyz_to_lonlat, normalize

H = 3


def _cut2(a, geom, kind="cell"):
    """Interior slice over the LAST two axes (works for [T,K,NY,NX])."""
    n = geom.n
    ju = n + (1 if kind == "u" else 0)
    iu = n + (1 if kind == "v" else 0)
    return a[..., H:H + ju, H:H + iu]


def gw_1d(npz, p00=1.0e5, ztop=10.0e3):
    """Constant-dz vertical setup for the gravity-wave cases
    (fv_eta.F90 gw_1d:2350): N^2 = 1e-4 reference profile. Returns
    (ak, bk, ptop, ppt) with ppt the layer-mean potential temperature
    from the hydrostatic relation."""
    kappa = con.KAPPA
    t0 = 300.0
    n2 = 1.0e-4
    s0 = con.GRAV * con.GRAV / (con.CP_AIR * n2)
    ze = np.linspace(ztop, 0.0, npz + 1)
    dz1 = ztop / npz
    pe1 = p00 * ((1.0 - s0 / t0)
                 + s0 / t0 * np.exp(-n2 * ze / con.GRAV)) ** (1.0 / kappa)
    ptop = float(pe1[0])
    ak = np.zeros(npz + 1)
    bk = np.zeros(npz + 1)
    ak[0] = pe1[0]
    bk[1:npz] = (pe1[1:npz] - pe1[0]) / (pe1[npz] - pe1[0])
    ak[1:npz] = pe1[0] * (1.0 - bk[1:npz])
    ak[npz] = 0.0
    bk[npz] = 1.0
    pk1 = pe1 ** kappa
    ppt = con.GRAV * dz1 / (con.CP_AIR * (pk1[1:] - pk1[:-1]))
    return ak, bk, ptop, ppt


def _gw_case(geom, npz, center_lat):
    """Shared body of cases 16/17 (only the bell center and rotation
    differ): hydrostatic gravity wave from a cos-bell theta
    perturbation (test_cases.F90:1997-2136)."""
    kappa = con.KAPPA
    p00 = 1.0e5
    ztop = 10.0e3
    ak, bk, ptop, ppt = gw_1d(npz, p00, ztop)
    pe1 = ak + bk * p00
    ze = np.linspace(ztop, 0.0, npz + 1)

    lam = geom.arrays["aglon"]
    th = geom.arrays["aglat"]
    # cosine bell of radius a/3 at (pi, center_lat)
    c0 = np.stack([np.cos(center_lat) * np.cos(np.pi),
                   np.cos(center_lat) * np.sin(np.pi),
                   np.sin(center_lat)])
    pa = np.stack([np.cos(th) * np.cos(lam), np.cos(th) * np.sin(lam),
                   np.sin(th)], axis=-1)
    r = geom.radius * np.arccos(np.clip(np.sum(pa * c0, -1), -1.0, 1.0))
    r0 = geom.radius / 3.0
    bell = np.where(r < r0, 0.5 * (1.0 + np.cos(np.pi * r / r0)), 0.0)

    peln1 = np.log(pe1)
    pk1 = np.exp(kappa * peln1)
    pkz1 = (pk1[1:] - pk1[:-1]) / (kappa * (peln1[1:] - peln1[:-1]))
    pturb = 10.0 / p00 ** kappa
    zmid = np.sin(0.5 * (ze[:-1] + ze[1:]) * np.pi / ztop)

    n = geom.n
    T = bell.shape[0]
    delp = np.broadcast_to(np.diff(pe1)[None, :, None, None],
                           (T, npz, bell.shape[1], bell.shape[2]))
    theta = (ppt[None, :, None, None]
             + pturb * bell[:, None] * zmid[None, :, None, None])
    pt = theta * pkz1[None, :, None, None]
    q1 = bell[:, None] * zmid[None, :, None, None]

    out = dict(
        delp=_cut2(np.nan_to_num(delp), geom, "cell")[:, :],
        pt=_cut2(np.nan_to_num(pt), geom, "cell"),
        u=np.zeros((T, npz, n + 1, n)),
        v=np.zeros((T, npz, n, n + 1)),
        phis=_k1(np.zeros_like(_cut2(bell, geom, "cell"))),
        q1=_cut2(np.nan_to_num(q1), geom, "cell"),
        ak=ak, bk=bk, ptop=ptop)
    out["w"] = np.zeros_like(out["delp"])
    dlnp = (peln1[1:] - peln1[:-1])[None, :, None, None]
    out["delz"] = -con.RDGAS * out["pt"] / con.GRAV * dlnp
    return out


def case16(geom, npz):
    """Non-rotating 3-D hydrostatic gravity wave (test_cases.F90:1997):
    bell at the equator; run with the planetary rotation zeroed
    (f0 = fC = 0 — use a geom built with omega=0 or ignore Coriolis for
    short integrations)."""
    return _gw_case(geom, npz, 0.0)


def case17(geom, npz):
    """Rotating inertia-gravity wave (DCMIP 6-3-0, test_cases.F90:2070):
    bell at 45N, planetary rotation retained."""
    return _gw_case(geom, npz, np.pi / 4.0)


def case18(geom, npz, ak, bk):
    """Mountain-induced Rossby wave train (test_cases.F90:2137):
    isothermal T=288 K atmosphere, 2-km Gaussian mountain at (90E, 30N),
    balanced surface pressure, ubar = 20 m/s zonal flow."""
    ubar = 20.0
    pt0 = 288.0
    n2 = con.GRAV ** 2 / (con.CP_AIR * pt0)
    R = geom.radius
    omg = geom.omega
    lam = geom.arrays["aglon"]
    th = geom.arrays["aglat"]
    c0 = np.stack([np.cos(np.pi / 6.0) * np.cos(np.pi / 2.0),
                   np.cos(np.pi / 6.0) * np.sin(np.pi / 2.0),
                   np.sin(np.pi / 6.0)])
    pa = np.stack([np.cos(th) * np.cos(lam), np.cos(th) * np.sin(lam),
                   np.sin(th)], axis=-1)
    r = R * np.arccos(np.clip(np.sum(pa * c0, -1), -1.0, 1.0))
    phis = con.GRAV * 2.0e3 * np.exp(-(r / 1500.0e3) ** 2)
    ps = 930.0e2 * np.exp(
        -R * n2 * ubar / (2.0 * con.GRAV ** 2 * con.KAPPA)
        * (ubar / R + 2.0 * omg) * (np.sin(th) ** 2 - 1.0)
        - n2 / (con.GRAV ** 2 * con.KAPPA) * phis)
    dak = np.diff(np.asarray(ak))[None, :, None, None]
    dbk = np.diff(np.asarray(bk))[None, :, None, None]
    delp = dak + ps[:, None] * dbk
    pt = np.full_like(delp, pt0)
    u, v = _project_dgrid(lambda lon, lat: (ubar * np.cos(lat),
                                            0.0 * lat), geom)
    npz_ = delp.shape[1]
    ui = _cut2(u, geom, "u")
    vi = _cut2(v, geom, "v")
    return dict(
        delp=_cut2(np.nan_to_num(delp), geom, "cell"),
        pt=_cut2(pt, geom, "cell"),
        u=np.broadcast_to(ui[:, None], (ui.shape[0], npz_) + ui.shape[1:]),
        v=np.broadcast_to(vi[:, None], (vi.shape[0], npz_) + vi.shape[1:]),
        phis=_k1(_cut2(np.nan_to_num(phis), geom, "cell")),
        ptop=float(np.asarray(ak)[0]))


def density_current(geom, npz, rotating=False):
    """Cases 15/19: small-earth non-hydrostatic density current
    (test_cases.F90:1901): isothermal-theta atmosphere on constant-dz
    levels with a -15 K cos-bell theta perturbation centered 3.2 km
    above the surface at (180E, 0N). Case 19 = case 15 without rotation
    (run on a geom with omega=0). Intended for a small-earth geom
    (radius scaled; reference control is 100-m dx)."""
    kappa = con.KAPPA
    t00, p00 = 300.0, 1.0e5
    pk0 = p00 ** kappa
    ztop = 6.4e3
    ze1 = np.zeros(npz + 1)
    ze1[npz] = 0.0
    for k in range(npz - 1, 0, -1):
        ze1[k] = ze1[k + 1] + ztop / npz
    ze1[0] = ztop + 1.5 * ztop / npz

    # isothermal-theta hydrostatic pk profile, bottom-up
    pk1 = np.zeros(npz + 1)
    pk1[npz] = pk0
    delz1 = ze1[1:] - ze1[:-1]
    for k in range(npz - 1, -1, -1):
        pk1[k] = pk1[k + 1] + con.GRAV * delz1[k] / (con.CP_AIR * t00) * pk0
    pe1 = pk1 ** (1.0 / kappa)
    ptop = float(pe1[0])
    peln1 = np.log(pe1)
    pkz1 = (pk1[1:] - pk1[:-1]) / (kappa * (peln1[1:] - peln1[:-1]))

    lam = geom.arrays["aglon"]
    th = geom.arrays["aglat"]
    c0 = np.stack([np.cos(0.0) * np.cos(np.pi), np.cos(0.0) * np.sin(np.pi),
                   np.sin(0.0)])
    pa = np.stack([np.cos(th) * np.cos(lam), np.cos(th) * np.sin(lam),
                   np.sin(th)], axis=-1)
    r = geom.radius * np.arccos(np.clip(np.sum(pa * c0, -1), -1.0, 1.0))

    pturb = 15.0
    zmid = 0.5 * (ze1[:-1] + ze1[1:])
    r0 = (zmid - 3.2e3)[None, :, None, None]
    dist = np.sqrt(r[:, None] ** 2 + r0 ** 2) / 3.2e3
    bump = np.where(dist <= 1.0, (np.cos(np.pi * dist) + 1.0) / 2.0, 0.0)
    theta = t00 / pk0 - pturb / pkz1[None, :, None, None] * bump
    pt = theta * pkz1[None, :, None, None]
    q1 = pk0 * pturb / pkz1[None, :, None, None] * bump

    T = lam.shape[0]
    shp = (T, npz) + lam.shape[1:]
    delp = np.broadcast_to(np.diff(pe1)[None, :, None, None], shp)
    delz = np.broadcast_to(delz1[None, :, None, None], shp)
    n = geom.n
    # fake sigma coordinate from the 1-D profile (ps == p00 everywhere)
    ak = np.zeros(npz + 1)
    bk = np.zeros(npz + 1)
    ak[0] = pe1[0]
    bk[1:npz] = (pe1[1:npz] - pe1[0]) / (pe1[npz] - pe1[0])
    ak[1:npz] = pe1[0] * (1.0 - bk[1:npz])
    ak[npz] = 0.0
    bk[npz] = 1.0
    return dict(
        delp=_cut2(np.nan_to_num(delp), geom, "cell"),
        pt=_cut2(np.nan_to_num(pt), geom, "cell"),
        w=np.zeros((T, npz, n, n)),
        delz=_cut2(np.nan_to_num(delz), geom, "cell"),
        u=np.zeros((T, npz, n + 1, n)),
        v=np.zeros((T, npz, n, n + 1)),
        phis=_k1(np.zeros((T,) + lam.shape[1:]))[..., H:H + n, H:H + n],
        q1=_cut2(np.nan_to_num(q1), geom, "cell"),
        ak=ak, bk=bk, ptop=ptop)


def schar_mountain(geom, npz, ak, bk, variant=34):
    """HIWPP Schar mountain-wave cases 33/34/35 (test_cases.F90:2757):
    33 = NCAR ridge mountain, 34 = circular mountain, 35 = circular
    mountain with vertically sheared flow (cs_m3 = 2.5e-4). Isothermal
    T=300 K (lat-modulated for 35), us0 = 20 m/s, h0 = 250 m mountain at
    (60E, 0N), DCMIP Eq(33) surface pressure. Non-rotating (run with a
    zero-omega geom). Returns NH state (delp, pt, u, v, w, delz, phis)."""
    if variant not in (33, 34, 35):
        raise ValueError(variant)
    kappa = con.KAPPA
    p00, t00, us0, h0 = 1.0e5, 300.0, 20.0, 250.0
    cs_m3 = 2.5e-4 if variant == 35 else 0.0
    R = geom.radius
    lam = geom.arrays["aglon"]
    th = geom.arrays["aglat"]
    lam0 = 60.0 / 180.0 * np.pi

    if variant == 33:
        # ridge mountain: function of zonal distance only
        rr = R * (lam - lam0)
        phis = (con.GRAV * h0 * np.cos(th) * np.exp(-(rr / 5.0e3) ** 2)
                * np.cos(np.pi * rr / 4.0e3) ** 2)
    else:
        c0 = np.stack([np.cos(0.0) * np.cos(lam0),
                       np.cos(0.0) * np.sin(lam0), np.sin(0.0)])
        pa = np.stack([np.cos(th) * np.cos(lam), np.cos(th) * np.sin(lam),
                       np.sin(th)], axis=-1)
        rr = R * np.arccos(np.clip(np.sum(pa * c0, -1), -1.0, 1.0))
        phis = (con.GRAV * h0 * np.exp(-(rr / 5.0e3) ** 2)
                * np.cos(np.pi * rr / 4.0e3) ** 2)
    phis = np.nan_to_num(phis)

    if variant == 35:
        ptm = t00 * np.exp(-cs_m3 / con.GRAV * (us0 * np.sin(th)) ** 2)
    else:
        ptm = np.full_like(th, t00)
    ps = p00 * np.exp(-0.5 * (us0 * np.sin(th)) ** 2 / (con.RDGAS * t00)
                      - phis / (con.RDGAS * ptm))

    akv = np.asarray(ak)
    bkv = np.asarray(bk)
    pe = akv[None, :, None, None] + ps[:, None] * bkv[None, :, None, None]
    peln = np.log(pe)
    delp = pe[:, 1:] - pe[:, :-1]
    pt = np.broadcast_to(ptm[:, None], delp.shape)
    delz = con.RDGAS / con.GRAV * pt * (peln[:, :-1] - peln[:, 1:])

    # mid-level heights for the sheared-wind case
    zsfc = phis / con.GRAV
    zint = np.concatenate(
        [zsfc[:, None] - np.cumsum(delz[:, ::-1], axis=1)[:, ::-1],
         zsfc[:, None, :, :]], axis=1)
    zmid = 0.5 * (zint[:, :-1] + zint[:, 1:])

    # D-grid winds: us0*cos(lat)*sqrt(1 + cs_m3*(z(i,j-1)+z(i,j)))
    pu, pv = _project_dgrid(lambda lon, lat: (np.cos(lat), 0.0 * lat), geom)
    # j-wall mid heights: average of adjacent cell rows (edge-clamped)
    zpad_j = np.concatenate([zmid[..., :1, :], zmid, zmid[..., -1:, :]], -2)
    z_u = 0.5 * (zpad_j[..., :-1, :] + zpad_j[..., 1:, :])
    zpad_i = np.concatenate([zmid[..., :, :1], zmid, zmid[..., :, -1:]], -1)
    z_v = 0.5 * (zpad_i[..., :, :-1] + zpad_i[..., :, 1:])
    u = us0 * pu[:, None] * np.sqrt(1.0 + cs_m3 * 2.0 * z_u)
    v = us0 * pv[:, None] * np.sqrt(1.0 + cs_m3 * 2.0 * z_v)

    n = geom.n
    cut = lambda a, kind: a[..., H:H + n + (1 if kind == "u" else 0),
                            H:H + n + (1 if kind == "v" else 0)]
    out = dict(
        delp=np.nan_to_num(cut(delp, "cell")),
        pt=np.nan_to_num(cut(pt, "cell")),
        delz=np.nan_to_num(cut(delz, "cell")),
        u=np.nan_to_num(cut(u, "u")),
        v=np.nan_to_num(cut(v, "v")),
        phis=_k1(np.nan_to_num(phis))[..., H:H + n, H:H + n],
        ptop=float(akv[0]))
    out["w"] = np.zeros_like(out["delp"])
    return out


def case20_21(*args, **kwargs):
    """Lee vortices (cases 20/21, test_cases.F90:2191): hybrid_z-only in
    the reference ('This test case is only currently setup for hybrid_z',
    :2304); the hybrid-z coordinate is declared unsupported
    (utils/config.py)."""
    raise NotImplementedError(
        "cases 20/21 (lee vortices) require the hybrid_z coordinate; the "
        "reference FATALs without it (test_cases.F90:2304)")


def case32(*args, **kwargs):
    """Straight-hodograph supercell: unimplemented in the reference too
    ('test_case 32 not yet implemented', test_cases.F90:2752)."""
    raise NotImplementedError(
        "case 32 is not implemented in the 202411 reference "
        "(test_cases.F90:2752)")
