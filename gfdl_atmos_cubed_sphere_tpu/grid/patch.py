"""Bounded gnomonic patch grids: aligned nest / regional limited-area.

Two pieces:

1. `aligned_nest_corners` — generate the corner grid of a refined nest
   aligned to a parent cube face by spherical linear interpolation of the
   parent's corner points within parent cells, the reference's
   on-the-fly nest generation (/root/reference/tools/fv_grid_tools.F90
   setup_aligned_nest:1630, spherical_linear_interpolation loop
   :1718-1760). Refinement R = 1 with offsets cuts a limited-area
   (regional) patch of the parent grid itself.

2. `build_patch_geometry` — the full metric inventory for a single
   bounded face: the same interior formulas as grid/metrics.py
   (fv_grid_utils.F90 grid_utils_init) WITHOUT any cube-edge specials
   (no one-sided dxc/dyc doubling, no corner-area triangles, no
   rsina poisoning, no edge factors) — on a bounded domain every point
   is an interior point whose stencil sources live in the BC-filled
   halo ring (the reference's `bounded_domain` treatment, e.g.
   fv_grid_utils.F90:214-260 regional grid extension).

All host-side NumPy float64, cut to the stored halo ng = 3.
"""

import numpy as np

from .. import constants as con
from .gnomonic import normalize, xyz_to_lonlat, great_circle_angle
from .metrics import (GridGeometry, _mid, _cross, _dot, _cos_angle,
                      _quad_area, _unit_vect_latlon)

H = 3


def slerp_np(p0, p1, t):
    """Spherical linear interpolation between unit vectors (broadcasting);
    t scalar or array broadcastable to p0[..., 0]."""
    cosw = np.clip(np.sum(p0 * p1, axis=-1, keepdims=True), -1.0, 1.0)
    w = np.arccos(cosw)
    sw = np.sin(w)
    small = sw < 1.0e-12
    sw_safe = np.where(small, 1.0, sw)
    t = np.asarray(t)[..., None] if np.ndim(t) else t
    a = np.where(small, 1.0 - t, np.sin((1.0 - t) * w) / sw_safe)
    b = np.where(small, t, np.sin(t * w) / sw_safe)
    return normalize(a * p0 + b * p1)


def aligned_nest_corners(parent_geom, tile, refinement, ioffset, joffset,
                         npx_nest, npy_nest=None, halo_corners=None):
    """Corner grid [NYc, NXc, 3] of an aligned nest, including an extended
    ghost ring of `halo_corners` corners (default ng + 2, enough for the
    patch metric stencils).

    The nest covers parent cells [joffset, joffset + (npy_nest-1)/R) x
    [ioffset, ...) of `tile`; nest corner (i, j) (0-based, i in
    [-hc, npx_nest-1+hc]) sits at parent corner coordinate
    (ioffset + i/R, joffset + j/R), evaluated by slerp within the parent
    cell (y-direction first, then x — fv_grid_tools.F90:1722-1753).
    The whole extended region must lie inside the parent tile."""
    R = refinement
    npy_nest = npy_nest or npx_nest
    hc = H + 2 if halo_corners is None else halo_corners
    pg = parent_geom.arrays["grid_xyz"][tile]       # [NWp, NWp, 3] padded
    hp = parent_geom.ng                              # parent stored halo
    npp = parent_geom.npx                            # parent corners per side

    i_n = np.arange(-hc, npx_nest + hc)              # nest corner indices
    j_n = np.arange(-hc, npy_nest + hc)
    xi = ioffset + i_n / R                           # parent corner coords
    yj = joffset + j_n / R

    ic = np.floor(xi).astype(int)
    jc = np.floor(yj).astype(int)
    tx = xi - ic
    ty = yj - jc
    # clamp exact upper-boundary hits into the last cell
    ic = np.minimum(ic, npp - 2 + hp)
    jc = np.minimum(jc, npp - 2 + hp)
    if (ic.min() + hp < 0 or jc.min() + hp < 0
            or ic.max() + hp + 1 >= pg.shape[1]
            or jc.max() + hp + 1 >= pg.shape[0]):
        raise ValueError("nest + metric halo extends beyond the parent "
                         "tile's stored corner grid")

    # y-interpolation at the two bracketing parent corner columns
    q1 = slerp_np(pg[jc[:, None] + hp, ic[None, :] + hp],
                  pg[jc[:, None] + 1 + hp, ic[None, :] + hp], ty[:, None])
    q2 = slerp_np(pg[jc[:, None] + hp, ic[None, :] + 1 + hp],
                  pg[jc[:, None] + 1 + hp, ic[None, :] + 1 + hp], ty[:, None])
    out = slerp_np(q1, q2, tx[None, :])
    return out


def build_patch_geometry(corner_xyz, radius=con.RADIUS, omega=con.OMEGA,
                         coriolis_alpha=0.0, ng=H):
    """Metric inventory for one bounded gnomonic patch.

    corner_xyz: [NYc, NXc, 3] unit vectors for corners of cells
    [-hx, n + hx) with hx >= ng + 1 (aligned_nest_corners default);
    n = NXc - 1 - 2*hx interior cells per x row. Returns a GridGeometry
    with a leading tile axis of length 1 and arrays cropped to ng."""
    NYc, NXc = corner_xyz.shape[:2]
    # infer the generation halo hx from the array size relative to ng + 2
    # (aligned_nest_corners uses hc = ng + 2)
    hx = ng + 1
    hc = ng + 2
    g = corner_xyz[None]                            # [1, NYc, NXc, 3]
    nx = NXc - 1 - 2 * hc                           # interior cells
    ny = NYc - 1 - 2 * hc

    o = hc - hx
    ncpx = nx + 2 * hx + 1                          # corners incl. comp halo
    ncpy = ny + 2 * hx + 1

    def cg(dj, di, njj=None, nii=None):
        njj = ncpy if njj is None else njj
        nii = ncpx if nii is None else nii
        return g[:, o + dj:o + dj + njj, o + di:o + di + nii]

    err = np.seterr(all="ignore")
    nccx = ncpx - 1
    nccy = ncpy - 1

    c00 = cg(0, 0, nccy, nccx)
    c01 = cg(0, 1, nccy, nccx)
    c10 = cg(1, 0, nccy, nccx)
    c11 = cg(1, 1, nccy, nccx)
    agrid = normalize(c00 + c01 + c10 + c11)
    aglon, aglat = xyz_to_lonlat(agrid)
    R = radius

    dx = great_circle_angle(cg(0, 0, ncpy, nccx), cg(0, 1, ncpy, nccx)) * R
    dy = great_circle_angle(cg(0, 0, nccy, ncpx), cg(1, 0, nccy, ncpx)) * R

    mid_w = _mid(c00, c10)
    mid_e = _mid(c01, c11)
    mid_s = _mid(c00, c01)
    mid_n = _mid(c10, c11)
    dxa = great_circle_angle(mid_w, mid_e) * R
    dya = great_circle_angle(mid_s, mid_n) * R

    # C-grid center-to-center spacings: interior formula everywhere,
    # outermost wall edge-clamped (consistent with halo-data quality)
    dxc = np.empty((1, nccy, ncpx))
    dxc[:, :, 1:-1] = great_circle_angle(agrid[:, :, :-1], agrid[:, :, 1:]) * R
    dxc[:, :, 0] = dxc[:, :, 1]
    dxc[:, :, -1] = dxc[:, :, -2]
    dyc = np.empty((1, ncpy, nccx))
    dyc[:, 1:-1, :] = great_circle_angle(agrid[:, :-1, :], agrid[:, 1:, :]) * R
    dyc[:, 0, :] = dyc[:, 1, :]
    dyc[:, -1, :] = dyc[:, -2, :]

    area = _quad_area(c00, c01, c11, c10) * R * R
    area_c = np.empty((1, ncpy, ncpx))
    area_c[:, 1:-1, 1:-1] = _quad_area(
        agrid[:, :-1, :-1], agrid[:, :-1, 1:],
        agrid[:, 1:, 1:], agrid[:, 1:, :-1]) * R * R
    area_c[:, 0, :] = area_c[:, 1, :]
    area_c[:, -1, :] = area_c[:, -2, :]
    area_c[:, :, 0] = area_c[:, :, 1]
    area_c[:, :, -1] = area_c[:, :, -2]

    cos_sg = np.empty((1, nccy, nccx, 9))
    cos_sg[..., 5] = _cos_angle(c00, c01, c10)
    cos_sg[..., 6] = -_cos_angle(c01, c00, c11)
    cos_sg[..., 7] = _cos_angle(c11, c01, c10)
    cos_sg[..., 8] = -_cos_angle(c10, c00, c11)
    cos_sg[..., 0] = _cos_angle(mid_w, agrid, c10)
    cos_sg[..., 1] = _cos_angle(mid_s, c01, agrid)
    cos_sg[..., 2] = _cos_angle(mid_e, agrid, c01)
    cos_sg[..., 3] = _cos_angle(mid_n, c10, agrid)
    p3v = _cross(mid_e, mid_w)
    ec1 = normalize(_cross(agrid, p3v))
    p3v = _cross(mid_n, mid_s)
    ec2 = normalize(_cross(agrid, p3v))
    cos_sg[..., 4] = _dot(ec1, ec2)
    sin_sg = np.minimum(1.0, np.sqrt(np.maximum(0.0, 1.0 - cos_sg ** 2)))

    TINY = 1.0e-25
    cosa = np.empty((1, ncpy, ncpx))
    sina = np.empty((1, ncpy, ncpx))
    cosa[:, 1:-1, 1:-1] = 0.5 * (cos_sg[:, :-1, :-1, 7] + cos_sg[:, 1:, 1:, 5])
    sina[:, 1:-1, 1:-1] = 0.5 * (sin_sg[:, :-1, :-1, 7] + sin_sg[:, 1:, 1:, 5])
    for a2, fill in ((cosa, 0.0), (sina, 1.0)):
        a2[:, 0, :] = a2[:, 1, :]
        a2[:, -1, :] = a2[:, -2, :]
        a2[:, :, 0] = a2[:, :, 1]
        a2[:, :, -1] = a2[:, :, -2]
    rsina = 1.0 / np.maximum(TINY, sina ** 2)

    cosa_u = np.empty((1, nccy, ncpx))
    sina_u = np.empty((1, nccy, ncpx))
    cosa_u[:, :, 1:-1] = 0.5 * (cos_sg[:, :, :-1, 2] + cos_sg[:, :, 1:, 0])
    sina_u[:, :, 1:-1] = 0.5 * (sin_sg[:, :, :-1, 2] + sin_sg[:, :, 1:, 0])
    cosa_u[:, :, 0] = cosa_u[:, :, 1]
    cosa_u[:, :, -1] = cosa_u[:, :, -2]
    sina_u[:, :, 0] = sina_u[:, :, 1]
    sina_u[:, :, -1] = sina_u[:, :, -2]
    rsin_u = 1.0 / np.maximum(TINY, sina_u ** 2)
    cosa_v = np.empty((1, ncpy, nccx))
    sina_v = np.empty((1, ncpy, nccx))
    cosa_v[:, 1:-1, :] = 0.5 * (cos_sg[:, :-1, :, 3] + cos_sg[:, 1:, :, 1])
    sina_v[:, 1:-1, :] = 0.5 * (sin_sg[:, :-1, :, 3] + sin_sg[:, 1:, :, 1])
    cosa_v[:, 0, :] = cosa_v[:, 1, :]
    cosa_v[:, -1, :] = cosa_v[:, -2, :]
    sina_v[:, 0, :] = sina_v[:, 1, :]
    sina_v[:, -1, :] = sina_v[:, -2, :]
    rsin_v = 1.0 / np.maximum(TINY, sina_v ** 2)

    cosa_s = cos_sg[..., 4].copy()
    rsin2 = 1.0 / np.maximum(TINY, sin_sg[..., 4] ** 2)

    divg_u = sina_v * dyc / dx
    del6_u = sina_v * dx / dyc
    divg_v = sina_u * dxc / dy
    del6_v = sina_u * dy / dxc

    vlon, vlat = _unit_vect_latlon(aglon, aglat)
    z11 = _dot(ec1, vlon)
    z12 = _dot(ec1, vlat)
    z21 = _dot(ec2, vlon)
    z22 = _dot(ec2, vlat)
    sin5 = np.maximum(TINY, sin_sg[..., 4])
    a11 = 0.5 * z22 / sin5
    a12 = -0.5 * z12 / sin5
    a21 = -0.5 * z21 / sin5
    a22 = 0.5 * z11 / sin5

    # wall midpoints + unit vectors for wind projection (ee1/ee2/ew/es)
    wallx_mid = _mid(cg(0, 0, nccy, ncpx), cg(1, 0, nccy, ncpx))
    ew = np.empty((1, nccy, ncpx, 2, 3))
    p2i = np.empty((1, nccy, ncpx, 3))
    p2i[:, :, 1:-1] = _cross(agrid[:, :, :-1], agrid[:, :, 1:])
    p2i[:, :, 0] = p2i[:, :, 1]
    p2i[:, :, -1] = p2i[:, :, -2]
    ew[..., 0, :] = normalize(_cross(p2i, wallx_mid))
    p1i = _cross(cg(0, 0, nccy, ncpx), cg(1, 0, nccy, ncpx))
    ew[..., 1, :] = normalize(_cross(p1i, wallx_mid))
    wally_mid = _mid(cg(0, 0, ncpy, nccx), cg(0, 1, ncpy, nccx))
    es = np.empty((1, ncpy, nccx, 2, 3))
    p2i = np.empty((1, ncpy, nccx, 3))
    p2i[:, 1:-1, :] = _cross(agrid[:, :-1, :], agrid[:, 1:, :])
    p2i[:, 0, :] = p2i[:, 1, :]
    p2i[:, -1, :] = p2i[:, -2, :]
    es[..., 1, :] = normalize(_cross(p2i, wally_mid))
    p1i = _cross(cg(0, 0, ncpy, nccx), cg(0, 1, ncpy, nccx))
    es[..., 0, :] = normalize(_cross(p1i, wally_mid))

    gcp = cg(0, 0, ncpy, ncpx)
    ee1 = np.empty((1, ncpy, ncpx, 3))
    ee2 = np.empty((1, ncpy, ncpx, 3))
    pp = np.empty_like(ee1)
    pp[:, :, 1:-1] = _cross(cg(0, -1, ncpy, ncpx - 2), cg(0, 1, ncpy, ncpx - 2))
    pp[:, :, 0] = pp[:, :, 1]
    pp[:, :, -1] = pp[:, :, -2]
    ee1[:] = normalize(_cross(pp, gcp))
    pp[:, 1:-1, :] = _cross(cg(-1, 0, ncpy - 2, ncpx), cg(1, 0, ncpy - 2, ncpx))
    pp[:, 0, :] = pp[:, 1, :]
    pp[:, -1, :] = pp[:, -2, :]
    ee2[:] = normalize(_cross(pp, gcp))
    en1 = normalize(_cross(cg(0, 0, ncpy, nccx), cg(0, 1, ncpy, nccx)))
    en2 = normalize(_cross(cg(1, 0, nccy, ncpx), cg(0, 0, nccy, ncpx)))

    exw, _ = _unit_vect_latlon(*xyz_to_lonlat(wallx_mid))

    def unit_vect2(p1, p2):
        pcm = _mid(p1, p2)
        p3 = _cross(p2, p1)
        return normalize(_cross(pcm, p3))
    latm = xyz_to_lonlat(wallx_mid)[1]
    l2c_v = np.cos(latm) * _dot(
        unit_vect2(cg(0, 0, nccy, ncpx), cg(1, 0, nccy, ncpx)), exw)
    exs, _ = _unit_vect_latlon(*xyz_to_lonlat(wally_mid))
    lats = xyz_to_lonlat(wally_mid)[1]
    l2c_u = np.cos(lats) * _dot(
        unit_vect2(cg(0, 0, ncpy, nccx), cg(0, 1, ncpy, nccx)), exs)

    glon, glat = xyz_to_lonlat(gcp)
    fC = 2.0 * omega * (-np.cos(glon) * np.cos(glat) * np.sin(coriolis_alpha)
                        + np.sin(glat) * np.cos(coriolis_alpha))
    f0 = 2.0 * omega * (-np.cos(aglon) * np.cos(aglat) * np.sin(coriolis_alpha)
                        + np.sin(aglat) * np.cos(coriolis_alpha))
    np.seterr(**err)

    d = hx - ng
    NCy, NCx = ny + 2 * ng, nx + 2 * ng

    def crop(a, jn, inn):
        return a[:, d:d + jn, d:d + inn]

    cellc = lambda a: crop(a, NCy, NCx)
    cornc = lambda a: crop(a, NCy + 1, NCx + 1)
    ywallc = lambda a: crop(a, NCy + 1, NCx)
    xwallc = lambda a: crop(a, NCy, NCx + 1)

    arrays = dict(
        grid_xyz=cornc(gcp), agrid_xyz=cellc(agrid),
        lon=cornc(glon), lat=cornc(glat),
        aglon=cellc(aglon), aglat=cellc(aglat),
        dx=ywallc(dx), dy=xwallc(dy), dxa=cellc(dxa), dya=cellc(dya),
        dxc=xwallc(dxc), dyc=ywallc(dyc),
        area=cellc(area), area_c=cornc(area_c),
        cos_sg=cellc(cos_sg), sin_sg=cellc(sin_sg),
        cosa=cornc(cosa), sina=cornc(sina), rsina=cornc(rsina),
        cosa_u=xwallc(cosa_u), sina_u=xwallc(sina_u), rsin_u=xwallc(rsin_u),
        cosa_v=ywallc(cosa_v), sina_v=ywallc(sina_v), rsin_v=ywallc(rsin_v),
        cosa_s=cellc(cosa_s), rsin2=cellc(rsin2),
        ec1=cellc(ec1), ec2=cellc(ec2),
        ew=xwallc(ew), es=ywallc(es),
        ee1=cornc(ee1), ee2=cornc(ee2),
        en1=ywallc(en1), en2=xwallc(en2),
        divg_u=ywallc(divg_u), divg_v=xwallc(divg_v),
        del6_u=ywallc(del6_u), del6_v=xwallc(del6_v),
        z11=cellc(z11), z12=cellc(z12), z21=cellc(z21), z22=cellc(z22),
        a11=cellc(a11), a12=cellc(a12), a21=cellc(a21), a22=cellc(a22),
        vlon=cellc(vlon), vlat=cellc(vlat),
        l2c_u=ywallc(l2c_u), l2c_v=xwallc(l2c_v),
        fC=cornc(fC), f0=cellc(f0),
    )
    for nm, rec in (("dx", "rdx"), ("dy", "rdy"), ("dxa", "rdxa"),
                    ("dya", "rdya"), ("dxc", "rdxc"), ("dyc", "rdyc"),
                    ("area", "rarea"), ("area_c", "rarea_c")):
        arrays[rec] = 1.0 / arrays[nm]

    if nx != ny:
        raise NotImplementedError("square patches only for now (n = nx = ny)")
    geom = GridGeometry(npx=nx + 1, n=nx, ng=ng, radius=radius, omega=omega,
                        topology=None, arrays=arrays)
    ai = geom.interior("area")
    geom.da_min, geom.da_max = float(ai.min()), float(ai.max())
    aci = arrays["area_c"][:, ng + 1:-ng - 1, ng + 1:-ng - 1]
    geom.da_min_c, geom.da_max_c = float(aci.min()), float(aci.max())
    geom.global_area = float(ai.sum())
    return geom
