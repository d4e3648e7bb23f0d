"""Grid generation and metric-term validation.

Mirrors the implicit invariants the reference asserts at init (printed
min/max/global-area checks in fv_grid_tools.F90 grid_area and
fv_grid_utils.F90 grid_utils_init)."""

import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu import constants as con
from gfdl_atmos_cubed_sphere_tpu.grid.gnomonic import (
    gnomonic_cube_corners, great_circle_angle)
from gfdl_atmos_cubed_sphere_tpu.grid.topology import CubeTopology, EDGES
from gfdl_atmos_cubed_sphere_tpu.grid.metrics import build_grid_geometry


@pytest.fixture(scope="module")
def geom():
    return build_grid_geometry(25)       # C24


def test_corners_on_sphere():
    c = gnomonic_cube_corners(13)
    assert np.allclose(np.linalg.norm(c, axis=-1), 1.0, atol=1e-14)


def test_all_contacts_found():
    topo = CubeTopology(gnomonic_cube_corners(13))
    assert len(topo.contacts) == 24
    n = topo.n
    # reciprocity: crossing an edge and coming back is the identity
    for (t, e), c in topo.contacts.items():
        # an on-edge point (depth 0)
        if e == "W":
            p = (n // 2, 0)
        elif e == "E":
            p = (n // 2, n)
        elif e == "S":
            p = (0, n // 2)
        else:
            p = (n, n // 2)
        p2 = c.apply(*p)
        # which edge of the neighbor is p2 on?
        cands = []
        if p2[1] == 0:
            cands.append("W")
        if p2[1] == n:
            cands.append("E")
        if p2[0] == 0:
            cands.append("S")
        if p2[0] == n:
            cands.append("N")
        ok = False
        for e2 in cands:
            c2 = topo.contacts[(c.tile, e2)]
            if c2.tile == t and c2.apply(*p2) == p:
                ok = True
        assert ok, (t, e, p, c.tile, p2)


def test_global_area(geom):
    ideal = 4.0 * np.pi * con.RADIUS ** 2
    assert abs(geom.global_area - ideal) / ideal < 1e-12


def test_area_ratio(geom):
    # gnomonic_ed property: max/min cell area ratio modest; dx ratio ~ sqrt(2)
    assert geom.da_max / geom.da_min < 2.5
    dx = geom.interior("dx")
    assert abs(dx.max() / dx.min() - np.sqrt(2.0)) < 0.02


def test_supergrid_angles(geom):
    s5 = geom.interior("sin_sg")[..., 4]
    assert s5.min() > 0.85 and s5.max() <= 1.0
    # orthogonal at face centers
    npx = geom.npx
    c5 = geom.interior("cos_sg")[..., 4]
    mid = (npx - 1) // 2
    # near-center cell (no cell is exactly at the face center for even n)
    assert abs(c5[0, mid, mid]) < 5e-3


def test_dual_area_consistency(geom):
    """Sum of dual-cell areas (counting shared edge/corner cells once)
    equals the sphere area."""
    ac = geom.interior("area_c")
    n = geom.n
    # interior B-points: counted once per tile; tile-edge points are shared by
    # 2 tiles (halved cells), cube corners by 3 tiles (each stores the full
    # triangle area). Build the unique sum:
    interior = ac[:, 1:n, 1:n].sum()
    edges = (ac[:, 0, 1:n].sum() + ac[:, n, 1:n].sum()
             + ac[:, 1:n, 0].sum() + ac[:, 1:n, n].sum()) / 2.0
    corners = (ac[:, 0, 0].sum() + ac[:, 0, n].sum()
               + ac[:, n, 0].sum() + ac[:, n, n].sum()) / 3.0
    total = interior + edges + corners
    ideal = 4.0 * np.pi * con.RADIUS ** 2
    # Not exact: FV3's tile-edge half-cells and cube-corner triangles are
    # symmetric approximations that do not exactly tile the sphere
    # (fv_grid_tools.F90:884-934, 2504-2585). O(1/n^2) defect expected.
    assert (ac > 0).all()
    assert abs(total - ideal) / ideal < 1e-3


def test_metric_halo_continuity(geom):
    """Padded dx halo strips must equal the neighbor's interior dx values
    (the two are gathered/computed independently)."""
    n, h = geom.n, geom.ng
    topo = geom.topology
    dx_int = geom.interior("dx")     # [6, n+1, n]
    # build expectation for tile 0 west halo row using the contact
    c = topo.contacts[(0, "W")]
    # local y-wall at (jc=row, i=-1): wall corners (jc,-1)->(jc,0)
    for jc in (1, n // 2):
        a = np.array(c.apply(jc, -1))
        b = np.array(c.apply(jc, 0))
        if a[1] != b[1]:       # neighbor y-wall
            val = dx_int[c.tile, a[0], min(a[1], b[1])]
        else:                  # neighbor x-wall -> dy
            val = geom.interior("dy")[c.tile, min(a[0], b[0]), a[1]]
        mine = geom.dx[0, h + jc, h - 1]
        assert abs(val - mine) / val < 1e-12


def test_edge_factors_symmetry(geom):
    # edge interpolation factors are symmetric about the edge midpoint
    ew = geom.edge_vect_w
    assert np.allclose(ew[0], ew[0][::-1], atol=1e-12)
    assert np.isfinite(geom.edge_w[:, 1:-1]).all()


def test_schmidt_stretched_grid():
    """Schmidt refinement (fv_grid_utils.F90 direct_transform:802): the
    transform is conformal (still tiles the sphere exactly), concentrates
    resolution by ~stretch_fac at the target point, and coarsens the
    antipode; cube_transform (:863) places the refinement likewise."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.grid.metrics import build_grid_geometry
    from gfdl_atmos_cubed_sphere_tpu.grid.gnomonic import lonlat_to_xyz
    import gfdl_atmos_cubed_sphere_tpu.constants as con

    npx, c = 25, 3.0
    tlon, tlat = np.pi, 0.6
    g0 = build_grid_geometry(npx)
    gs = build_grid_geometry(npx, stretch_fac=c, target_lon=tlon,
                             target_lat=tlat)
    # sphere coverage preserved
    area = gs.interior("area")
    np.testing.assert_allclose(np.nansum(area),
                               4.0 * np.pi * con.RADIUS ** 2, rtol=1e-9)
    # resolution enhanced ~c at the target, reduced ~c antipodally
    dx0 = np.asarray(g0.interior("dx"))
    dxs = np.asarray(gs.interior("dx"))
    r_min = np.nanmin(dxs) / np.nanmin(dx0)
    r_max = np.nanmax(dxs) / np.nanmax(dx0)
    assert 0.5 / c < r_min < 1.5 / c, r_min
    assert 0.6 * c < r_max < 1.6 * c, r_max
    # finest cells sit at the target point
    tgt = lonlat_to_xyz(tlon, tlat)
    cc = lonlat_to_xyz(gs.interior("aglon"), gs.interior("aglat"))
    d2 = np.sum((cc - tgt) ** 2, axis=-1)
    i_fine = np.unravel_index(np.nanargmin(np.asarray(gs.interior("dxa"))),
                              d2.shape)
    # C24 is coarse: nearest-to-target up to ~15 deg of center
    assert d2[i_fine] < 0.12, d2[i_fine]   # antipode would be ~4

    # revised transform also covers the sphere
    gr = build_grid_geometry(npx, stretch_fac=c, target_lon=tlon,
                             target_lat=tlat, do_cube_transform=True)
    np.testing.assert_allclose(np.nansum(gr.interior("area")),
                               4.0 * np.pi * con.RADIUS ** 2, rtol=1e-9)


def test_schmidt_namelist_plumbing():
    from gfdl_atmos_cubed_sphere_tpu.utils.config import (
        parse_namelist, grid_kwargs_from_namelist)
    nml = parse_namelist("""
&fv_core_nml
  npx = 97
  do_schmidt = .T.
  stretch_fac = 2.5
  target_lon = 262.4
  target_lat = 38.5
/
""")
    kw = grid_kwargs_from_namelist(nml)
    assert abs(kw["stretch_fac"] - 2.5) < 1e-12
    import math
    assert abs(kw["target_lat"] - math.radians(38.5)) < 1e-12
    assert not kw["do_cube_transform"]
