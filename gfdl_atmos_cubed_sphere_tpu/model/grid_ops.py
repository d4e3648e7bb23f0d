"""Device-side grid operator pack.

Bridges the host-side f64 metric precompute (grid/metrics.py, the analog of
fv_grid_utils.F90 grid_utils_init) to the jitted kernels: casts every metric
array to the working dtype, splits the 9-component supergrid trig factors into
separate arrays, inserts a broadcast axis for the level dimension, and
precomputes the a2b_ord4 cube-corner extrapolation weights
(a2b_edge.F90:449-461 extrap_corner distances).

Field layout everywhere: [6, npz, y, x]; metrics [6, 1, y, x].
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from ..grid.metrics import GridGeometry, build_grid_geometry
from ..grid.gnomonic import great_circle_angle
from ..parallel.halo import HaloExchanger
from ..ops.a2b_edge import corner_legs

H = 3


def _w(arr, dtype):
    """Metric [6, ...] -> jnp [6, 1, ...] in working dtype."""
    return jnp.asarray(np.asarray(arr)[:, None], dtype=dtype)


def build_grid_ops(npx, dtype=jnp.float32, geom: GridGeometry = None,
                   coriolis_alpha=0.0, radius=None, omega=None,
                   stretch_fac=None, target_lon=0.0, target_lat=0.0,
                   do_cube_transform=False):
    """Build the metric namespace `g` + halo exchanger for a cube of npx
    corners. stretch_fac et al.: Schmidt refinement (see
    grid.metrics.build_grid_geometry)."""
    kw = {}
    if radius is not None:
        kw["radius"] = radius
    if omega is not None:
        kw["omega"] = omega
    if stretch_fac is not None:
        kw.update(stretch_fac=stretch_fac, target_lon=target_lon,
                  target_lat=target_lat, do_cube_transform=do_cube_transform)
    if geom is None:
        geom = build_grid_geometry(npx, ng=H, coriolis_alpha=coriolis_alpha, **kw)
    n = geom.n
    a = geom.arrays

    g = SimpleNamespace()
    g.npx = npx
    g.n = n
    g.geom = geom
    g.dtype = dtype
    g.halo = HaloExchanger(geom.topology, H)

    for name in ("dx", "dy", "dxa", "dya", "dxc", "dyc",
                 "rdx", "rdy", "rdxa", "rdya", "rdxc", "rdyc",
                 "area", "rarea", "area_c", "rarea_c",
                 "cosa", "sina", "rsina", "cosa_u", "sina_u", "rsin_u",
                 "cosa_v", "sina_v", "rsin_v", "cosa_s", "rsin2",
                 "divg_u", "divg_v", "del6_u", "del6_v",
                 "a11", "a12", "a21", "a22", "z11", "z12", "z21", "z22",
                 "l2c_u", "l2c_v", "fC", "f0"):
        setattr(g, name, _w(a[name], dtype))

    for c in range(9):
        setattr(g, f"sin_sg{c + 1}", _w(a["sin_sg"][..., c], dtype))
        setattr(g, f"cos_sg{c + 1}", _w(a["cos_sg"][..., c], dtype))

    for name in ("edge_w", "edge_e", "edge_s", "edge_n",
                 "edge_vect_w", "edge_vect_e", "edge_vect_s", "edge_vect_n"):
        setattr(g, name, _w(a[name], dtype))

    g.da_min = dtype.type(geom.da_min) if hasattr(dtype, "type") else geom.da_min
    g.da_min = jnp.asarray(geom.da_min, dtype)
    g.da_max = jnp.asarray(geom.da_max, dtype)
    g.da_min_c = jnp.asarray(geom.da_min_c, dtype)
    g.da_max_c = jnp.asarray(geom.da_max_c, dtype)
    g.global_area = float(geom.global_area)

    # ---- a2b_ord4 corner extrapolation weights x1/(x2-x1) ----------------
    agrid = a["agrid_xyz"]          # [6, NC, NC, 3] halo-padded cells
    grid = a["grid_xyz"]            # [6, NW, NW, 3]
    f = lambda i: i - 1 + H
    targets = {"sw": (1, 1), "se": (1, npx), "ne": (npx, npx), "nw": (npx, 1)}
    legs = corner_legs(npx)
    w = np.zeros((6, 4, 3))
    for ci, name in enumerate(("sw", "se", "ne", "nw")):
        tj, ti = targets[name]
        p0 = grid[:, f(tj), f(ti)]
        for li, (j1, i1, j2, i2) in enumerate(legs[name]):
            p1 = agrid[:, f(j1), f(i1)]
            p2 = agrid[:, f(j2), f(i2)]
            x1 = great_circle_angle(p1, p0)
            x2 = great_circle_angle(p2, p0)
            w[:, ci, li] = x1 / (x2 - x1)
    g.a2b_corner_w = jnp.asarray(w[:, None], dtype)

    return g


def build_grid_ops_patch(geom, dtype=jnp.float32):
    """Metric pack for a bounded gnomonic patch (nested / regional grid,
    grid.patch.build_patch_geometry). Same array inventory as
    build_grid_ops minus the cube-edge factors (no one-sided stencils on a
    bounded domain); g.bounded = True routes every kernel through its
    regular-stencil (`bounded_domain`) path and g.halo is a NestBCHalo
    whose frames the driver swaps in per step."""
    from ..parallel.nest_halo import NestBCHalo
    a = geom.arrays
    g = SimpleNamespace()
    g.npx = geom.npx
    g.n = geom.n
    g.geom = geom
    g.dtype = dtype
    g.bounded = True
    g.grid_type = 0
    g.halo = NestBCHalo(geom.n, H)

    for name in ("dx", "dy", "dxa", "dya", "dxc", "dyc",
                 "rdx", "rdy", "rdxa", "rdya", "rdxc", "rdyc",
                 "area", "rarea", "area_c", "rarea_c",
                 "cosa", "sina", "rsina", "cosa_u", "sina_u", "rsin_u",
                 "cosa_v", "sina_v", "rsin_v", "cosa_s", "rsin2",
                 "divg_u", "divg_v", "del6_u", "del6_v",
                 "a11", "a12", "a21", "a22", "z11", "z12", "z21", "z22",
                 "l2c_u", "l2c_v", "fC", "f0"):
        setattr(g, name, _w(a[name], dtype))
    for c in range(9):
        setattr(g, f"sin_sg{c + 1}", _w(a["sin_sg"][..., c], dtype))
        setattr(g, f"cos_sg{c + 1}", _w(a["cos_sg"][..., c], dtype))
    g.da_min = jnp.asarray(geom.da_min, dtype)
    g.da_max = jnp.asarray(geom.da_max, dtype)
    g.da_min_c = jnp.asarray(geom.da_min_c, dtype)
    g.da_max_c = jnp.asarray(geom.da_max_c, dtype)
    g.global_area = float(geom.global_area)
    g.a2b_corner_w = None
    return g


def build_grid_ops_dp(n, dx_const, dy_const, dtype=jnp.float32,
                      deglat=0.0, ntiles=1):
    """Metric pack for the doubly-periodic cartesian domain (grid_type 4,
    fv_grid_tools.F90 setup_cartesian:1160): constant metrics, sina = 1,
    cosa = 0, f-plane Coriolis at `deglat`, periodic halo exchange.

    Fields use the same [T, K, y, x] layout with T = ntiles (default 1)."""
    from ..parallel.periodic import PeriodicHalo
    import gfdl_atmos_cubed_sphere_tpu.constants as con

    NC = n + 2 * H
    NW = n + 1 + 2 * H
    T = ntiles
    g = SimpleNamespace()
    g.npx = n + 1
    g.n = n
    g.grid_type = 4
    g.dtype = dtype
    g.halo = PeriodicHalo(n, H)
    g.geom = None

    def const(shape, val):
        return jnp.full((T, 1) + shape, val, dtype)

    cell = (NC, NC)
    xwall = (NC, NW)
    ywall = (NW, NC)
    crn = (NW, NW)

    g.dx = const(ywall, dx_const)      # y-wall lengths
    g.dy = const(xwall, dy_const)
    g.rdx = const(ywall, 1.0 / dx_const)
    g.rdy = const(xwall, 1.0 / dy_const)
    g.dxa = const(cell, dx_const)
    g.dya = const(cell, dy_const)
    g.rdxa = const(cell, 1.0 / dx_const)
    g.rdya = const(cell, 1.0 / dy_const)
    g.dxc = const(xwall, dx_const)
    g.dyc = const(ywall, dy_const)
    g.rdxc = const(xwall, 1.0 / dx_const)
    g.rdyc = const(ywall, 1.0 / dy_const)
    area = dx_const * dy_const
    g.area = const(cell, area)
    g.rarea = const(cell, 1.0 / area)
    g.area_c = const(crn, area)
    g.rarea_c = const(crn, 1.0 / area)
    for nm, shape, val in (("cosa", crn, 0.0), ("sina", crn, 1.0),
                           ("rsina", crn, 1.0),
                           ("cosa_u", xwall, 0.0), ("sina_u", xwall, 1.0),
                           ("rsin_u", xwall, 1.0),
                           ("cosa_v", ywall, 0.0), ("sina_v", ywall, 1.0),
                           ("rsin_v", ywall, 1.0),
                           ("cosa_s", cell, 0.0), ("rsin2", cell, 1.0)):
        setattr(g, nm, const(shape, val))
    for c in range(9):
        setattr(g, f"sin_sg{c + 1}", const(cell, 1.0))
        setattr(g, f"cos_sg{c + 1}", const(cell, 0.0))
    # divergence/vorticity damping metric factors (fv_grid_utils analogs):
    # divg_u = sina_v * dyc/dx (on y-walls), divg_v = sina_u * dxc/dy
    g.divg_u = const(ywall, dy_const / dx_const)
    g.divg_v = const(xwall, dx_const / dy_const)
    g.del6_u = const(ywall, dy_const / dx_const)
    g.del6_v = const(xwall, dx_const / dy_const)
    fcor = 2.0 * con.OMEGA * np.sin(np.deg2rad(deglat))
    g.fC = const(crn, fcor)
    g.f0 = const(cell, fcor)
    g.da_min = jnp.asarray(area, dtype)
    g.da_max = jnp.asarray(area, dtype)
    g.da_min_c = jnp.asarray(area, dtype)
    g.da_max_c = jnp.asarray(area, dtype)
    g.global_area = float(T * n * n * area)
    g.a2b_corner_w = None      # no cube corners on the periodic plane
    return g


def split_metrics(g):
    """Split the metric namespace into (device-array dict, static dict).

    Captured concrete arrays become embedded HLO constants under jit — at
    C192 the metric pack serializes to >100 MB of dense constants, which
    slows every compile and overflows the axon remote-compile request cap
    (PERFORMANCE.md round 3). Pass the array dict as a jit ARGUMENT and
    rebuild with merge_metrics inside the traced function instead."""
    arrs, rest = {}, {}
    for k, v in vars(g).items():
        # 0-d scalars (da_min etc.) stay static: several call sites fold
        # them to Python floats at trace time, and as constants they are
        # a few bytes each
        if isinstance(v, jnp.ndarray) and v.ndim >= 1:
            arrs[k] = v
        else:
            rest[k] = v
    return arrs, rest


def merge_metrics(arrs, rest):
    g = SimpleNamespace(**rest)
    for k, v in arrs.items():
        setattr(g, k, v)
    return g
