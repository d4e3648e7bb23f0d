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
                   coriolis_alpha=0.0, radius=None, omega=None):
    """Build the metric namespace `g` + halo exchanger for a cube of npx corners."""
    kw = {}
    if radius is not None:
        kw["radius"] = radius
    if omega is not None:
        kw["omega"] = omega
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
