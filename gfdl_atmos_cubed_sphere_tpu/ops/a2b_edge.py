"""A-grid (cell mean) -> B-grid (corner) interpolation.

Re-implements /root/reference/model/a2b_edge.F90 (a2b_ord4:47, a2b_ord2:329,
extrap_corner:449) on padded whole-face arrays. The cube-corner 3-way
extrapolation weights x1/(x2-x1) are metric constants precomputed on the host
(grid_ops.py) from great-circle distances, matching extrap_corner exactly.

Layout: qin [..., P, P] (cells, halo H=3), output [..., NW, NW] corner-point
array valid on f-corners [1..npx] (halo region left zero).
"""

import jax.numpy as jnp

H = 3
B1, B2 = 7.0 / 12.0, -1.0 / 12.0      # PPM volume-mean
A1, A2 = 0.5625, -0.0625              # 4-pt Lagrange
C1, C2 = 2.0 / 3.0, -1.0 / 6.0        # compact cubic
R3 = 1.0 / 3.0


def fi(i):
    return i - 1 + H


def corner_legs(npx):
    """Cell-pair legs (j1,i1,j2,i2), Fortran 1-based, of the 3-way cube-corner
    extrapolation (a2b_edge.F90:105-133). Shared with the host-side weight
    precompute so leg order always matches."""
    npy = npx
    return {
        "sw": ((1, 1, 2, 2), (1, 0, 2, -1), (0, 1, -1, 2)),
        "se": ((1, npx - 1, 2, npx - 2), (1, npx, 2, npx + 1),
               (0, npx - 1, -1, npx - 2)),
        "ne": ((npy - 1, npx - 1, npy - 2, npx - 2),
               (npy - 1, npx, npy - 2, npx + 1),
               (npy, npx - 1, npy + 1, npx - 2)),
        "nw": ((npy - 1, 1, npy - 2, 2), (npy - 1, 0, npy - 2, -1),
               (npy, 1, npy + 1, 2)),
    }


def _a2b_ord4_dp(qin):
    """Doubly-periodic variant: pure interior 4th-order cell->corner
    everywhere (a2b_edge.F90 a2b_ord4 interior formulas, no edges)."""
    n = qin.shape[-1] - 2 * H
    NW = n + 1 + 2 * H
    batch = qin.shape[:-2]
    # x-interp to walls: qx(w) = B2*(q(w-2)+q(w+1)) + B1*(q(w-1)+q(w));
    # walls 2..P-2 of the padded frame; wall w at padded index w+H... use
    # the full valid range and zero-pad the rim.
    # wall W (padded index, NW = P+1 entries) uses cells W-2..W+1
    pad = [(0, 0)] * (qin.ndim - 1)
    qx = (B2 * (qin[..., :, :-3] + qin[..., :, 3:])
          + B1 * (qin[..., :, 1:-2] + qin[..., :, 2:-1]))   # [.., P, P-3]
    qx = jnp.pad(qx, pad[:-1] + [(0, 0), (2, 2)])            # [.., P, NW]
    qxx = (A2 * (qx[..., :-3, :] + qx[..., 3:, :])
           + A1 * (qx[..., 1:-2, :] + qx[..., 2:-1, :]))
    qxx = jnp.pad(qxx, pad[:-1] + [(2, 2), (0, 0)])          # [.., NW, NW]
    qy = (B2 * (qin[..., :-3, :] + qin[..., 3:, :])
          + B1 * (qin[..., 1:-2, :] + qin[..., 2:-1, :]))
    qy = jnp.pad(qy, pad[:-1] + [(2, 2), (0, 0)])
    qyy = (A2 * (qy[..., :, :-3] + qy[..., :, 3:])
           + A1 * (qy[..., :, 1:-2] + qy[..., :, 2:-1]))
    qyy = jnp.pad(qyy, pad[:-1] + [(0, 0), (2, 2)])
    return 0.5 * (qxx + qyy)


def _bgrid_frame(NW, npx, sw, se, ne, nw, wcol, ecol, srow, nrow, inter):
    """Assemble the [.., NW, NW] corner-point output from its frame pieces
    with one concatenate pass (each static .at[].set on the full array costs
    a full-array HBM pass on TPU): zero halo rim, 4 corner points, west/east
    columns (rows f(2)..f(npy-1)), south/north rows (cols f(2)..f(npx-1)),
    and the interior block."""
    batch = inter.shape[:-2]
    dt_ = inter.dtype
    zrow3 = jnp.zeros(batch + (H, NW), dt_)
    zc = jnp.zeros(batch + (1, H), dt_)
    zi = jnp.zeros(batch + (inter.shape[-2], H), dt_)
    row_s = jnp.concatenate([zc, sw, srow, se, zc], -1)
    row_n = jnp.concatenate([zc, nw, nrow, ne, zc], -1)
    mid = jnp.concatenate([zi, wcol, inter, ecol, zi], -1)
    return jnp.concatenate([zrow3, row_s, mid, row_n, zrow3], -2)


def a2b_ord4(qin, g):
    """qin: [..., P, P] padded cells -> [..., NW, NW] corner values.

    g must provide (padded, broadcastable to qin's batch): dxa, dya,
    edge_w/e/s/n ([6,1,n+1]), and corner extrapolation weights
    corner_w [6,1,4,3] with index pairs fixed (see grid_ops).

    Internal arrays (qx/qy/qxx/qyy) and the output are assembled by strip
    concatenation instead of .at[].set chains — one HBM pass per array.
    """
    if getattr(g, "grid_type", 0) >= 3 or getattr(g, "bounded", False):
        # orthogonal plane OR bounded gnomonic patch: regular interior
        # stencils everywhere (a2b_edge.F90 bounded_domain ranges :52-56),
        # halos carry valid (BC) data
        return _a2b_ord4_dp(qin)
    from .pallas_a2b import use_pallas_a2b
    if use_pallas_a2b(qin, g):
        # TPU fast path: whole face per (tile, interface-block) in VMEM
        from .pallas_a2b import a2b_ord4_pallas
        return a2b_ord4_pallas(qin, g)
    f = fi
    n = qin.shape[-1] - 2 * H
    npx = npy = n + 1
    NW = n + 1 + 2 * H

    dxa, dya = g.dxa, g.dya

    def qc(jf, if_):
        """single cell, keepdim [.., 1, 1]."""
        return qin[..., f(jf):f(jf) + 1, f(if_):f(if_) + 1]

    # ---- cube-corner 3-way extrapolation (a2b_edge.F90:105-133) ----------
    cw = g.a2b_corner_w  # [6, 1, 4, 3]
    legs = corner_legs(npx)
    cvals = {}
    for ci, name in enumerate(("sw", "se", "ne", "nw")):
        acc = 0.0
        for li, (j1, i1, j2, i2) in enumerate(legs[name]):
            q1, q2 = qc(j1, i1), qc(j2, i2)
            w = cw[..., ci:ci + 1, li:li + 1]
            acc = acc + q1 + w * (q1 - q2)
        cvals[name] = R3 * acc

    # ---- qx: 4th-order interp at x-walls, all cell rows -------------------
    # (rows outside [1, npy-1] are never read downstream)
    def cx(i, w=1):
        return qin[..., :, f(i):f(i) + w]

    def dx_(i):
        return dxa[..., :, f(i):f(i) + 1]

    s = f(1)
    Lx = npx - 4
    qx_i = (B2 * (qin[..., :, s:s + Lx] + qin[..., :, s + 3:s + 3 + Lx])
            + B1 * (qin[..., :, s + 1:s + 1 + Lx]
                    + qin[..., :, s + 2:s + 2 + Lx]))
    g_in = dx_(2) / dx_(1)
    g_ou = dx_(-1) / dx_(0)
    qx1 = 0.5 * (((2.0 + g_in) * cx(1) - cx(2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cx(0) - cx(-1)) / (1.0 + g_ou))
    qx2 = ((3.0 * (g_in * cx(1) + cx(2))
            - (g_in * qx1 + qx_i[..., :, :1])) / (2.0 + 2.0 * g_in))
    g_in = dx_(npx - 2) / dx_(npx - 1)
    g_ou = dx_(npx + 1) / dx_(npx)
    qxn = 0.5 * (((2.0 + g_in) * cx(npx - 1) - cx(npx - 2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cx(npx) - cx(npx + 1)) / (1.0 + g_ou))
    qxm = ((3.0 * (cx(npx - 2) + g_in * cx(npx - 1))
            - (g_in * qxn + qx_i[..., :, -1:])) / (2.0 + 2.0 * g_in))
    zx = jnp.zeros_like(qin[..., :, :H])
    qx = jnp.concatenate([zx, qx1, qx2, qx_i, qxm, qxn, zx], -1)

    # ---- qy: 4th-order interp at y-walls, all cell cols --------------------
    def cy(jf, w=1):
        return qin[..., f(jf):f(jf) + w, :]

    def dy_(jf):
        return dya[..., f(jf):f(jf) + 1, :]

    qy_i = (B2 * (qin[..., s:s + Lx, :] + qin[..., s + 3:s + 3 + Lx, :])
            + B1 * (qin[..., s + 1:s + 1 + Lx, :]
                    + qin[..., s + 2:s + 2 + Lx, :]))
    g_in = dy_(2) / dy_(1)
    g_ou = dy_(-1) / dy_(0)
    qy1 = 0.5 * (((2.0 + g_in) * cy(1) - cy(2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cy(0) - cy(-1)) / (1.0 + g_ou))
    qy2 = ((3.0 * (g_in * cy(1) + cy(2))
            - (g_in * qy1 + qy_i[..., :1, :])) / (2.0 + 2.0 * g_in))
    g_in = dy_(npy - 2) / dy_(npy - 1)
    g_ou = dy_(npy + 1) / dy_(npy)
    qyn = 0.5 * (((2.0 + g_in) * cy(npy - 1) - cy(npy - 2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cy(npy) - cy(npy + 1)) / (1.0 + g_ou))
    qym = ((3.0 * (cy(npy - 2) + g_in * cy(npy - 1))
            - (g_in * qyn + qy_i[..., -1:, :])) / (2.0 + 2.0 * g_in))
    zy = jnp.zeros_like(qin[..., :H, :])
    qy = jnp.concatenate([zy, qy1, qy2, qy_i, qym, qyn, zy], -2)

    # ---- edge rows/columns of the output (edge_w/e/s/n factors) -----------
    rj = slice(f(1), f(npy - 1) + 1)
    ri = slice(f(1), f(npx - 1) + 1)
    q2w = ((qin[..., rj, f(0):f(0) + 1] * dxa[..., rj, f(1):f(1) + 1]
            + qin[..., rj, f(1):f(1) + 1] * dxa[..., rj, f(0):f(0) + 1])
           / (dxa[..., rj, f(0):f(0) + 1] + dxa[..., rj, f(1):f(1) + 1]))
    ew = getattr(g, "edge_w_col", None)          # pre-shaped (Pallas body)
    if ew is None:
        ew = g.edge_w[..., 1:npy - 1][..., None]
    wcol = ew * q2w[..., :-1, :] + (1.0 - ew) * q2w[..., 1:, :]
    q2e = ((qin[..., rj, f(npx - 1):f(npx - 1) + 1] * dxa[..., rj, f(npx):f(npx) + 1]
            + qin[..., rj, f(npx):f(npx) + 1] * dxa[..., rj, f(npx - 1):f(npx - 1) + 1])
           / (dxa[..., rj, f(npx - 1):f(npx - 1) + 1]
              + dxa[..., rj, f(npx):f(npx) + 1]))
    ee = getattr(g, "edge_e_col", None)
    if ee is None:
        ee = g.edge_e[..., 1:npy - 1][..., None]
    ecol = ee * q2e[..., :-1, :] + (1.0 - ee) * q2e[..., 1:, :]
    q1s = ((qin[..., f(0):f(0) + 1, ri] * dya[..., f(1):f(1) + 1, ri]
            + qin[..., f(1):f(1) + 1, ri] * dya[..., f(0):f(0) + 1, ri])
           / (dya[..., f(0):f(0) + 1, ri] + dya[..., f(1):f(1) + 1, ri]))
    es = getattr(g, "edge_s_row", None)
    if es is None:
        es = g.edge_s[..., 1:npx - 1][..., None, :]
    srow = es * q1s[..., :, :-1] + (1.0 - es) * q1s[..., :, 1:]
    q1n = ((qin[..., f(npy - 1):f(npy - 1) + 1, ri] * dya[..., f(npy):f(npy) + 1, ri]
            + qin[..., f(npy):f(npy) + 1, ri] * dya[..., f(npy - 1):f(npy - 1) + 1, ri])
           / (dya[..., f(npy - 1):f(npy - 1) + 1, ri]
              + dya[..., f(npy):f(npy) + 1, ri]))
    en = getattr(g, "edge_n_row", None)
    if en is None:
        en = g.edge_n[..., 1:npx - 1][..., None, :]
    nrow = en * q1n[..., :, :-1] + (1.0 - en) * q1n[..., :, 1:]

    # ---- qxx: y-interp of qx to corners (block form, no zero frame) -------
    cwls = slice(f(2), f(npx - 1) + 1)        # corner cols 2..npx-1
    r0 = f(1)
    Ly = npy - 4
    qxx_i = (A2 * (qx[..., r0:r0 + Ly, cwls] + qx[..., r0 + 3:r0 + 3 + Ly, cwls])
             + A1 * (qx[..., r0 + 1:r0 + 1 + Ly, cwls]
                     + qx[..., r0 + 2:r0 + 2 + Ly, cwls]))
    qxx_s = (C1 * (qx[..., f(1):f(1) + 1, cwls] + qx[..., f(2):f(2) + 1, cwls])
             + C2 * (srow + qxx_i[..., :1, :]))
    qxx_n = (C1 * (qx[..., f(npy - 2):f(npy - 2) + 1, cwls]
                   + qx[..., f(npy - 1):f(npy - 1) + 1, cwls])
             + C2 * (nrow + qxx_i[..., -1:, :]))
    qxx = jnp.concatenate([qxx_s, qxx_i, qxx_n], -2)     # [.., npy-2, npx-2]

    # ---- qyy: x-interp of qy to corners ------------------------------------
    rwls = slice(f(2), f(npy - 1) + 1)
    qyy_i = (A2 * (qy[..., rwls, r0:r0 + Ly] + qy[..., rwls, r0 + 3:r0 + 3 + Ly])
             + A1 * (qy[..., rwls, r0 + 1:r0 + 1 + Ly]
                     + qy[..., rwls, r0 + 2:r0 + 2 + Ly]))
    qyy_w = (C1 * (qy[..., rwls, f(1):f(1) + 1] + qy[..., rwls, f(2):f(2) + 1])
             + C2 * (wcol + qyy_i[..., :, :1]))
    qyy_e = (C1 * (qy[..., rwls, f(npx - 2):f(npx - 2) + 1]
                   + qy[..., rwls, f(npx - 1):f(npx - 1) + 1])
             + C2 * (ecol + qyy_i[..., :, -1:]))
    qyy = jnp.concatenate([qyy_w, qyy_i, qyy_e], -1)     # [.., npy-2, npx-2]

    inter = 0.5 * (qxx + qyy)
    return _bgrid_frame(NW, npx, cvals["sw"], cvals["se"], cvals["ne"],
                        cvals["nw"], wcol, ecol, srow, nrow, inter)


def a2b_edge_rows(qin, g):
    """The a2b_ord4 output edge rows/columns and cube-corner values,
    computed in plain XLA (a2b_edge.F90:105-133 corners, :142-158 edge
    factors). Returns (srow, nrow [.., 1, NW], wcol, ecol [.., NW, 1],
    cvals [.., 1, 4] in sw/se/ne/nw order). Fed to the Pallas kernel as
    inputs: Mosaic rejects the corner-aligning pad/concat on row slices
    with sub-vreg offsets."""
    f = fi
    n = qin.shape[-1] - 2 * H
    npx = npy = n + 1
    NW = n + 1 + 2 * H
    dxa, dya = g.dxa, g.dya

    def qc(jf, if_):
        return qin[..., f(jf):f(jf) + 1, f(if_):f(if_) + 1]

    cw = g.a2b_corner_w
    legs = corner_legs(npx)
    cvals = []
    for ci, name in enumerate(("sw", "se", "ne", "nw")):
        acc = 0.0
        for li, (j1, i1, j2, i2) in enumerate(legs[name]):
            q1, q2 = qc(j1, i1), qc(j2, i2)
            w = cw[..., ci:ci + 1, li:li + 1]
            acc = acc + q1 + w * (q1 - q2)
        cvals.append(R3 * acc)
    cvals = jnp.concatenate(cvals, -1)                     # [.., 1, 4]

    q1s = ((qin[..., f(0):f(0) + 1, :] * dya[..., f(1):f(1) + 1, :]
            + qin[..., f(1):f(1) + 1, :] * dya[..., f(0):f(0) + 1, :])
           / (dya[..., f(0):f(0) + 1, :] + dya[..., f(1):f(1) + 1, :]))
    q1n = ((qin[..., f(npy - 1):f(npy - 1) + 1, :] * dya[..., f(npy):f(npy) + 1, :]
            + qin[..., f(npy):f(npy) + 1, :] * dya[..., f(npy - 1):f(npy - 1) + 1, :])
           / (dya[..., f(npy - 1):f(npy - 1) + 1, :]
              + dya[..., f(npy):f(npy) + 1, :]))
    q2w = ((qin[..., :, f(0):f(0) + 1] * dxa[..., :, f(1):f(1) + 1]
            + qin[..., :, f(1):f(1) + 1] * dxa[..., :, f(0):f(0) + 1])
           / (dxa[..., :, f(0):f(0) + 1] + dxa[..., :, f(1):f(1) + 1]))
    q2e = ((qin[..., :, f(npx - 1):f(npx - 1) + 1] * dxa[..., :, f(npx):f(npx) + 1]
            + qin[..., :, f(npx):f(npx) + 1] * dxa[..., :, f(npx - 1):f(npx - 1) + 1])
           / (dxa[..., :, f(npx - 1):f(npx - 1) + 1]
              + dxa[..., :, f(npx):f(npx) + 1]))
    cl_ = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 0)])[..., :NW]
    cr_ = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])
    rl_ = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 2)
                            + [(1, 0), (0, 0)])[..., :NW, :]
    rr_ = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 0)])
    srow = g.edge_s_full * cl_(q1s) + (1.0 - g.edge_s_full) * cr_(q1s)
    nrow = g.edge_n_full * cl_(q1n) + (1.0 - g.edge_n_full) * cr_(q1n)
    wcol = g.edge_w_full * rl_(q2w) + (1.0 - g.edge_w_full) * rr_(q2w)
    ecol = g.edge_e_full * rl_(q2e) + (1.0 - g.edge_e_full) * rr_(q2e)
    return srow, nrow, wcol, ecol, cvals


def _a2b_ord4_sel(qin, g, srow, nrow, wcol, ecol, cvals):
    """Select-based restatement of a2b_ord4 for Pallas kernel bodies:
    identical numerics, with every strip concat replaced by full-frame
    stencils + iota-masked row/column/point selects (Mosaic rejects
    concats whose operands carry mismatched sub-vreg offsets). The output
    edge rows/cols and corner values (srow/nrow/wcol/ecol/cvals) arrive
    precomputed from a2b_edge_rows."""
    import jax

    f = fi
    n = qin.shape[-1] - 2 * H
    npx = npy = n + 1
    P = n + 2 * H
    NW = P + 1
    dxa, dya = g.dxa, g.dya
    dt_ = qin.dtype

    ixw = jax.lax.broadcasted_iota(jnp.int32, (1, NW), 1)
    iyw = jax.lax.broadcasted_iota(jnp.int32, (NW, 1), 0)

    def sel_col(a, i, val):
        return jnp.where(ixw[..., :a.shape[-1]] == i, val, a)

    def sel_row(a, j, val):
        return jnp.where(iyw[:a.shape[-2]] == j, val, a)

    def qc(jf, if_):
        return qin[..., f(jf):f(jf) + 1, f(if_):f(if_) + 1]

    # ---- qx: full-frame 4th-order + edge column selects -------------------
    padl = lambda a, lo, hi: jnp.pad(
        a, [(0, 0)] * (a.ndim - 1) + [(lo, hi)])
    padr = lambda a, lo, hi: jnp.pad(
        a, [(0, 0)] * (a.ndim - 2) + [(lo, hi), (0, 0)])

    qx = padl(B2 * (qin[..., :, :-3] + qin[..., :, 3:])
              + B1 * (qin[..., :, 1:-2] + qin[..., :, 2:-1]), 2, 2)

    def cx(i):
        return qin[..., :, f(i):f(i) + 1]

    def dx_(i):
        return dxa[..., :, f(i):f(i) + 1]

    def wx(i):
        """qx at f-wall i (padded col i + 2), keepdim."""
        return qx[..., :, i + 2:i + 3]

    g_in = dx_(2) / dx_(1)
    g_ou = dx_(-1) / dx_(0)
    qx1 = 0.5 * (((2.0 + g_in) * cx(1) - cx(2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cx(0) - cx(-1)) / (1.0 + g_ou))
    qx2 = ((3.0 * (g_in * cx(1) + cx(2)) - (g_in * qx1 + wx(3)))
           / (2.0 + 2.0 * g_in))
    g_in = dx_(npx - 2) / dx_(npx - 1)
    g_ou = dx_(npx + 1) / dx_(npx)
    qxn = 0.5 * (((2.0 + g_in) * cx(npx - 1) - cx(npx - 2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cx(npx) - cx(npx + 1)) / (1.0 + g_ou))
    qxm = ((3.0 * (cx(npx - 2) + g_in * cx(npx - 1))
            - (g_in * qxn + wx(npx - 2))) / (2.0 + 2.0 * g_in))
    qx = sel_col(qx, 1 + 2, qx1)
    qx = sel_col(qx, 2 + 2, qx2)
    qx = sel_col(qx, npx - 1 + 2, qxm)
    qx = sel_col(qx, npx + 2, qxn)

    # ---- qy ----------------------------------------------------------------
    qy = padr(B2 * (qin[..., :-3, :] + qin[..., 3:, :])
              + B1 * (qin[..., 1:-2, :] + qin[..., 2:-1, :]), 2, 2)

    def cy(jf):
        return qin[..., f(jf):f(jf) + 1, :]

    def dy_(jf):
        return dya[..., f(jf):f(jf) + 1, :]

    def wy(j):
        return qy[..., j + 2:j + 3, :]

    g_in = dy_(2) / dy_(1)
    g_ou = dy_(-1) / dy_(0)
    qy1 = 0.5 * (((2.0 + g_in) * cy(1) - cy(2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cy(0) - cy(-1)) / (1.0 + g_ou))
    qy2 = ((3.0 * (g_in * cy(1) + cy(2)) - (g_in * qy1 + wy(3)))
           / (2.0 + 2.0 * g_in))
    g_in = dy_(npy - 2) / dy_(npy - 1)
    g_ou = dy_(npy + 1) / dy_(npy)
    qyn = 0.5 * (((2.0 + g_in) * cy(npy - 1) - cy(npy - 2)) / (1.0 + g_in)
                 + ((2.0 + g_ou) * cy(npy) - cy(npy + 1)) / (1.0 + g_ou))
    qym = ((3.0 * (cy(npy - 2) + g_in * cy(npy - 1))
            - (g_in * qyn + wy(npy - 2))) / (2.0 + 2.0 * g_in))
    qy = sel_row(qy, 1 + 2, qy1)
    qy = sel_row(qy, 2 + 2, qy2)
    qy = sel_row(qy, npy - 1 + 2, qym)
    qy = sel_row(qy, npy + 2, qyn)

    # ---- qxx / qyy full frames + edge fixes -------------------------------
    qxx = padr(A2 * (qx[..., :-3, :] + qx[..., 3:, :])
               + A1 * (qx[..., 1:-2, :] + qx[..., 2:-1, :]), 2, 2)
    # [.., NW, NW]: corner row r uses qx rows r-2..r+1
    qxx = sel_row(qxx, f(2), C1 * (wy_row(qx, 1) + wy_row(qx, 2))
                  + C2 * (srow + qxx[..., f(3):f(3) + 1, :]))
    qxx = sel_row(qxx, f(npy - 1),
                  C1 * (wy_row(qx, npy - 2) + wy_row(qx, npy - 1))
                  + C2 * (nrow + qxx[..., f(npy - 2):f(npy - 2) + 1, :]))
    qyy = padl(A2 * (qy[..., :, :-3] + qy[..., :, 3:])
               + A1 * (qy[..., :, 1:-2] + qy[..., :, 2:-1]), 2, 2)
    qyy = sel_col(qyy, f(2), C1 * (wx_col(qy, 1) + wx_col(qy, 2))
                  + C2 * (wcol + qyy[..., :, f(3):f(3) + 1]))
    qyy = sel_col(qyy, f(npx - 1),
                  C1 * (wx_col(qy, npx - 2) + wx_col(qy, npx - 1))
                  + C2 * (ecol + qyy[..., :, f(npx - 2):f(npx - 2) + 1]))

    out = 0.5 * (qxx + qyy)
    # edge rows/cols of the output
    out = jnp.where(iyw == f(1), srow, out)
    out = jnp.where(iyw == f(npy), nrow, out)
    out = jnp.where(ixw == f(1), wcol, out)
    out = jnp.where(ixw == f(npx), ecol, out)
    # 4 cube corners (two-stage point selects)
    zero = jnp.zeros((), dt_)
    for ci, (jj, ii) in enumerate(((f(1), f(1)), (f(1), f(npx)),
                                   (f(npy), f(npx)), (f(npy), f(1)))):
        val = cvals[..., :, ci:ci + 1]
        row_val = jnp.where(ixw == ii, val, zero)
        out = jnp.where((iyw == jj) & (ixw == ii), row_val, out)
    # zero halo rim
    inside = ((iyw >= f(1)) & (iyw <= f(npy))
              & (ixw >= f(1)) & (ixw <= f(npx)))
    return jnp.where(inside, out, zero)


def wy_row(qx, jf):
    """qx at cell row f(jf), keepdim (helper for _a2b_ord4_sel)."""
    j = jf - 1 + H
    return qx[..., j:j + 1, :]


def wx_col(qy, if_):
    i = if_ - 1 + H
    return qy[..., :, i:i + 1]


def a2b_ord2(qin, g):
    """a2b_edge.F90 a2b_ord2: 2nd-order cell->corner with edge factors."""
    if getattr(g, "grid_type", 0) >= 3 or getattr(g, "bounded", False):
        # plain 4-cell average on every corner (bounded_domain ranges)
        q4 = 0.25 * (qin[..., :-1, :-1] + qin[..., 1:, :-1]
                     + qin[..., :-1, 1:] + qin[..., 1:, 1:])
        pad = [(0, 0)] * (qin.ndim - 2) + [(1, 1), (1, 1)]
        return jnp.pad(q4, pad, mode="edge")
    f = fi
    n = qin.shape[-1] - 2 * H
    npx = npy = n + 1
    NW = n + 1 + 2 * H
    batch = qin.shape[:-2]
    qout = jnp.zeros(batch + (NW, NW), qin.dtype)
    # interior corners [2..npx-1]^2: 4-cell average
    c = slice(f(2), f(npx - 1) + 1)
    j0 = f(1)
    L = npx - 2
    qout = qout.at[..., c, c].set(0.25 * (
        qin[..., j0:j0 + L, j0:j0 + L] + qin[..., j0 + 1:j0 + 1 + L, j0:j0 + L]
        + qin[..., j0:j0 + L, j0 + 1:j0 + 1 + L]
        + qin[..., j0 + 1:j0 + 1 + L, j0 + 1:j0 + 1 + L]))
    # corners (3-cell average)
    r3 = 1.0 / 3.0
    qout = qout.at[..., f(1), f(1)].set(r3 * (
        qin[..., f(1), f(1)] + qin[..., f(0), f(1)] + qin[..., f(1), f(0)]))
    qout = qout.at[..., f(1), f(npx)].set(r3 * (
        qin[..., f(1), f(npx - 1)] + qin[..., f(0), f(npx - 1)] + qin[..., f(1), f(npx)]))
    qout = qout.at[..., f(npy), f(npx)].set(r3 * (
        qin[..., f(npy - 1), f(npx - 1)] + qin[..., f(npy - 1), f(npx)]
        + qin[..., f(npy), f(npx - 1)]))
    qout = qout.at[..., f(npy), f(1)].set(r3 * (
        qin[..., f(npy - 1), f(1)] + qin[..., f(npy - 1), f(0)] + qin[..., f(npy), f(1)]))
    # edges
    rj = slice(f(1), f(npy - 1) + 1)
    q2w = 0.5 * (qin[..., rj, f(0)] + qin[..., rj, f(1)])
    ew = g.edge_w[..., 1:npy - 1]
    qout = qout.at[..., f(2):f(npy - 1) + 1, f(1)].set(
        ew * q2w[..., :-1] + (1.0 - ew) * q2w[..., 1:])
    q2e = 0.5 * (qin[..., rj, f(npx - 1)] + qin[..., rj, f(npx)])
    ee = g.edge_e[..., 1:npy - 1]
    qout = qout.at[..., f(2):f(npy - 1) + 1, f(npx)].set(
        ee * q2e[..., :-1] + (1.0 - ee) * q2e[..., 1:])
    ri = slice(f(1), f(npx - 1) + 1)
    q1s = 0.5 * (qin[..., f(0), ri] + qin[..., f(1), ri])
    es = g.edge_s[..., 1:npx - 1]
    qout = qout.at[..., f(1), f(2):f(npx - 1) + 1].set(
        es * q1s[..., :-1] + (1.0 - es) * q1s[..., 1:])
    q1n = 0.5 * (qin[..., f(npy - 1), ri] + qin[..., f(npy), ri])
    en = g.edge_n[..., 1:npx - 1]
    qout = qout.at[..., f(npy), f(2):f(npx - 1) + 1].set(
        en * q1n[..., :-1] + (1.0 - en) * q1n[..., 1:])
    return qout
