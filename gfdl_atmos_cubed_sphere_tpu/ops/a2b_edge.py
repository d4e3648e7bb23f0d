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


def a2b_ord4(qin, g):
    """qin: [..., P, P] padded cells -> [..., NW, NW] corner values.

    g must provide (padded, broadcastable to qin's batch): dxa, dya,
    edge_w/e/s/n ([6,1,n+1]), and corner extrapolation weights
    corner_w [6,1,4,3] with index pairs fixed (see grid_ops).
    """
    if getattr(g, "grid_type", 0) >= 3:
        return _a2b_ord4_dp(qin)
    f = fi
    n = qin.shape[-1] - 2 * H
    npx = npy = n + 1
    NW = n + 1 + 2 * H
    batch = qin.shape[:-2]
    qout = jnp.zeros(batch + (NW, NW), qin.dtype)

    dxa, dya = g.dxa, g.dya

    # ---- cube-corner 3-way extrapolation (a2b_edge.F90:105-133) ----------
    # corner order: sw, se, ne, nw; legs: (diag-in, x-halo, y-halo)
    def q_at(jf, if_):
        return qin[..., f(jf), f(if_)]

    cw = g.a2b_corner_w  # [6, 1, 4, 3]
    legs = corner_legs(npx)
    targets = {"sw": (1, 1), "se": (1, npx), "ne": (npy, npx), "nw": (npy, 1)}
    for ci, name in enumerate(("sw", "se", "ne", "nw")):
        acc = 0.0
        for li, (j1, i1, j2, i2) in enumerate(legs[name]):
            q1, q2 = q_at(j1, i1), q_at(j2, i2)
            w = cw[..., ci, li]
            acc = acc + q1 + w * (q1 - q2)
        tj, ti = targets[name]
        qout = qout.at[..., f(tj), f(ti)].set(R3 * acc)

    # ---- qx: 4th-order interp at x-walls (rows = cells) ------------------
    qx = jnp.zeros(batch + (qin.shape[-2], NW), qin.dtype)
    # interior walls i in [3, npx-2], cell rows j in [1, npy-1]
    rj = slice(f(1), f(npy - 1) + 1)
    s = f(1)                                   # cell i-2 for wall i=3
    Lx = npx - 4
    qx = qx.at[..., rj, f(3):f(npx - 2) + 1].set(
        B2 * (qin[..., rj, s:s + Lx] + qin[..., rj, s + 3:s + 3 + Lx])
        + B1 * (qin[..., rj, s + 1:s + 1 + Lx] + qin[..., rj, s + 2:s + 2 + Lx]))
    # west edge walls 1, 2
    g_in = dxa[..., rj, f(2)] / dxa[..., rj, f(1)]
    g_ou = dxa[..., rj, f(-1)] / dxa[..., rj, f(0)]
    qx1 = 0.5 * (((2.0 + g_in) * qin[..., rj, f(1)] - qin[..., rj, f(2)]) / (1.0 + g_in)
                 + ((2.0 + g_ou) * qin[..., rj, f(0)] - qin[..., rj, f(-1)]) / (1.0 + g_ou))
    qx = qx.at[..., rj, f(1)].set(qx1)
    qx = qx.at[..., rj, f(2)].set(
        (3.0 * (g_in * qin[..., rj, f(1)] + qin[..., rj, f(2)])
         - (g_in * qx1 + qx[..., rj, f(3)])) / (2.0 + 2.0 * g_in))
    # east edge walls npx-1, npx
    g_in = dxa[..., rj, f(npx - 2)] / dxa[..., rj, f(npx - 1)]
    g_ou = dxa[..., rj, f(npx + 1)] / dxa[..., rj, f(npx)]
    qxn = 0.5 * (((2.0 + g_in) * qin[..., rj, f(npx - 1)] - qin[..., rj, f(npx - 2)]) / (1.0 + g_in)
                 + ((2.0 + g_ou) * qin[..., rj, f(npx)] - qin[..., rj, f(npx + 1)]) / (1.0 + g_ou))
    qx = qx.at[..., rj, f(npx)].set(qxn)
    qx = qx.at[..., rj, f(npx - 1)].set(
        (3.0 * (qin[..., rj, f(npx - 2)] + g_in * qin[..., rj, f(npx - 1)])
         - (g_in * qxn + qx[..., rj, f(npx - 2)])) / (2.0 + 2.0 * g_in))

    # ---- qout west/east edge rows (edge_w/edge_e factors) ----------------
    # q2(j) = (qin(0,j)*dxa(1,j)+qin(1,j)*dxa(0,j))/(dxa(0,j)+dxa(1,j)), j in [1, npy-1]
    q2w = ((qin[..., rj, f(0)] * dxa[..., rj, f(1)]
            + qin[..., rj, f(1)] * dxa[..., rj, f(0)])
           / (dxa[..., rj, f(0)] + dxa[..., rj, f(1)]))
    ew = g.edge_w[..., 1:npy - 1]                 # factors at corners j=2..npy-1
    qout = qout.at[..., f(2):f(npy - 1) + 1, f(1)].set(
        ew * q2w[..., :-1] + (1.0 - ew) * q2w[..., 1:])
    q2e = ((qin[..., rj, f(npx - 1)] * dxa[..., rj, f(npx)]
            + qin[..., rj, f(npx)] * dxa[..., rj, f(npx - 1)])
           / (dxa[..., rj, f(npx - 1)] + dxa[..., rj, f(npx)]))
    ee = g.edge_e[..., 1:npy - 1]
    qout = qout.at[..., f(2):f(npy - 1) + 1, f(npx)].set(
        ee * q2e[..., :-1] + (1.0 - ee) * q2e[..., 1:])

    # ---- qy: 4th-order interp at y-walls ---------------------------------
    qy = jnp.zeros(batch + (NW, qin.shape[-1]), qin.dtype)
    ri = slice(f(1), f(npx - 1) + 1)
    qy = qy.at[..., f(3):f(npy - 2) + 1, ri].set(
        B2 * (qin[..., s:s + Lx, ri] + qin[..., s + 3:s + 3 + Lx, ri])
        + B1 * (qin[..., s + 1:s + 1 + Lx, ri] + qin[..., s + 2:s + 2 + Lx, ri]))
    g_in = dya[..., f(2), ri] / dya[..., f(1), ri]
    g_ou = dya[..., f(-1), ri] / dya[..., f(0), ri]
    qy1 = 0.5 * (((2.0 + g_in) * qin[..., f(1), ri] - qin[..., f(2), ri]) / (1.0 + g_in)
                 + ((2.0 + g_ou) * qin[..., f(0), ri] - qin[..., f(-1), ri]) / (1.0 + g_ou))
    qy = qy.at[..., f(1), ri].set(qy1)
    qy = qy.at[..., f(2), ri].set(
        (3.0 * (g_in * qin[..., f(1), ri] + qin[..., f(2), ri])
         - (g_in * qy1 + qy[..., f(3), ri])) / (2.0 + 2.0 * g_in))
    g_in = dya[..., f(npy - 2), ri] / dya[..., f(npy - 1), ri]
    g_ou = dya[..., f(npy + 1), ri] / dya[..., f(npy), ri]
    qyn = 0.5 * (((2.0 + g_in) * qin[..., f(npy - 1), ri] - qin[..., f(npy - 2), ri]) / (1.0 + g_in)
                 + ((2.0 + g_ou) * qin[..., f(npy), ri] - qin[..., f(npy + 1), ri]) / (1.0 + g_ou))
    qy = qy.at[..., f(npy), ri].set(qyn)
    qy = qy.at[..., f(npy - 1), ri].set(
        (3.0 * (qin[..., f(npy - 2), ri] + g_in * qin[..., f(npy - 1), ri])
         - (g_in * qyn + qy[..., f(npy - 2), ri])) / (2.0 + 2.0 * g_in))

    # ---- qout south/north edge rows --------------------------------------
    q1s = ((qin[..., f(0), ri] * dya[..., f(1), ri]
            + qin[..., f(1), ri] * dya[..., f(0), ri])
           / (dya[..., f(0), ri] + dya[..., f(1), ri]))
    es = g.edge_s[..., 1:npx - 1]
    qout = qout.at[..., f(1), f(2):f(npx - 1) + 1].set(
        es * q1s[..., :-1] + (1.0 - es) * q1s[..., 1:])
    q1n = ((qin[..., f(npy - 1), ri] * dya[..., f(npy), ri]
            + qin[..., f(npy), ri] * dya[..., f(npy - 1), ri])
           / (dya[..., f(npy - 1), ri] + dya[..., f(npy), ri]))
    en = g.edge_n[..., 1:npx - 1]
    qout = qout.at[..., f(npy), f(2):f(npx - 1) + 1].set(
        en * q1n[..., :-1] + (1.0 - en) * q1n[..., 1:])

    # ---- qxx: y-interp of qx to corners ----------------------------------
    cwls = slice(f(2), f(npx - 1) + 1)        # corner cols 2..npx-1
    qxx = jnp.zeros(batch + (NW, NW), qin.dtype)
    r0 = f(1)                                  # cell j-2 for corner j=3
    Ly = npy - 4
    qxx = qxx.at[..., f(3):f(npy - 2) + 1, cwls].set(
        A2 * (qx[..., r0:r0 + Ly, cwls] + qx[..., r0 + 3:r0 + 3 + Ly, cwls])
        + A1 * (qx[..., r0 + 1:r0 + 1 + Ly, cwls] + qx[..., r0 + 2:r0 + 2 + Ly, cwls]))
    qxx = qxx.at[..., f(2), cwls].set(
        C1 * (qx[..., f(1), cwls] + qx[..., f(2), cwls])
        + C2 * (qout[..., f(1), cwls] + qxx[..., f(3), cwls]))
    qxx = qxx.at[..., f(npy - 1), cwls].set(
        C1 * (qx[..., f(npy - 2), cwls] + qx[..., f(npy - 1), cwls])
        + C2 * (qout[..., f(npy), cwls] + qxx[..., f(npy - 2), cwls]))

    # ---- qyy: x-interp of qy to corners ----------------------------------
    rwls = slice(f(2), f(npy - 1) + 1)
    qyy = jnp.zeros(batch + (NW, NW), qin.dtype)
    qyy = qyy.at[..., rwls, f(3):f(npx - 2) + 1].set(
        A2 * (qy[..., rwls, r0:r0 + Ly] + qy[..., rwls, r0 + 3:r0 + 3 + Ly])
        + A1 * (qy[..., rwls, r0 + 1:r0 + 1 + Ly] + qy[..., rwls, r0 + 2:r0 + 2 + Ly]))
    qyy = qyy.at[..., rwls, f(2)].set(
        C1 * (qy[..., rwls, f(1)] + qy[..., rwls, f(2)])
        + C2 * (qout[..., rwls, f(1)] + qyy[..., rwls, f(3)]))
    qyy = qyy.at[..., rwls, f(npx - 1)].set(
        C1 * (qy[..., rwls, f(npx - 2)] + qy[..., rwls, f(npx - 1)])
        + C2 * (qout[..., rwls, f(npx)] + qyy[..., rwls, f(npx - 2)]))

    qout = qout.at[..., rwls, cwls].set(
        0.5 * (qxx[..., rwls, cwls] + qyy[..., rwls, cwls]))
    return qout


def a2b_ord2(qin, g):
    """a2b_edge.F90 a2b_ord2: 2nd-order cell->corner with edge factors."""
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
