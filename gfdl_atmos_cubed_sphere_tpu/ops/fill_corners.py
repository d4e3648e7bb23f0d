"""Cube-corner halo fill conventions for directional sweeps.

Transcribed from /root/reference/tools/fv_mp_mod.F90:944-1456 (fill_corners_2d
BGRID/AGRID variants, fill_corners_dgrid/cgrid) and
/root/reference/model/sw_core.F90:3360-3556 (fill_4corners/fill2_4corners for
cell scalars used by c_sw).

Cube corners have only 3 neighbor faces, so the ng x ng corner halo blocks of a
padded array have no physical source; these routines fill them from in-tile /
edge-halo values so 1-D sweeps can pass straight through, exactly reproducing
the reference conventions. All arrays are in [..., y, x] layout, padded with
halo H=3; Fortran 1-based index p maps to padded index p-1+H.

All tiles span a full cube face here, so every tile has all four corners.
"""

import jax.numpy as jnp

H = 3
NG = 3


def fi(i):
    """Fortran 1-based index -> 0-based padded array index."""
    return i - 1 + H


def _flip(a):
    return jnp.flip(a, axis=-1)


# ---------------------------------------------------------------------------
# Cell-centered (A-grid data layout) fills used by c_sw (sw_core.F90:3496).
# ---------------------------------------------------------------------------

def fill_4corners_cell(q, direction, npx):
    """sw_core.F90 fill_4corners: fill 2 cells at each corner for a sweep.

    q: [..., P, P] padded cell array. direction: 1 = x, 2 = y.
    """
    f = fi
    npy = npx
    if direction == 1:
        q = q.at[..., f(0), f(-1)].set(q[..., f(2), f(0)])
        q = q.at[..., f(0), f(0)].set(q[..., f(1), f(0)])
        q = q.at[..., f(0), f(npx + 1)].set(q[..., f(2), f(npx)])
        q = q.at[..., f(0), f(npx)].set(q[..., f(1), f(npx)])
        q = q.at[..., f(npy), f(0)].set(q[..., f(npy - 1), f(0)])
        q = q.at[..., f(npy), f(-1)].set(q[..., f(npy - 2), f(0)])
        q = q.at[..., f(npy), f(npx)].set(q[..., f(npy - 1), f(npx)])
        q = q.at[..., f(npy), f(npx + 1)].set(q[..., f(npy - 2), f(npx)])
    else:
        q = q.at[..., f(0), f(0)].set(q[..., f(0), f(1)])
        q = q.at[..., f(-1), f(0)].set(q[..., f(0), f(2)])
        q = q.at[..., f(0), f(npx)].set(q[..., f(0), f(npx - 1)])
        q = q.at[..., f(-1), f(npx)].set(q[..., f(0), f(npx - 2)])
        q = q.at[..., f(npy), f(0)].set(q[..., f(npy), f(1)])
        q = q.at[..., f(npy + 1), f(0)].set(q[..., f(npy), f(2)])
        q = q.at[..., f(npy), f(npx)].set(q[..., f(npy), f(npx - 1)])
        q = q.at[..., f(npy + 1), f(npx)].set(q[..., f(npy), f(npx - 2)])
    return q


# ---------------------------------------------------------------------------
# B-grid (corner point) scalar fills (fv_mp_mod.F90:944-982, BGRID branch).
# ---------------------------------------------------------------------------

def fill_corners_bgrid(q, direction, npx):
    """q: [..., NW, NW] padded corner-point array; fills ng x ng corner blocks."""
    f = fi
    npy = npx
    for j in range(1, NG + 1):
        if direction == 1:  # XDir
            # SW: q(1-i,1-j) = q(1-j, i+1)
            q = q.at[..., f(1 - j), f(1 - NG):f(0) + 1].set(
                _flip(q[..., f(2):f(NG + 1) + 1, f(1 - j)]))
            # NW: q(1-i,npy+j) = q(1-j, npy-i)
            q = q.at[..., f(npy + j), f(1 - NG):f(0) + 1].set(
                q[..., f(npy - NG):f(npy - 1) + 1, f(1 - j)])
            # SE: q(npx+i,1-j) = q(npx+j, i+1)
            q = q.at[..., f(1 - j), f(npx + 1):f(npx + NG) + 1].set(
                q[..., f(2):f(NG + 1) + 1, f(npx + j)])
            # NE: q(npx+i,npy+j) = q(npx+j, npy-i)
            q = q.at[..., f(npy + j), f(npx + 1):f(npx + NG) + 1].set(
                _flip(q[..., f(npy - NG):f(npy - 1) + 1, f(npx + j)]))
        else:  # YDir: q(1-j,1-i) = q(i+1, 1-j) etc.
            # SW
            q = q.at[..., f(1 - NG):f(0) + 1, f(1 - j)].set(
                _flip(q[..., f(1 - j), f(2):f(NG + 1) + 1]))
            # NW: q(1-j, npy+i) = q(i+1, npy+j)
            q = q.at[..., f(npy + 1):f(npy + NG) + 1, f(1 - j)].set(
                q[..., f(npy + j), f(2):f(NG + 1) + 1])
            # SE: q(npx+j, 1-i) = q(npx-i, 1-j)
            q = q.at[..., f(1 - NG):f(0) + 1, f(npx + j)].set(
                _flip(q[..., f(1 - j), f(npx - NG):f(npx - 1) + 1]))
            # NE: q(npx+j, npy+i) = q(npx-i, npy+j)
            q = q.at[..., f(npy + 1):f(npy + NG) + 1, f(npx + j)].set(
                q[..., f(npy + j), f(npx - NG):f(npx - 1) + 1])
    return q


# ---------------------------------------------------------------------------
# D-grid staggered vector fills (fv_mp_mod.F90:1249-1281).
# u: y-wall [..., NW, P]; v: x-wall [..., P, NW]; sign=-1 for wind vectors.
# ---------------------------------------------------------------------------

def fill_corners_dgrid_vector(u, v, npx, sign=-1.0):
    f = fi
    npy = npx
    for j in range(1, NG + 1):
        # x (=u) blocks:  x(1-i,1-j) = sign*y(1-j,i)  etc.
        u = u.at[..., f(1 - j), f(1 - NG):f(0) + 1].set(
            sign * _flip(v[..., f(1):f(NG) + 1, f(1 - j)]))
        u = u.at[..., f(npy + j), f(1 - NG):f(0) + 1].set(
            v[..., f(npy - NG):f(npy - 1) + 1, f(1 - j)])
        u = u.at[..., f(1 - j), f(npx):f(npx - 1 + NG) + 1].set(
            v[..., f(1):f(NG) + 1, f(npx + j)])
        u = u.at[..., f(npy + j), f(npx):f(npx - 1 + NG) + 1].set(
            sign * _flip(v[..., f(npy - NG):f(npy - 1) + 1, f(npx + j)]))
    for j in range(1, NG + 1):
        # y (=v) blocks: y(1-i,1-j) = sign*x(j,1-i) etc.
        v = v.at[..., f(1 - j), f(1 - NG):f(0) + 1].set(
            sign * u[..., f(1 - NG):f(0) + 1, f(j)])
        v = v.at[..., f(npy - 1 + j), f(1 - NG):f(0) + 1].set(
            _flip(u[..., f(npy + 1):f(npy + NG) + 1, f(j)]))
        v = v.at[..., f(1 - j), f(npx + 1):f(npx + NG) + 1].set(
            _flip(u[..., f(1 - NG):f(0) + 1, f(npx - j)]))
        v = v.at[..., f(npy - 1 + j), f(npx + 1):f(npx + NG) + 1].set(
            sign * u[..., f(npy + 1):f(npy + NG) + 1, f(npx - j)])
    return u, v
