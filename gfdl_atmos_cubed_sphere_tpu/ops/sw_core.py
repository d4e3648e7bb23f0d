"""Lin-Rood shallow-water solvers on Lagrangian surfaces (C-grid + D-grid).

Re-implementation of /root/reference/model/sw_core.F90 (c_sw:79, d_sw:494,
d2a2c_vect:3006, divergence_corner:1740, del6_vt_flux:1608, xtp_u:2154,
ytp_v:2524) as vectorized JAX ops on padded whole-face arrays [..., y, x].

Index conventions (H = 3 halo; Fortran 1-based index p -> padded index p-1+H):
  cell arrays    [..., NC, NC],  NC = n+2H     (delp, pt, w, ua, va)
  y-wall arrays  [..., NW, NC],  NW = n+1+2H   (u, vc, vt, cry, yfx)
  x-wall arrays  [..., NC, NW]                 (v, uc, ut, crx, xfx)
  corner arrays  [..., NW, NW]                 (divg_d, ke, vort, ub, vb)

Every tile spans a full cube face, so all four edges/corners are present and
the reference's per-rank `is==1`-style conditionals become static index ops.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from .tp_core import fv_tp_2d, deln_damp_fluxes, _pert_ppm_iv1
from .a2b_edge import a2b_ord4, a2b_ord2
from .fill_corners import (fill_4corners_cell, fill_corners_bgrid,
                           fill_corners_dgrid_vector, fi, cube_edges)
from ..parallel.halo import copy_corners

H = 3
A1, A2 = 0.5625, -0.0625
C1, C2, C3 = -2.0 / 14.0, 11.0 / 14.0, 5.0 / 14.0
S11, S14, S15 = 11.0 / 14.0, 4.0 / 7.0, 3.0 / 14.0
P1, P2 = 7.0 / 12.0, -1.0 / 12.0
R3 = 1.0 / 3.0
NEAR_ZERO = 1.0e-9          # KE limiter threshold (sw_core.F90:39)


def fs(i0, i1):
    """Inclusive Fortran-index slice."""
    return slice(i0 - 1 + H, i1 + H)


def _cl(q):
    """cell i-1 viewed at wall i (pad one column left)."""
    pad = [(0, 0)] * (q.ndim - 1) + [(1, 0)]
    return jnp.pad(q, pad)


def _cr(q):
    """cell i viewed at wall i (pad one column right)."""
    pad = [(0, 0)] * (q.ndim - 1) + [(0, 1)]
    return jnp.pad(q, pad)


def _rl(q):
    """cell j-1 viewed at wall j (pad one row on top)."""
    pad = [(0, 0)] * (q.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(q, pad)


def _rr(q):
    pad = [(0, 0)] * (q.ndim - 2) + [(0, 1), (0, 0)]
    return jnp.pad(q, pad)


def edge_interpolate4(ua, dxa, axis=-1):
    """sw_core.F90 edge_interpolate4:3338 on a 4-point window along `axis`."""
    ua = jnp.moveaxis(ua, axis, -1)
    dxa = jnp.moveaxis(dxa, axis, -1)
    t1 = dxa[..., 0] + dxa[..., 1]
    t2 = dxa[..., 2] + dxa[..., 3]
    return 0.5 * (((t1 + dxa[..., 1]) * ua[..., 1] - dxa[..., 1] * ua[..., 0]) / t1
                  + ((t2 + dxa[..., 2]) * ua[..., 2] - dxa[..., 2] * ua[..., 3]) / t2)


# ===========================================================================
# d2a2c_vect (sw_core.F90:3006): D-grid winds -> A-grid + C-grid winds
# ===========================================================================

def _d2a2c_vect_dp(u, v, g):
    """grid_type >= 3 variant (sw_core.F90:849-861 + the orthogonal-grid
    simplifications): 4th-order interior averaging everywhere, no edge or
    corner specials; ut = uc, vt = vc (cosa == 0)."""
    A1, A2 = 0.5625, -0.0625

    def to_cells(w, axis):
        # 2nd order everywhere, 4th order where the stencil fits
        wm = jnp.moveaxis(w, axis, -1)
        c2 = 0.5 * (wm[..., :-1] + wm[..., 1:])
        c4 = (A2 * (wm[..., :-3] + wm[..., 3:])
              + A1 * (wm[..., 1:-2] + wm[..., 2:-1]))
        c2 = c2.at[..., 1:-1].set(c4)
        return jnp.moveaxis(c2, -1, axis)

    def to_walls(c, axis):
        cm = jnp.moveaxis(c, axis, -1)
        w2 = 0.5 * (cm[..., :-1] + cm[..., 1:])
        w4 = (A2 * (cm[..., :-3] + cm[..., 3:])
              + A1 * (cm[..., 1:-2] + cm[..., 2:-1]))
        w2 = w2.at[..., 1:-1].set(w4)
        # extend to full wall count (one wall beyond each cell end)
        first = cm[..., :1]
        last = cm[..., -1:]
        ww = jnp.concatenate([first, w2, last], axis=-1)
        return jnp.moveaxis(ww, -1, axis)

    ua = to_cells(u, -2)
    va = to_cells(v, -1)
    uc = to_walls(ua, -1)
    vc = to_walls(va, -2)
    return ua, va, uc, vc, uc, vc


def _ix(n, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (1, n), 1)


def _iy(n, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (n, 1), 0)


def _sel_col(a, i, val):
    """Override column i with val ([..., Y, 1] or full-size) via a lane
    select (Mosaic-safe in-kernel replacement for .at[..., :, i].set)."""
    return jnp.where(_ix(a.shape[-1]) == i, val, a)


def _sel_row(a, j, val):
    return jnp.where(_iy(a.shape[-2]) == j, val, a)


def _sel_point(a, j, i, val, add=False):
    """Point override/add via two-stage select; val [..., 1, 1]."""
    ix = _ix(a.shape[-1])
    iy = _iy(a.shape[-2])
    zero = jnp.zeros((), a.dtype)
    row_val = jnp.where(ix == i, val, zero)
    if add:
        return jnp.where(iy == j, a + row_val, a)
    return jnp.where((iy == j) & (ix == i), row_val, a)


def _sel_region(a, val, j0, j1, i0, i1, add=False):
    """Override/add on rows [j0, j1) x cols [i0, i1); val full-size."""
    ix = _ix(a.shape[-1])
    iy = _iy(a.shape[-2])
    m = (iy >= j0) & (iy < j1) & (ix >= i0) & (ix < i1)
    if add:
        return jnp.where(m, a + val, a)
    return jnp.where(m, val, a)


def d2a2c_vect(u, v, g, in_kernel=False):
    """u: [..., NW, NC] D x-wind; v: [..., NC, NW] D y-wind (halo-exchanged).

    Returns (ua, va, uc, vc, ut, vt): A-grid winds + contravariant forms on
    cells, C-grid winds on walls, contravariant C winds ut/vt.

    in_kernel=True (the c_sw Pallas mega-kernel, ops/pallas_csw.py) rewrites
    every static .at[].set override as iota-masked selects — current Pallas
    TPU lowers static-slice .at[].set to scatter, and the jnp.flip corner
    fills to an unimplemented `rev`.
    """
    if getattr(g, "grid_type", 0) >= 3:
        return _d2a2c_vect_dp(u, v, g)
    if getattr(g, "bounded", False):
        return _d2a2c_vect_bounded(u, v, g)
    if in_kernel:
        return _d2a2c_vect_sel(u, v, g)
    npx = g.npx
    n = g.n
    f = fi
    npt = 4
    NC = n + 2 * H
    NW = n + 1 + 2 * H
    batch = u.shape[:-2]
    dt_ = u.dtype

    # --- utmp / vtmp: D winds averaged to cell centers ---------------------
    utmp = 0.5 * (u[..., :-1, :] + u[..., 1:, :])
    vtmp = 0.5 * (v[..., :, :-1] + v[..., :, 1:])
    L = npx - 2 * npt + 1                  # box cells [npt, npx-npt]
    j0 = f(npt)
    w0 = f(npt - 1)                        # wall j-1 for first box cell
    u4 = (A2 * (u[..., w0:w0 + L, :] + u[..., w0 + 3:w0 + 3 + L, :])
          + A1 * (u[..., w0 + 1:w0 + 1 + L, :] + u[..., w0 + 2:w0 + 2 + L, :]))
    utmp = utmp.at[..., j0:j0 + L, j0:j0 + L].set(u4[..., :, j0:j0 + L])
    v4 = (A2 * (v[..., :, w0:w0 + L] + v[..., :, w0 + 3:w0 + 3 + L])
          + A1 * (v[..., :, w0 + 1:w0 + 1 + L] + v[..., :, w0 + 2:w0 + 2 + L]))
    vtmp = vtmp.at[..., j0:j0 + L, j0:j0 + L].set(v4[..., j0:j0 + L, :])

    ua = (utmp - vtmp * g.cosa_s) * g.rsin2
    va = (vtmp - utmp * g.cosa_s) * g.rsin2

    r0, rn = f(0), f(npx)
    je = npx - 1

    # --- utmp corner fills (sw_core.F90:3165-3185) -------------------------
    utmp = utmp.at[..., r0, f(-2):r0 + 1].set(
        -jnp.flip(vtmp[..., f(1):f(3) + 1, r0], -1))
    utmp = utmp.at[..., r0, f(npx):f(npx + 2) + 1].set(
        vtmp[..., f(1):f(3) + 1, rn])
    utmp = utmp.at[..., rn, f(npx):f(npx + 2) + 1].set(
        -jnp.flip(vtmp[..., f(je - 2):f(je) + 1, rn], -1))
    utmp = utmp.at[..., rn, f(-2):r0 + 1].set(
        vtmp[..., f(je - 2):f(je) + 1, r0])

    # --- uc: 4th-order A->C in x ------------------------------------------
    uc = jnp.zeros(batch + (NC, NW), dt_)
    Lc = npx + 2                            # walls [0, npx+1]
    s = f(-2)
    uc_m = (A2 * (utmp[..., :, s:s + Lc] + utmp[..., :, s + 3:s + 3 + Lc])
            + A1 * (utmp[..., :, s + 1:s + 1 + Lc] + utmp[..., :, s + 2:s + 2 + Lc]))
    uc = uc.at[..., :, r0:r0 + Lc].set(uc_m)

    # ua corner fills (sw_core.F90:3202-3218)
    ua = ua.at[..., r0, f(-1)].set(-va[..., f(2), r0])
    ua = ua.at[..., r0, f(0)].set(-va[..., f(1), r0])
    ua = ua.at[..., r0, f(npx)].set(va[..., f(1), rn])
    ua = ua.at[..., r0, f(npx + 1)].set(va[..., f(2), rn])
    ua = ua.at[..., rn, f(npx)].set(-va[..., f(npx - 1), rn])
    ua = ua.at[..., rn, f(npx + 1)].set(-va[..., f(npx - 2), rn])
    ua = ua.at[..., rn, f(-1)].set(va[..., f(npx - 2), r0])
    ua = ua.at[..., rn, f(0)].set(va[..., f(npx - 1), r0])

    # west edge (sw_core.F90:3220-3236)
    uc0 = (C1 * utmp[..., :, f(-2)] + C2 * utmp[..., :, f(-1)]
           + C3 * utmp[..., :, f(0)])
    ut1 = edge_interpolate4(ua[..., :, f(-1):f(2) + 1],
                            g.dxa[..., :, f(-1):f(2) + 1])
    uc1 = jnp.where(ut1 > 0.0, ut1 * g.sin_sg3[..., :, f(0)],
                    ut1 * g.sin_sg1[..., :, f(1)])
    uc2 = (C1 * utmp[..., :, f(3)] + C2 * utmp[..., :, f(2)]
           + C3 * utmp[..., :, f(1)])
    uc = uc.at[..., :, f(0)].set(uc0)
    uc = uc.at[..., :, f(1)].set(uc1)
    uc = uc.at[..., :, f(2)].set(uc2)
    # east edge (sw_core.F90:3238-3253)
    ucm = (C1 * utmp[..., :, f(npx - 3)] + C2 * utmp[..., :, f(npx - 2)]
           + C3 * utmp[..., :, f(npx - 1)])
    utn = edge_interpolate4(ua[..., :, f(npx - 2):f(npx + 1) + 1],
                            g.dxa[..., :, f(npx - 2):f(npx + 1) + 1])
    ucn = jnp.where(utn > 0.0, utn * g.sin_sg3[..., :, f(npx - 1)],
                    utn * g.sin_sg1[..., :, f(npx)])
    ucp = (C3 * utmp[..., :, f(npx)] + C2 * utmp[..., :, f(npx + 1)]
           + C1 * utmp[..., :, f(npx + 2)])
    uc = uc.at[..., :, f(npx - 1)].set(ucm)
    uc = uc.at[..., :, f(npx)].set(ucn)
    uc = uc.at[..., :, f(npx + 1)].set(ucp)

    ut = (uc - v * g.cosa_u) * g.rsin_u
    ut = ut.at[..., :, f(1)].set(ut1)
    ut = ut.at[..., :, f(npx)].set(utn)

    # --- vtmp corner fills (sw_core.F90:3258-3278) -------------------------
    vtmp = vtmp.at[..., f(-2):r0 + 1, r0].set(
        -jnp.flip(utmp[..., r0, f(1):f(3) + 1], -1))
    vtmp = vtmp.at[..., f(npx):f(npx + 2) + 1, r0].set(
        utmp[..., rn, f(1):f(3) + 1])
    vtmp = vtmp.at[..., f(-2):r0 + 1, rn].set(
        utmp[..., r0, f(je - 2):f(je) + 1])
    vtmp = vtmp.at[..., f(npx):f(npx + 2) + 1, rn].set(
        -jnp.flip(utmp[..., rn, f(je - 2):f(je) + 1], -1))
    # va corner fills (sw_core.F90:3280-3296)
    va = va.at[..., f(-1), r0].set(-ua[..., r0, f(2)])
    va = va.at[..., f(0), r0].set(-ua[..., r0, f(1)])
    va = va.at[..., f(0), rn].set(ua[..., r0, f(npx - 1)])
    va = va.at[..., f(-1), rn].set(ua[..., r0, f(npx - 2)])
    va = va.at[..., f(npx), rn].set(-ua[..., rn, f(npx - 1)])
    va = va.at[..., f(npx + 1), rn].set(-ua[..., rn, f(npx - 2)])
    va = va.at[..., f(npx), r0].set(ua[..., rn, f(1)])
    va = va.at[..., f(npx + 1), r0].set(ua[..., rn, f(2)])

    # --- vc: 4th-order A->C in y (sw_core.F90:3298-3334) -------------------
    vc = jnp.zeros(batch + (NW, NC), dt_)
    vc_m = (A2 * (vtmp[..., s:s + Lc, :] + vtmp[..., s + 3:s + 3 + Lc, :])
            + A1 * (vtmp[..., s + 1:s + 1 + Lc, :] + vtmp[..., s + 2:s + 2 + Lc, :]))
    vc = vc.at[..., r0:r0 + Lc, :].set(vc_m)
    vc = vc.at[..., f(0), :].set(
        C1 * vtmp[..., f(-2), :] + C2 * vtmp[..., f(-1), :] + C3 * vtmp[..., f(0), :])
    vt1 = edge_interpolate4(va[..., f(-1):f(2) + 1, :],
                            g.dya[..., f(-1):f(2) + 1, :], axis=-2)
    vc = vc.at[..., f(1), :].set(
        jnp.where(vt1 > 0.0, vt1 * g.sin_sg4[..., f(0), :],
                  vt1 * g.sin_sg2[..., f(1), :]))
    vc = vc.at[..., f(2), :].set(
        C1 * vtmp[..., f(3), :] + C2 * vtmp[..., f(2), :] + C3 * vtmp[..., f(1), :])
    vc = vc.at[..., f(npx - 1), :].set(
        C1 * vtmp[..., f(npx - 3), :] + C2 * vtmp[..., f(npx - 2), :]
        + C3 * vtmp[..., f(npx - 1), :])
    vtn = edge_interpolate4(va[..., f(npx - 2):f(npx + 1) + 1, :],
                            g.dya[..., f(npx - 2):f(npx + 1) + 1, :], axis=-2)
    vc = vc.at[..., f(npx), :].set(
        jnp.where(vtn > 0.0, vtn * g.sin_sg4[..., f(npx - 1), :],
                  vtn * g.sin_sg2[..., f(npx), :]))
    vc = vc.at[..., f(npx + 1), :].set(
        C1 * vtmp[..., f(npx + 2), :] + C2 * vtmp[..., f(npx + 1), :]
        + C3 * vtmp[..., f(npx), :])

    vt = (vc - u * g.cosa_v) * g.rsin_v
    vt = vt.at[..., f(1), :].set(vt1)
    vt = vt.at[..., f(npx), :].set(vtn)
    return ua, va, uc, vc, ut, vt


def _d2a2c_vect_bounded(u, v, g):
    """bounded_domain variant of d2a2c_vect (sw_core.F90:3065-3096 utmp/vtmp,
    :3199 uc/ut, :3310 vc/vt with every `.not. bounded_domain` edge block
    skipped): regular interior stencils everywhere on a gnomonic patch whose
    halo ring carries externally supplied (nest/regional) BC data. The
    outermost row/column falls back to 2nd-order averaging exactly as the
    reference's jsd/jed rows; the outermost walls (never consumed by the
    interior dynamics) are edge-clamped."""
    # D -> A: 4th order on interior rows/cols, 2nd order at the frame edge
    utmp2 = 0.5 * (u[..., :-1, :] + u[..., 1:, :])
    u4 = (A2 * (u[..., :-3, :] + u[..., 3:, :])
          + A1 * (u[..., 1:-2, :] + u[..., 2:-1, :]))
    utmp = jnp.concatenate([utmp2[..., :1, :], u4, utmp2[..., -1:, :]], -2)
    vtmp2 = 0.5 * (v[..., :, :-1] + v[..., :, 1:])
    v4 = (A2 * (v[..., :, :-3] + v[..., :, 3:])
          + A1 * (v[..., :, 1:-2] + v[..., :, 2:-1]))
    vtmp = jnp.concatenate([vtmp2[..., :, :1], v4, vtmp2[..., :, -1:]], -1)

    ua = (utmp - vtmp * g.cosa_s) * g.rsin2
    va = (vtmp - utmp * g.cosa_s) * g.rsin2

    # A -> C: 4th order where the stencil fits, 2nd order one wall in,
    # clamp at the outermost walls
    uc_i = (A2 * (utmp[..., :, :-3] + utmp[..., :, 3:])
            + A1 * (utmp[..., :, 1:-2] + utmp[..., :, 2:-1]))
    uw2 = 0.5 * (utmp[..., :, :-1] + utmp[..., :, 1:])
    uc = jnp.concatenate([utmp[..., :, :1], uw2[..., :, :1], uc_i,
                          uw2[..., :, -1:], utmp[..., :, -1:]], -1)
    ut = (uc - v * g.cosa_u) * g.rsin_u

    vc_i = (A2 * (vtmp[..., :-3, :] + vtmp[..., 3:, :])
            + A1 * (vtmp[..., 1:-2, :] + vtmp[..., 2:-1, :]))
    vw2 = 0.5 * (vtmp[..., :-1, :] + vtmp[..., 1:, :])
    vc = jnp.concatenate([vtmp[..., :1, :], vw2[..., :1, :], vc_i,
                          vw2[..., -1:, :], vtmp[..., -1:, :]], -2)
    vt = (vc - u * g.cosa_v) * g.rsin_v
    return ua, va, uc, vc, ut, vt


def _d2a2c_vect_sel(u, v, g):
    """Select-based restatement of d2a2c_vect for Pallas kernel bodies:
    identical numerics, every .at[].set / jnp.flip replaced by iota-masked
    selects / per-point reads (sw_core.F90:3006 d2a2c_vect)."""
    npx = g.npx
    n = g.n
    f = fi
    npt = 4
    NC = n + 2 * H
    NW = n + 1 + 2 * H
    dt_ = u.dtype
    je = npx - 1

    utmp = 0.5 * (u[..., :-1, :] + u[..., 1:, :])
    vtmp = 0.5 * (v[..., :, :-1] + v[..., :, 1:])
    L = npx - 2 * npt + 1
    j0 = f(npt)

    # 4th-order D->A over the interior box, computed full-frame then masked
    pad2 = lambda a, ax: jnp.pad(a, [(0, 0)] * (a.ndim + ax) + [(1, 1)]
                                 + [(0, 0)] * (-1 - ax))
    u4f = pad2(A1 * (u[..., 1:-2, :] + u[..., 2:-1, :])
               + A2 * (u[..., :-3, :] + u[..., 3:, :]), -2)
    utmp = _sel_region(utmp, u4f, j0, j0 + L, j0, j0 + L)
    v4f = pad2(A1 * (v[..., :, 1:-2] + v[..., :, 2:-1])
               + A2 * (v[..., :, :-3] + v[..., :, 3:]), -1)
    vtmp = _sel_region(vtmp, v4f, j0, j0 + L, j0, j0 + L)

    ua = (utmp - vtmp * g.cosa_s) * g.rsin2
    va = (vtmp - utmp * g.cosa_s) * g.rsin2

    r0, rn = f(0), f(npx)

    def pt(a, j, i):
        return a[..., j:j + 1, i:i + 1]

    # utmp corner fills (sw_core.F90:3165-3185), per-point
    for k in range(3):
        utmp = _sel_point(utmp, r0, f(-2) + k, -pt(vtmp, f(3) - k, r0))
        utmp = _sel_point(utmp, r0, f(npx) + k, pt(vtmp, f(1) + k, rn))
        utmp = _sel_point(utmp, rn, f(npx) + k, -pt(vtmp, f(je) - k, rn))
        utmp = _sel_point(utmp, rn, f(-2) + k, pt(vtmp, f(je - 2) + k, r0))

    # uc: 4th-order A->C in x on walls [0, npx+1], other walls zero
    Lc = npx + 2
    ucf = jnp.pad(A1 * (utmp[..., :, 1:-2] + utmp[..., :, 2:-1])
                  + A2 * (utmp[..., :, :-3] + utmp[..., :, 3:]),
                  [(0, 0)] * (utmp.ndim - 1) + [(2, 2)])     # [.., NC, NW]
    uc = _sel_region(jnp.zeros_like(ucf), ucf, 0, NC, r0, r0 + Lc)

    # ua corner fills (sw_core.F90:3202-3218)
    ua = _sel_point(ua, r0, f(-1), -pt(va, f(2), r0))
    ua = _sel_point(ua, r0, f(0), -pt(va, f(1), r0))
    ua = _sel_point(ua, r0, f(npx), pt(va, f(1), rn))
    ua = _sel_point(ua, r0, f(npx + 1), pt(va, f(2), rn))
    ua = _sel_point(ua, rn, f(npx), -pt(va, f(npx - 1), rn))
    ua = _sel_point(ua, rn, f(npx + 1), -pt(va, f(npx - 2), rn))
    ua = _sel_point(ua, rn, f(-1), pt(va, f(npx - 2), r0))
    ua = _sel_point(ua, rn, f(0), pt(va, f(npx - 1), r0))

    def colk(a, i):
        return a[..., :, f(i):f(i) + 1]

    # west edge columns (sw_core.F90:3220-3236)
    uc0 = C1 * colk(utmp, -2) + C2 * colk(utmp, -1) + C3 * colk(utmp, 0)
    ut1 = edge_interpolate4(ua[..., :, f(-1):f(2) + 1],
                            g.dxa[..., :, f(-1):f(2) + 1])[..., None]
    uc1 = jnp.where(ut1 > 0.0, ut1 * colk(g.sin_sg3, 0),
                    ut1 * colk(g.sin_sg1, 1))
    uc2 = C1 * colk(utmp, 3) + C2 * colk(utmp, 2) + C3 * colk(utmp, 1)
    uc = _sel_col(uc, f(0), uc0)
    uc = _sel_col(uc, f(1), uc1)
    uc = _sel_col(uc, f(2), uc2)
    # east edge (sw_core.F90:3238-3253)
    ucm = (C1 * colk(utmp, npx - 3) + C2 * colk(utmp, npx - 2)
           + C3 * colk(utmp, npx - 1))
    utn = edge_interpolate4(ua[..., :, f(npx - 2):f(npx + 1) + 1],
                            g.dxa[..., :, f(npx - 2):f(npx + 1) + 1])[..., None]
    ucn = jnp.where(utn > 0.0, utn * colk(g.sin_sg3, npx - 1),
                    utn * colk(g.sin_sg1, npx))
    ucp = (C3 * colk(utmp, npx) + C2 * colk(utmp, npx + 1)
           + C1 * colk(utmp, npx + 2))
    uc = _sel_col(uc, f(npx - 1), ucm)
    uc = _sel_col(uc, f(npx), ucn)
    uc = _sel_col(uc, f(npx + 1), ucp)

    ut = (uc - v * g.cosa_u) * g.rsin_u
    ut = _sel_col(ut, f(1), ut1)
    ut = _sel_col(ut, f(npx), utn)

    # vtmp corner fills (sw_core.F90:3258-3278)
    for k in range(3):
        vtmp = _sel_point(vtmp, f(-2) + k, r0, -pt(utmp, r0, f(3) - k))
        vtmp = _sel_point(vtmp, f(npx) + k, r0, pt(utmp, rn, f(1) + k))
        vtmp = _sel_point(vtmp, f(-2) + k, rn, pt(utmp, r0, f(je - 2) + k))
        vtmp = _sel_point(vtmp, f(npx) + k, rn, -pt(utmp, rn, f(je) - k))
    # va corner fills (sw_core.F90:3280-3296)
    va = _sel_point(va, f(-1), r0, -pt(ua, r0, f(2)))
    va = _sel_point(va, f(0), r0, -pt(ua, r0, f(1)))
    va = _sel_point(va, f(0), rn, pt(ua, r0, f(npx - 1)))
    va = _sel_point(va, f(-1), rn, pt(ua, r0, f(npx - 2)))
    va = _sel_point(va, f(npx), rn, -pt(ua, rn, f(npx - 1)))
    va = _sel_point(va, f(npx + 1), rn, -pt(ua, rn, f(npx - 2)))
    va = _sel_point(va, f(npx), r0, pt(ua, rn, f(1)))
    va = _sel_point(va, f(npx + 1), r0, pt(ua, rn, f(2)))

    # vc: 4th-order A->C in y (sw_core.F90:3298-3334)
    vcf = jnp.pad(A1 * (vtmp[..., 1:-2, :] + vtmp[..., 2:-1, :])
                  + A2 * (vtmp[..., :-3, :] + vtmp[..., 3:, :]),
                  [(0, 0)] * (vtmp.ndim - 2) + [(2, 2), (0, 0)])
    vc = _sel_region(jnp.zeros_like(vcf), vcf, r0, r0 + Lc, 0, NC)

    def rowk(a, jf):
        return a[..., f(jf):f(jf) + 1, :]

    vc = _sel_row(vc, f(0), C1 * rowk(vtmp, -2) + C2 * rowk(vtmp, -1)
                  + C3 * rowk(vtmp, 0))
    vt1 = edge_interpolate4(va[..., f(-1):f(2) + 1, :],
                            g.dya[..., f(-1):f(2) + 1, :], axis=-2)[..., None, :]
    vc = _sel_row(vc, f(1), jnp.where(vt1 > 0.0, vt1 * rowk(g.sin_sg4, 0),
                                      vt1 * rowk(g.sin_sg2, 1)))
    vc = _sel_row(vc, f(2), C1 * rowk(vtmp, 3) + C2 * rowk(vtmp, 2)
                  + C3 * rowk(vtmp, 1))
    vc = _sel_row(vc, f(npx - 1), C1 * rowk(vtmp, npx - 3)
                  + C2 * rowk(vtmp, npx - 2) + C3 * rowk(vtmp, npx - 1))
    vtn = edge_interpolate4(va[..., f(npx - 2):f(npx + 1) + 1, :],
                            g.dya[..., f(npx - 2):f(npx + 1) + 1, :],
                            axis=-2)[..., None, :]
    vc = _sel_row(vc, f(npx), jnp.where(vtn > 0.0, vtn * rowk(g.sin_sg4, npx - 1),
                                        vtn * rowk(g.sin_sg2, npx)))
    vc = _sel_row(vc, f(npx + 1), C1 * rowk(vtmp, npx + 2)
                  + C2 * rowk(vtmp, npx + 1) + C3 * rowk(vtmp, npx))

    vt = (vc - u * g.cosa_v) * g.rsin_v
    vt = _sel_row(vt, f(1), vt1)
    vt = _sel_row(vt, f(npx), vtn)
    return ua, va, uc, vc, ut, vt


# ===========================================================================
# divergence_corner (sw_core.F90:1740)
# ===========================================================================

def divergence_corner(u, v, ua, va, g, in_kernel=False):
    npx = g.npx
    f = fi
    edges = cube_edges(g)
    uf = ((u - 0.25 * (_rl(va) + _rr(va)) * (_rl(g.cos_sg4) + _rr(g.cos_sg2)))
          * g.dyc * 0.5 * (_rl(g.sin_sg4) + _rr(g.sin_sg2)))
    if in_kernel and edges:
        # edge rows via one full-frame value + row select (Mosaic-safe)
        uf_e = u * g.dyc * 0.5 * (_rl(g.sin_sg4) + _rr(g.sin_sg2))
        iyu = _iy(uf.shape[-2])
        uf = jnp.where((iyu == f(1)) | (iyu == f(npx)), uf_e, uf)
    else:
        for jw in (1, npx) if edges else ():
            uf = uf.at[..., f(jw), :].set(
                u[..., f(jw), :] * g.dyc[..., f(jw), :] * 0.5
                * (g.sin_sg4[..., f(jw - 1), :] + g.sin_sg2[..., f(jw), :]))
    vf = ((v - 0.25 * (_cl(ua) + _cr(ua)) * (_cl(g.cos_sg3) + _cr(g.cos_sg1)))
          * g.dxc * 0.5 * (_cl(g.sin_sg3) + _cr(g.sin_sg1)))
    if in_kernel and edges:
        vf_e = v * g.dxc * 0.5 * (_cl(g.sin_sg3) + _cr(g.sin_sg1))
        ixv = _ix(vf.shape[-1])
        vf = jnp.where((ixv == f(1)) | (ixv == f(npx)), vf_e, vf)
    else:
        for iw in (1, npx) if edges else ():
            vf = vf.at[..., :, f(iw)].set(
                v[..., :, f(iw)] * g.dxc[..., :, f(iw)] * 0.5
                * (g.sin_sg3[..., :, f(iw - 1)] + g.sin_sg1[..., :, f(iw)]))
    # divg(i,j) = vf(i,j-1) - vf(i,j) + uf(i-1,j) - uf(i,j)  (corners)
    divg = (_rl(vf) - _rr(vf) + _cl(uf) - _cr(uf))
    if edges and in_kernel:
        def pv(a, j, i):
            return a[..., f(j):f(j) + 1, f(i):f(i) + 1]

        divg = _sel_point(divg, f(1), f(1), -pv(vf, 0, 1), add=True)
        divg = _sel_point(divg, f(1), f(npx), -pv(vf, 0, npx), add=True)
        divg = _sel_point(divg, f(npx), f(npx), pv(vf, npx, npx), add=True)
        divg = _sel_point(divg, f(npx), f(1), pv(vf, npx, 1), add=True)
    elif edges:
        divg = divg.at[..., f(1), f(1)].add(-vf[..., f(0), f(1)])
        divg = divg.at[..., f(1), f(npx)].add(-vf[..., f(0), f(npx)])
        divg = divg.at[..., f(npx), f(npx)].add(vf[..., f(npx), f(npx)])
        divg = divg.at[..., f(npx), f(1)].add(vf[..., f(npx), f(1)])
    return divg * g.rarea_c


# ===========================================================================
# c_sw (sw_core.F90:79): C-grid half-step
# ===========================================================================

def c_sw(delp, pt, w, u, v, g, dt2, hydrostatic=True, nord=0, sw_mode=False,
         in_kernel=False):
    """All inputs padded (halo-exchanged). Returns SimpleNamespace with
    delpc, ptc, wc (cell arrays, valid on rim [0..npx] cells), uc, vc
    (updated on compute walls), ua, va, divg_d. in_kernel=True: iota-select
    edge handling for Pallas kernel bodies (ops/pallas_csw.py)."""
    npx = g.npx
    f = fi
    edges = cube_edges(g)
    f4 = fill_4corners_cell if edges else (lambda q, d, npx_: q)
    ua, va, uc, vc, ut, vt = d2a2c_vect(u, v, g, in_kernel=in_kernel)
    divg_d = (divergence_corner(u, v, ua, va, g, in_kernel=in_kernel)
              if nord > 0 else None)

    ut_s = dt2 * ut * g.dy * jnp.where(ut > 0.0, _cl(g.sin_sg3), _cr(g.sin_sg1))
    vt_s = dt2 * vt * g.dx * jnp.where(vt > 0.0, _rl(g.sin_sg4), _rr(g.sin_sg2))

    # ---- transport delp (pt, w) ------------------------------------------
    dx1 = f4(delp, 1, npx)
    fx1 = ut_s * jnp.where(ut_s > 0.0, _cl(dx1), _cr(dx1))
    if not sw_mode:
        px1 = f4(pt, 1, npx)
        fxp = fx1 * jnp.where(ut_s > 0.0, _cl(px1), _cr(px1))
    if not hydrostatic:
        wx1 = f4(w, 1, npx)
        fxw = fx1 * jnp.where(ut_s > 0.0, _cl(wx1), _cr(wx1))

    dy1 = f4(delp, 2, npx)
    fy1 = vt_s * jnp.where(vt_s > 0.0, _rl(dy1), _rr(dy1))
    if not sw_mode:
        py1 = f4(pt, 2, npx)
        fyp = fy1 * jnp.where(vt_s > 0.0, _rl(py1), _rr(py1))
    if not hydrostatic:
        wy1 = f4(w, 2, npx)
        fyw = fy1 * jnp.where(vt_s > 0.0, _rl(wy1), _rr(wy1))

    def div(fx, fy):
        return (fx[..., :, :-1] - fx[..., :, 1:]
                + fy[..., :-1, :] - fy[..., 1:, :]) * g.rarea

    delpc = delp + div(fx1, fy1)
    if sw_mode:
        ptc = pt
    else:
        ptc = (pt * delp + div(fxp, fyp)) / delpc
    wc = None if hydrostatic else (w * delp + div(fxw, fyw)) / delpc

    # ---- KE (sw_core.F90:297-372) ----------------------------------------
    kepos = uc[..., :, :-1]
    keneg = uc[..., :, 1:]
    vtpos = vc[..., :-1, :]
    vtneg = vc[..., 1:, :]
    if edges and in_kernel:
        def ccol(a, i):
            return a[..., :, f(i):f(i) + 1]

        def crow(a, jf):
            return a[..., f(jf):f(jf) + 1, :]

        kepos = _sel_col(kepos, f(1), ccol(uc, 1) * ccol(g.sin_sg1, 1)
                         + ccol(v, 1) * ccol(g.cos_sg1, 1))
        kepos = _sel_col(kepos, f(npx), ccol(uc, npx) * ccol(g.sin_sg1, npx)
                         + ccol(v, npx) * ccol(g.cos_sg1, npx))
        keneg = _sel_col(keneg, f(0), ccol(uc, 1) * ccol(g.sin_sg3, 0)
                         + ccol(v, 1) * ccol(g.cos_sg3, 0))
        keneg = _sel_col(keneg, f(npx - 1),
                         ccol(uc, npx) * ccol(g.sin_sg3, npx - 1)
                         + ccol(v, npx) * ccol(g.cos_sg3, npx - 1))
        vtpos = _sel_row(vtpos, f(1), crow(vc, 1) * crow(g.sin_sg2, 1)
                         + crow(u, 1) * crow(g.cos_sg2, 1))
        vtpos = _sel_row(vtpos, f(npx), crow(vc, npx) * crow(g.sin_sg2, npx)
                         + crow(u, npx) * crow(g.cos_sg2, npx))
        vtneg = _sel_row(vtneg, f(0), crow(vc, 1) * crow(g.sin_sg4, 0)
                         + crow(u, 1) * crow(g.cos_sg4, 0))
        vtneg = _sel_row(vtneg, f(npx - 1),
                         crow(vc, npx) * crow(g.sin_sg4, npx - 1)
                         + crow(u, npx) * crow(g.cos_sg4, npx - 1))
    elif edges:
        kepos = kepos.at[..., :, f(1)].set(
            uc[..., :, f(1)] * g.sin_sg1[..., :, f(1)]
            + v[..., :, f(1)] * g.cos_sg1[..., :, f(1)])
        kepos = kepos.at[..., :, f(npx)].set(
            uc[..., :, f(npx)] * g.sin_sg1[..., :, f(npx)]
            + v[..., :, f(npx)] * g.cos_sg1[..., :, f(npx)])
        keneg = keneg.at[..., :, f(0)].set(
            uc[..., :, f(1)] * g.sin_sg3[..., :, f(0)]
            + v[..., :, f(1)] * g.cos_sg3[..., :, f(0)])
        keneg = keneg.at[..., :, f(npx - 1)].set(
            uc[..., :, f(npx)] * g.sin_sg3[..., :, f(npx - 1)]
            + v[..., :, f(npx)] * g.cos_sg3[..., :, f(npx - 1)])
        vtpos = vtpos.at[..., f(1), :].set(
            vc[..., f(1), :] * g.sin_sg2[..., f(1), :]
            + u[..., f(1), :] * g.cos_sg2[..., f(1), :])
        vtpos = vtpos.at[..., f(npx), :].set(
            vc[..., f(npx), :] * g.sin_sg2[..., f(npx), :]
            + u[..., f(npx), :] * g.cos_sg2[..., f(npx), :])
        vtneg = vtneg.at[..., f(0), :].set(
            vc[..., f(1), :] * g.sin_sg4[..., f(0), :]
            + u[..., f(1), :] * g.cos_sg4[..., f(0), :])
        vtneg = vtneg.at[..., f(npx - 1), :].set(
            vc[..., f(npx), :] * g.sin_sg4[..., f(npx - 1), :]
            + u[..., f(npx), :] * g.cos_sg4[..., f(npx - 1), :])
    ke = jnp.where(ua > 0.0, kepos, keneg)
    vortk = jnp.where(va > 0.0, vtpos, vtneg)

    ke = (0.5 * dt2) * (ua * ke + va * vortk)

    # ---- absolute vorticity on corners (sw_core.F90:374-404) -------------
    fxc = uc * g.dxc
    fyc = vc * g.dyc
    circ = _rl(fxc) - _rr(fxc) - _cl(fyc) + _cr(fyc)
    if edges and in_kernel:
        def pf(a, j, i):
            return a[..., f(j):f(j) + 1, f(i):f(i) + 1]

        circ = _sel_point(circ, f(1), f(1), pf(fyc, 1, 0), add=True)
        circ = _sel_point(circ, f(1), f(npx), -pf(fyc, 1, npx), add=True)
        circ = _sel_point(circ, f(npx), f(npx), -pf(fyc, npx, npx), add=True)
        circ = _sel_point(circ, f(npx), f(1), pf(fyc, npx, 0), add=True)
    elif edges:
        circ = circ.at[..., f(1), f(1)].add(fyc[..., f(1), f(0)])
        circ = circ.at[..., f(1), f(npx)].add(-fyc[..., f(1), f(npx)])
        circ = circ.at[..., f(npx), f(npx)].add(-fyc[..., f(npx), f(npx)])
        circ = circ.at[..., f(npx), f(1)].add(fyc[..., f(npx), f(0)])
    vortB = g.fC + g.rarea_c * circ

    # ---- transport absolute vorticity; update uc/vc ----------------------
    fy1v = dt2 * (v - uc * g.cosa_u) / g.sina_u
    if edges and in_kernel:
        ixw = _ix(fy1v.shape[-1])
        fy1v = jnp.where((ixw == f(1)) | (ixw == f(npx)), dt2 * v, fy1v)
    elif edges:
        fy1v = fy1v.at[..., :, f(1)].set(dt2 * v[..., :, f(1)])
        fy1v = fy1v.at[..., :, f(npx)].set(dt2 * v[..., :, f(npx)])
    fyv = jnp.where(fy1v > 0.0, vortB[..., :-1, :], vortB[..., 1:, :])

    fx1u = dt2 * (u - vc * g.cosa_v) / g.sina_v
    if edges and in_kernel:
        iyw = _iy(fx1u.shape[-2])
        fx1u = jnp.where((iyw == f(1)) | (iyw == f(npx)), dt2 * u, fx1u)
    elif edges:
        fx1u = fx1u.at[..., f(1), :].set(dt2 * u[..., f(1), :])
        fx1u = fx1u.at[..., f(npx), :].set(dt2 * u[..., f(npx), :])
    fxu = jnp.where(fx1u > 0.0, vortB[..., :, :-1], vortB[..., :, 1:])

    wall_c = slice(f(1), f(npx) + 1)
    cell_c = slice(f(1), f(npx - 1) + 1)
    uc_inc = fy1v * fyv + g.rdxc * (_cl(ke) - _cr(ke))
    vc_inc = -fx1u * fxu + g.rdyc * (_rl(ke) - _rr(ke))
    if in_kernel:
        uc = _sel_region(uc, uc_inc, f(1), f(npx - 1) + 1,
                         f(1), f(npx) + 1, add=True)
        vc = _sel_region(vc, vc_inc, f(1), f(npx) + 1,
                         f(1), f(npx - 1) + 1, add=True)
    else:
        uc = uc.at[..., cell_c, wall_c].add(uc_inc[..., cell_c, wall_c])
        vc = vc.at[..., wall_c, cell_c].add(vc_inc[..., wall_c, cell_c])

    # ut_s/vt_s are the dt2-scaled area fluxes (reference c_sw's in-place
    # scaled ut/vt, sw_core.F90:214-229) consumed by update_dz_c
    return SimpleNamespace(delpc=delpc, ptc=ptc, wc=wc, uc=uc, vc=vc,
                           ua=ua, va=va, divg_d=divg_d, ut=ut_s, vt=vt_s)


# ===========================================================================
# xtp_u / ytp_v (sw_core.F90:2154 / 2524): wind advection to B points
# ===========================================================================

def xtp_u(c, u, dx, rdx, iord, lim_fac=1.0, edges=True, axis=-1):
    """Flux of the D-grid u wind to cell corners (sw_core.F90 xtp_u:2154).

    axis=-1: c [..., NW, NW] corner courant (valid [1..npx] cols/rows);
    u, dx, rdx [..., NW, NC] y-wall arrays; PPM stencil along the last axis.
    axis=-2: the ytp_v orientation (sw_core.F90 ytp_v:2524) — v/dy/rdy
    [..., NC, NW] x-wall arrays, stencil along rows — same code path with
    axis-generic slicing, no physical transposes.

    Edge overrides are assembled by strip concatenation (one materialization
    per output array) instead of per-column dynamic-update-slices: on TPU a
    static-index .at[].set lowers to a full-array pass, so the reference's
    ~20 scattered edge assignments per call cost ~20 full passes; here the
    interior and six edge cells are concatenated in a single pass.
    """
    npx = c.shape[-1] - 2 * H
    if not edges:
        # bounded/periodic interior: identical interior scheme via the
        # generic xppm. c is a DISTANCE (sw_core.F90 xtp_u's c); xppm wants
        # the dimensionless Courant number, so apply the upwind-cell rdx
        # first (the cfl = c * rdx of the edges path below; on the uniform
        # doubly-periodic grid the two rdx branches are equal)
        from .tp_core import xppm
        f_ = fi
        if axis == -2:
            ct = jnp.swapaxes(c, -1, -2)
            out = xtp_u(ct, jnp.swapaxes(u, -1, -2), jnp.swapaxes(dx, -1, -2),
                        jnp.swapaxes(rdx, -1, -2), iord, lim_fac, edges=False)
            return jnp.swapaxes(out, -1, -2)
        cw = c[..., :, f_(1):f_(npx) + 1]
        rdx_l = rdx[..., :, f_(0):f_(npx - 1) + 1]     # upwind cell i-1
        rdx_r = rdx[..., :, f_(1):f_(npx) + 1]         # upwind cell i
        cfl_w = cw * jnp.where(cw > 0.0, rdx_l, rdx_r)
        flux = xppm(u, cfl_w, dx, iord, lim_fac, edges=False)
        out = jnp.zeros_like(c)
        return out.at[..., :, f_(1):f_(npx) + 1].set(flux)
    n = npx - 1
    f = fi
    ax = axis

    def S(q, sl):
        return q[..., sl] if ax == -1 else q[..., sl, :]

    def col(q, i, w=1):
        """width-w f-indexed cell slice along the stencil axis (keepdim)."""
        return S(q, slice(f(i), f(i) + w))

    def cat(parts):
        return jnp.concatenate(parts, ax)

    def padq(q, lo, hi):
        pad = [(0, 0)] * q.ndim
        pad[q.ndim + ax] = (lo, hi)
        return jnp.pad(q, pad)

    cl = lambda q: padq(q, 1, 0)     # cell i-1 viewed at wall i
    cr = lambda q: padq(q, 0, 1)     # cell i viewed at wall i

    # corner-row zero mask along the orthogonal (wall) axis: rows f(1),
    # f(npx). Built from a traced iota (not a captured numpy constant) so
    # this code path also compiles inside Pallas kernel bodies.
    NWlen = c.shape[-1]
    import jax as _jax
    if ax == -1:
        zi = _jax.lax.broadcasted_iota(jnp.int32, (NWlen, 1), 0)
    else:
        zi = _jax.lax.broadcasted_iota(jnp.int32, (1, NWlen), 1)
    zmask = jnp.where((zi == f(1)) | (zi == f(npx)),
                      jnp.zeros((), u.dtype), jnp.ones((), u.dtype))
    zero2 = jnp.zeros_like(S(u, slice(0, 2)))

    u0 = lambda i: col(u, i)
    dx0 = lambda i: col(dx, i)
    La = npx - 4          # al walls [3, npx-2]
    Lb = npx - 5          # interior cells [3, npx-3]

    def edge_extrap_w():
        xl = 0.5 * ((2.0 * dx0(0) + dx0(-1)) * u0(0)
                    - dx0(0) * u0(-1)) / (dx0(0) + dx0(-1))
        xr = 0.5 * ((2.0 * dx0(1) + dx0(2)) * u0(1)
                    - dx0(1) * u0(2)) / (dx0(1) + dx0(2))
        return xl + xr

    def edge_extrap_e():
        xl = 0.5 * ((2.0 * dx0(npx - 1) + dx0(npx - 2)) * u0(npx - 1)
                    - dx0(npx - 1) * u0(npx - 2)) / (dx0(npx - 1) + dx0(npx - 2))
        xr = 0.5 * ((2.0 * dx0(npx) + dx0(npx + 1)) * u0(npx)
                    - dx0(npx) * u0(npx + 1)) / (dx0(npx) + dx0(npx + 1))
        return xl + xr

    if iord < 8:
        # ---- linear PPM family (sw_core.F90:2177-2291) --------------------
        al_m = (P1 * (col(u, 2, La) + col(u, 3, La))
                + P2 * (col(u, 1, La) + col(u, 4, La)))
        qq = col(u, 3, Lb)
        blv = S(al_m, slice(0, Lb)) - qq
        brv = S(al_m, slice(1, 1 + Lb)) - qq
        # west edge (sw_core.F90:2200-2219)
        xt = C3 * u0(1) + C2 * u0(2) + C1 * u0(3)
        bl_0 = C1 * u0(-2) + C2 * u0(-1) + C3 * u0(0) - u0(0)
        xt0 = edge_extrap_w()
        br_0 = xt0 - u0(0)
        bl_1 = xt0 - u0(1)
        br_1 = xt - u0(1)
        bl_2 = xt - u0(2)
        br_2 = S(al_m, slice(0, 1)) - u0(2)
        # east edge
        bl_n2 = S(al_m, slice(La - 1, La)) - u0(npx - 2)
        xte = C1 * u0(npx - 3) + C2 * u0(npx - 2) + C3 * u0(npx - 1)
        br_n2 = xte - u0(npx - 2)
        bl_n1 = xte - u0(npx - 1)
        xtn = edge_extrap_e()
        br_n1 = xtn - u0(npx - 1)
        bl_n = xtn - u0(npx)
        br_n = C3 * u0(npx) + C2 * u0(npx + 1) + C1 * u0(npx + 2) - u0(npx)
        # zero the four corner cells on the tile-edge wall rows
        bl_0, br_0, bl_1, br_1 = (t * zmask for t in (bl_0, br_0, bl_1, br_1))
        bl_n1, br_n1, bl_n, br_n = (t * zmask
                                    for t in (bl_n1, br_n1, bl_n, br_n))
        bl = cat([zero2, bl_0, bl_1, bl_2, blv, bl_n2, bl_n1, bl_n, zero2])
        br = cat([zero2, br_0, br_1, br_2, brv, br_n2, br_n1, br_n, zero2])
        b0 = bl + br
        one = jnp.ones((), u.dtype)
        zero = jnp.zeros((), u.dtype)
        # smt5 carried as a 0/1 float mask end-to-end: Mosaic cannot
        # pad/select/truncate i1 vectors
        if iord == 5:
            smt5f = jnp.where(bl * br < 0.0, one, zero)
        else:  # 6, 7
            genf = jnp.where(3.0 * jnp.abs(b0) < jnp.abs(bl - br),
                             one, zero)
            edgef = jnp.where(bl * br < 0.0, one, zero)
            # traced iota (not captured numpy) so this compiles in Pallas
            Nax = u.shape[ax]
            if ax == -1:
                ei = jax.lax.broadcasted_iota(jnp.int32, (1, Nax), 1)
            else:
                ei = jax.lax.broadcasted_iota(jnp.int32, (Nax, 1), 0)
            emj = ((ei == f(0)) | (ei == f(1))
                   | (ei == f(npx - 1)) | (ei == f(npx)))
            smt5f = jnp.where(emj, edgef, genf)
        cpos = c > 0.0
        cfl = c * jnp.where(cpos, cl(rdx), cr(rdx))
        fx0 = jnp.where(cpos, (1.0 - cfl) * (cl(br) - cfl * cl(b0)),
                        (1.0 + cfl) * (cr(bl) + cfl * cr(b0)))
        low = jnp.where(cpos, cl(u), cr(u))
        add = (cl(smt5f) + cr(smt5f)) > 0.5
        return low + jnp.where(add, fx0, 0.0)

    # ---- iord >= 8 (sw_core.F90:2293-2523) --------------------------------
    up = S(u, slice(2, None))
    um = S(u, slice(0, -2))
    uc_ = S(u, slice(1, -1))
    xt_i = 0.25 * (up - um)
    dmax = jnp.maximum(jnp.maximum(um, uc_), up) - uc_
    dmin = uc_ - jnp.minimum(jnp.minimum(um, uc_), up)
    dm = padq(jnp.sign(xt_i)
              * jnp.minimum(jnp.minimum(jnp.abs(xt_i), dmax), dmin), 1, 1)
    dq = padq(S(u, slice(1, None)) - S(u, slice(0, -1)), 0, 1)

    def dmc(i, w=1):
        return col(dm, i, w)

    def dqc(i, w=1):
        return col(dq, i, w)

    al_m = (0.5 * (col(u, 2, La) + col(u, 3, La))
            + R3 * (col(dm, 2, La) - col(dm, 3, La)))

    alL = S(al_m, slice(0, Lb))
    alR = S(al_m, slice(1, 1 + Lb))
    qq = col(u, 3, Lb)
    if iord == 8:
        x2 = 2.0 * col(dm, 3, Lb)
        blv = -jnp.sign(x2) * jnp.minimum(jnp.abs(x2), jnp.abs(alL - qq))
        brv = jnp.sign(x2) * jnp.minimum(jnp.abs(x2), jnp.abs(alR - qq))
    elif iord in (9, 10):
        dq0 = col(dq, 3, Lb)
        dqp = col(dq, 4, Lb)
        dqm = col(dq, 2, Lb)
        dqmm = col(dq, 1, Lb)
        pmp_1 = -2.0 * dq0
        lac_1 = pmp_1 + 1.5 * dqp
        blv = jnp.minimum(jnp.maximum(0.0, jnp.maximum(pmp_1, lac_1)),
                          jnp.maximum(alL - qq,
                                      jnp.minimum(0.0, jnp.minimum(pmp_1, lac_1))))
        pmp_2 = 2.0 * dqm
        lac_2 = pmp_2 - 1.5 * dqmm
        brv = jnp.minimum(jnp.maximum(0.0, jnp.maximum(pmp_2, lac_2)),
                          jnp.maximum(alR - qq,
                                      jnp.minimum(0.0, jnp.minimum(pmp_2, lac_2))))
        if iord == 10:
            bl0 = alL - qq
            br0 = alR - qq
            dmm = col(dm, 2, Lb)
            dm0 = col(dm, 3, Lb)
            dmp = col(dm, 4, Lb)
            # elif chain of sw_core.F90:2418-2434: |dm(i)| ~ 0 SKIPS the
            # Huynh clamp entirely (zeroing only when the neighbors also
            # vanish — a 2-delta-x structure); the clamp applies only to
            # non-degenerate nonmonotone cells
            small0 = jnp.abs(dm0) < NEAR_ZERO
            flat = small0 & (jnp.abs(dmm) + jnp.abs(dmp) < NEAR_ZERO)
            big = ((~small0)
                   & (jnp.abs(3.0 * (bl0 + br0)) > jnp.abs(bl0 - br0)))
            blc = jnp.minimum(jnp.maximum(0.0, jnp.maximum(pmp_1, lac_1)),
                              jnp.maximum(bl0,
                                          jnp.minimum(0.0, jnp.minimum(pmp_1, lac_1))))
            brc = jnp.minimum(jnp.maximum(0.0, jnp.maximum(pmp_2, lac_2)),
                              jnp.maximum(br0,
                                          jnp.minimum(0.0, jnp.minimum(pmp_2, lac_2))))
            blv = jnp.where(flat, 0.0, jnp.where(big, blc, bl0))
            brv = jnp.where(flat, 0.0, jnp.where(big, brc, br0))
    else:  # 11: unlimited
        blv = alL - qq
        brv = alR - qq

    # west edge (sw_core.F90:2462-2495)
    xt = S15 * u0(1) + S11 * u0(2) - S14 * dmc(2)
    bl_0 = S14 * dmc(-1) - S11 * dqc(-1)
    xt0 = edge_extrap_w()
    br_0 = xt0 - u0(0)
    bl_1 = xt0 - u0(1)
    br_1 = xt - u0(1)
    bl_2 = xt - u0(2)
    br_2 = S(al_m, slice(0, 1)) - u0(2)
    # east edge
    bl_n2 = S(al_m, slice(La - 1, La)) - u0(npx - 2)
    xte = S15 * u0(npx - 1) + S11 * u0(npx - 2) + S14 * dmc(npx - 2)
    br_n2 = xte - u0(npx - 2)
    bl_n1 = xte - u0(npx - 1)
    xtn = edge_extrap_e()
    br_n1 = xtn - u0(npx - 1)
    bl_n = xtn - u0(npx)
    br_n = S11 * dqc(npx) - S14 * dmc(npx + 1)
    # zero the corner cells on tile-edge wall rows, then the pert_ppm
    # constraint on cells 2 and npx-2 (order matches the reference loop)
    bl_0, br_0, bl_1, br_1 = (t * zmask for t in (bl_0, br_0, bl_1, br_1))
    bl_n1, br_n1, bl_n, br_n = (t * zmask for t in (bl_n1, br_n1, bl_n, br_n))
    bl_2, br_2 = _pert_ppm_iv1(u0(2), bl_2, br_2)
    bl_n2, br_n2 = _pert_ppm_iv1(u0(npx - 2), bl_n2, br_n2)

    bl = cat([zero2, bl_0, bl_1, bl_2, blv, bl_n2, bl_n1, bl_n, zero2])
    br = cat([zero2, br_0, br_1, br_2, brv, br_n2, br_n1, br_n, zero2])
    b0 = bl + br
    cpos = c > 0.0
    cfl = c * jnp.where(cpos, cl(rdx), cr(rdx))
    return jnp.where(cpos,
                     cl(u) + (1.0 - cfl) * (cl(br) - cfl * cl(b0)),
                     cr(u) + (1.0 + cfl) * (cr(bl) + cfl * cr(b0)))


def ytp_v(c, v, dy, rdy, jord, lim_fac=1.0, edges=True):
    """Flux of D-grid v to corners; v, dy, rdy: [..., NC, NW] x-wall arrays.
    Same operator as xtp_u along rows (axis=-2) — no transposes."""
    return xtp_u(c, v, dy, rdy, jord, lim_fac, edges=edges, axis=-2)


# ===========================================================================
# d_sw (sw_core.F90:494): full D-grid forward step for one layer group
# ===========================================================================

def _traced(x):
    """True when x is a traced/device scalar (the in-kernel per-level path:
    ops/pallas_dsw.py reads each level's damping parameter from SMEM)."""
    return isinstance(x, (jax.Array, jax.core.Tracer))


def _pl(x, dtype):
    """Normalize a damping parameter: scalar stays a float; a per-level [K]
    numpy profile becomes a [K,1,1] device array broadcasting over
    [..., K, P, P] fields (the merged sponge-group path); a traced scalar
    (in-kernel per-level value) passes through."""
    if _traced(x):
        return x
    a = np.asarray(x)
    if a.ndim == 0:
        return float(a)
    return jnp.asarray(a, dtype).reshape((-1, 1, 1))


def _on(x):
    """Static is-this-damping-active test for scalar or [K] profile.
    Traced scalars count as active — the caller makes the static decision
    and passes None for inactive combos."""
    if x is None:
        return False
    if _traced(x):
        return True
    return float(np.max(np.asarray(x))) > 1.0e-5


def ke_section(u, v, uc, vc, ut, vt, cosa, rsina, dx, rdx, dy, rdy,
               dt, hord_mt, lim_fac, npx, edges, use_select=False):
    """d_sw kinetic-energy stage (sw_core.F90:1063-1228): vb/ub advective
    corner winds, their PPM self-advection (ytp_v/xtp_u), and the corner KE
    fixes. Factored out so the TPU path can run it as one Pallas kernel per
    (tile, level-block) face with all operands VMEM-resident."""
    f = fi
    dt5 = 0.5 * dt
    dt4 = 0.25 * dt
    mid = slice(f(2), f(npx - 1) + 1)
    catx = lambda ps: jnp.concatenate(ps, -1)
    caty = lambda ps: jnp.concatenate(ps, -2)

    def _cl(q):
        pad = [(0, 0)] * (q.ndim - 1) + [(1, 0)]
        return jnp.pad(q, pad)

    def _cr(q):
        pad = [(0, 0)] * (q.ndim - 1) + [(0, 1)]
        return jnp.pad(q, pad)

    def _rl(q):
        pad = [(0, 0)] * (q.ndim - 2) + [(1, 0), (0, 0)]
        return jnp.pad(q, pad)

    def _rr(q):
        pad = [(0, 0)] * (q.ndim - 2) + [(0, 1), (0, 0)]
        return jnp.pad(q, pad)

    vb = dt5 * (_cl(vc) + _cr(vc) - (_rl(uc) + _rr(uc)) * cosa) * rsina
    if edges:
        # edge frame assembled with one concatenate pass per array (each
        # static .at[].set on the full array is a full-array pass on TPU)
        def c1(a, i):
            return a[..., mid, f(i):f(i) + 1]

        if use_select:
            # Pallas path: every operand is VMEM-resident, so iota-masked
            # selects are free and avoid Mosaic's offset-slice concat limits
            def cfull(a, i):
                return a[..., :, f(i):f(i) + 1]

            colv_w = dt4 * (-cfull(vt, -1) + 3.0 * (cfull(vt, 0)
                            + cfull(vt, 1)) - cfull(vt, 2))
            colv_e = dt4 * (-cfull(vt, npx - 2)
                            + 3.0 * (cfull(vt, npx - 1) + cfull(vt, npx))
                            - cfull(vt, npx + 1))
            rowv = dt5 * (_cl(vt) + _cr(vt))
            NWl = vb.shape[-1]
            ix = jax.lax.broadcasted_iota(jnp.int32, (1, NWl), 1)
            iy = jax.lax.broadcasted_iota(jnp.int32, (NWl, 1), 0)
            in_mid = (iy >= f(2)) & (iy <= f(npx - 1))
            vb = jnp.where((ix == f(1)) & in_mid, colv_w, vb)
            vb = jnp.where((ix == f(npx)) & in_mid, colv_e, vb)
            vb = jnp.where((iy == f(1)) | (iy == f(npx)), rowv, vb)
        else:
            col_w = dt4 * (-c1(vt, -1) + 3.0 * (c1(vt, 0) + c1(vt, 1))
                           - c1(vt, 2))
            col_e = dt4 * (-c1(vt, npx - 2)
                           + 3.0 * (c1(vt, npx - 1) + c1(vt, npx))
                           - c1(vt, npx + 1))
            row_s = dt5 * (_cl(vt) + _cr(vt))[..., f(1):f(1) + 1, :]
            row_n = dt5 * (_cl(vt) + _cr(vt))[..., f(npx):f(npx) + 1, :]
            vb_mid = catx([vb[..., mid, :f(1)], col_w,
                           vb[..., mid, f(1) + 1:f(npx)], col_e,
                           vb[..., mid, f(npx) + 1:]])
            vb = caty([vb[..., :f(1), :], row_s, vb_mid, row_n,
                       vb[..., f(npx) + 1:, :]])

    ke = vb * ytp_v(vb, v, dy, rdy, hord_mt, lim_fac, edges=edges)

    ub = dt5 * (_rl(uc) + _rr(uc) - (_cl(vc) + _cr(vc)) * cosa) * rsina
    if edges:
        def r1(a, j):
            return a[..., f(j):f(j) + 1, mid]

        if use_select:
            def rfull(a, j):
                return a[..., f(j):f(j) + 1, :]

            rowv_s = dt4 * (-rfull(ut, -1) + 3.0 * (rfull(ut, 0)
                            + rfull(ut, 1)) - rfull(ut, 2))
            rowv_n = dt4 * (-rfull(ut, npx - 2)
                            + 3.0 * (rfull(ut, npx - 1) + rfull(ut, npx))
                            - rfull(ut, npx + 1))
            colv = dt5 * (_rl(ut) + _rr(ut))
            NWl = ub.shape[-1]
            ix = jax.lax.broadcasted_iota(jnp.int32, (1, NWl), 1)
            iy = jax.lax.broadcasted_iota(jnp.int32, (NWl, 1), 0)
            in_mid = (ix >= f(2)) & (ix <= f(npx - 1))
            ub = jnp.where((iy == f(1)) & in_mid, rowv_s, ub)
            ub = jnp.where((iy == f(npx)) & in_mid, rowv_n, ub)
            ub = jnp.where((ix == f(1)) | (ix == f(npx)), colv, ub)
        else:
            row_s = dt4 * (-r1(ut, -1) + 3.0 * (r1(ut, 0) + r1(ut, 1))
                           - r1(ut, 2))
            row_n = dt4 * (-r1(ut, npx - 2)
                           + 3.0 * (r1(ut, npx - 1) + r1(ut, npx))
                           - r1(ut, npx + 1))
            col_w = dt5 * (_rl(ut) + _rr(ut))[..., :, f(1):f(1) + 1]
            col_e = dt5 * (_rl(ut) + _rr(ut))[..., :, f(npx):f(npx) + 1]
            # rows f(1), f(npx) are edited on the mid columns
            # (f(2)..f(npx-1)); columns f(1), f(npx) are then replaced over
            # their full height (disjoint, same as the reference order)
            row_s = catx([ub[..., f(1):f(1) + 1, :f(2)], row_s,
                          ub[..., f(1):f(1) + 1, f(npx - 1) + 1:]])
            row_n = catx([ub[..., f(npx):f(npx) + 1, :f(2)], row_n,
                          ub[..., f(npx):f(npx) + 1, f(npx - 1) + 1:]])
            ub_r = caty([ub[..., :f(1), :], row_s,
                         ub[..., f(1) + 1:f(npx), :], row_n,
                         ub[..., f(npx) + 1:, :]])
            ub = catx([ub_r[..., :, :f(1)], col_w,
                       ub_r[..., :, f(1) + 1:f(npx)], col_e,
                       ub_r[..., :, f(npx) + 1:]])

    ke = 0.5 * (ke + ub * xtp_u(ub, u, dx, rdx, hord_mt, lim_fac,
                                edges=edges))

    # corner KE fixes (sw_core.F90:1203-1228)
    dt6 = dt / 6.0
    if edges:
        def p(a, j, i):
            return a[..., f(j):f(j) + 1, f(i):f(i) + 1]

        k11 = dt6 * (
            (p(ut, 1, 1) + p(ut, 0, 1)) * p(u, 1, 1)
            + (p(vt, 1, 1) + p(vt, 1, 0)) * p(v, 1, 1)
            + (p(ut, 1, 1) + p(vt, 1, 1)) * p(u, 1, 0))
        k1n = dt6 * (
            (p(ut, 1, npx) + p(ut, 0, npx)) * p(u, 1, npx - 1)
            + (p(vt, 1, npx) + p(vt, 1, npx - 1)) * p(v, 1, npx)
            + (p(ut, 1, npx) - p(vt, 1, npx - 1)) * p(u, 1, npx))
        knn = dt6 * (
            (p(ut, npx, npx) + p(ut, npx - 1, npx)) * p(u, npx, npx - 1)
            + (p(vt, npx, npx) + p(vt, npx, npx - 1)) * p(v, npx - 1, npx)
            + (p(ut, npx - 1, npx) + p(vt, npx, npx - 1)) * p(u, npx, npx))
        kn1 = dt6 * (
            (p(ut, npx, 1) + p(ut, npx - 1, 1)) * p(u, npx, 1)
            + (p(vt, npx, 1) + p(vt, npx, 0)) * p(v, npx - 1, 1)
            + (p(ut, npx - 1, 1) - p(vt, npx, 1)) * p(u, npx, 0))
        if use_select:
            NWl = ke.shape[-1]
            ix = jax.lax.broadcasted_iota(jnp.int32, (1, NWl), 1)
            iy = jax.lax.broadcasted_iota(jnp.int32, (NWl, 1), 0)
            zero = jnp.zeros((), ke.dtype)
            for jj, ii, val in ((f(1), f(1), k11), (f(1), f(npx), k1n),
                                (f(npx), f(npx), knn), (f(npx), f(1), kn1)):
                # two-stage select: Mosaic cannot broadcast [1,1] into both
                # sublanes and lanes in one op, and it constant-folds a
                # `* ones` staging back into one broadcast — a lane-select
                # against zero survives canonicalization
                row_val = jnp.where(ix == ii, val, zero)
                ke = jnp.where((iy == jj) & (ix == ii), row_val, ke)
        else:
            row1 = catx([ke[..., f(1):f(1) + 1, :f(1)], k11,
                         ke[..., f(1):f(1) + 1, f(1) + 1:f(npx)], k1n,
                         ke[..., f(1):f(1) + 1, f(npx) + 1:]])
            rown = catx([ke[..., f(npx):f(npx) + 1, :f(1)], kn1,
                         ke[..., f(npx):f(npx) + 1, f(1) + 1:f(npx)], knn,
                         ke[..., f(npx):f(npx) + 1, f(npx) + 1:]])
            ke = caty([ke[..., :f(1), :], row1, ke[..., f(1) + 1:f(npx), :],
                       rown, ke[..., f(npx) + 1:, :]])

    return ke


def d_sw(delp, pt, w, u, v, uc, vc, ua, va, divg_d, g, *,
         dt, hord_mt, hord_vt, hord_dp, hord_tm, nord, nord_v,
         dddmp, d2_bg, d4_bg, damp_v, d_con=0.0, ke_bg=0.0,
         damp_w=0.0, nord_w=0, hydrostatic=True, sw_mode=False,
         advection_only=False, lim_fac=1.0,
         nord_mask=None, damp_v2=None, nord_v2=0,
         damp_w2=None, nord_w2=0, in_kernel=False, stage="all", pre=None):
    """All inputs padded. Returns SimpleNamespace of interior (compute-domain)
    updated fields + fluxes:
      u [*, n+1, n], v [*, n, n+1], delp/pt/w [*, n, n],
      fx/crx/xfx..., heat_source, divg_d (corner padded), ke.

    Damping parameters (d2_bg/damp_v/d_con/damp_w) accept either scalars or
    per-level [K] numpy profiles — the merged-sponge path (dyn_core.F90's
    per-k damping dispatch :675-733 collapsed into one call). nord_mask, a
    [K] bool profile, selects levels that use the del-2 (nord==0)
    divergence-damping branch when nord > 0; (damp_v2, nord_v2) and
    (damp_w2, nord_w2) are a second vorticity/w damping combo whose fluxes
    add (used for the nord=0 sponge levels).

    stage: "all" (default) | "fluxes" (stop after the delp/pt/w transport,
    returning fluxes + contravariant winds) | "winds" (skip the transport,
    taking its products from `pre`). The two-stage split lets the TPU
    Pallas path run d_sw as two compile-sized kernels
    (ops/pallas_dsw.py)."""
    npx = g.npx
    n = g.n
    f = fi
    edges = cube_edges(g)
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    d2_bg_b = _pl(d2_bg, delp.dtype)
    d_con_b = _pl(d_con, delp.dtype)

    if stage == "winds":
        (crx, cry, xfx, yfx, ra_x, ra_y, ut, vt, fx, fy, delp_new, pt_new,
         w_new, heat_source) = (
            pre["crx"], pre["cry"], pre["xfx"], pre["yfx"], pre["ra_x"],
            pre["ra_y"], pre["ut"], pre["vt"], pre["fx"], pre["fy"],
            pre["delp_new"], pre["pt_new"], pre.get("w_new"),
            pre.get("heat_source"))
        return _dsw_winds_stage(
            delp, u, v, uc, vc, ua, va, divg_d, g, crx, cry, xfx, yfx,
            ra_x, ra_y, ut, vt, fx, fy, delp_new, pt_new, w_new,
            heat_source, dt=dt, hord_mt=hord_mt, hord_vt=hord_vt,
            nord=nord, nord_v=nord_v, dddmp=dddmp, d2_bg_b=d2_bg_b,
            d4_bg=d4_bg, damp_v=damp_v, d_con=d_con, d_con_b=d_con_b,
            hydrostatic=hydrostatic, lim_fac=lim_fac, nord_mask=nord_mask,
            damp_v2=damp_v2, nord_v2=nord_v2, in_kernel=in_kernel,
            vortS_pre=pre.get("vortS"))

    # ---- advective C-grid winds -> courant / area fluxes ------------------
    if advection_only:
        xfx = dt * uc / g.sina_u
        crx = xfx * jnp.where(xfx > 0.0, _cl(g.rdxa), _cr(g.rdxa))
        xfx = g.dy * xfx * g.sina_u
        yfx = dt * vc / g.sina_v
        cry = yfx * jnp.where(yfx > 0.0, _rl(g.rdya), _rr(g.rdya))
        yfx = g.dx * yfx * g.sina_v
        ut = vt = None
    else:
        vsum = (_cl(vc)[..., :-1, :] + _cr(vc)[..., :-1, :]
                + _cl(vc)[..., 1:, :] + _cr(vc)[..., 1:, :])
        ut = (uc - 0.25 * g.cosa_u * vsum) * g.rsin_u
        usum = (_rl(uc)[..., :, :-1] + _rl(uc)[..., :, 1:]
                + _rr(uc)[..., :, :-1] + _rr(uc)[..., :, 1:])
        vt = (vc - 0.25 * g.cosa_v * usum) * g.rsin_v

        if edges:
            # --- west/east edges (sw_core.F90:700-760), strip-assembled: ---
            # each static .at[].set on the full [.., K, P, P] arrays is a
            # full-array pass on TPU; the edits below touch only 2 columns
            # (ut), a 4-column x 2-row frame (vt) and 4 rows (ut), so each
            # array is rebuilt with ONE concatenate pass instead of ~14.
            E = f(npx)                      # = NW - 4 (wall npx)
            catx = lambda ps: jnp.concatenate(ps, -1)
            caty = lambda ps: jnp.concatenate(ps, -2)

            def ut_edge_col(iw):
                cw = uc[..., :, f(iw):f(iw) + 1]
                return jnp.where(
                    cw * dt > 0.0,
                    cw / g.sin_sg3[..., :, f(iw - 1):f(iw - 1) + 1],
                    cw / g.sin_sg1[..., :, f(iw):f(iw) + 1])

            ut = catx([ut[..., :, :f(1)], ut_edge_col(1),
                       ut[..., :, f(1) + 1:E], ut_edge_col(npx),
                       ut[..., :, E + 1:]])

            jmid = slice(f(3), f(npx - 2) + 1)      # wall rows [3, npy-2]
            rA = slice(f(2), f(npx - 3) + 1)        # ut row windows
            rB = slice(f(3), f(npx - 2) + 1)

            def vt_edge_cols(c0):
                # edited vt columns f(c0), f(c0+1) on the jmid rows
                cc = slice(f(c0), f(c0) + 2)
                return (vc[..., jmid, cc] - 0.25 * g.cosa_v[..., jmid, cc]
                        * (ut[..., rA, cc] + ut[..., rA, f(c0) + 1:f(c0) + 3]
                           + ut[..., rB, cc]
                           + ut[..., rB, f(c0) + 1:f(c0) + 3]))

            def vt_edge_row(jw):
                rw = vc[..., f(jw):f(jw) + 1, :]
                return jnp.where(
                    rw * dt > 0.0,
                    rw / g.sin_sg4[..., f(jw - 1):f(jw - 1) + 1, :],
                    rw / g.sin_sg2[..., f(jw):f(jw) + 1, :])

            Ew = f(npx - 1)                 # vt col f(npx-1) (cells)
            vt_mid = catx([vt[..., jmid, :f(0)], vt_edge_cols(0),
                           vt[..., jmid, f(1) + 1:Ew], vt_edge_cols(npx - 1),
                           vt[..., jmid, Ew + 2:]])
            vt = caty([vt[..., :f(1), :], vt_edge_row(1),
                       vt[..., f(1) + 1:f(3), :], vt_mid,
                       vt[..., f(npx - 2) + 1:E, :], vt_edge_row(npx),
                       vt[..., E + 1:, :]])

            imid = slice(f(3), f(npx - 2) + 1)
            cA = slice(f(2), f(npx - 3) + 1)        # vt col windows
            cB = slice(f(3), f(npx - 2) + 1)

            def ut_edge_row(jc):
                r = slice(f(jc), f(jc) + 1)
                rp = slice(f(jc + 1), f(jc + 1) + 1)
                mid = (uc[..., r, imid] - 0.25 * g.cosa_u[..., r, imid]
                       * (vt[..., r, cA] + vt[..., r, cB]
                          + vt[..., rp, cA] + vt[..., rp, cB]))
                return catx([ut[..., r, :f(3)], mid,
                             ut[..., r, f(npx - 2) + 1:]])

            Er = f(npx - 1)                 # ut row f(npx-1) (cells)
            ut = caty([ut[..., :f(0), :], ut_edge_row(0), ut_edge_row(1),
                       ut[..., f(1) + 1:Er, :], ut_edge_row(npx - 1),
                       ut_edge_row(npx), ut[..., f(npx) + 1:, :]])

            ut, vt = _dsw_corner_solve(ut, vt, uc, vc, g, npx,
                                       use_select=in_kernel)

        xfx = dt * ut
        crx = xfx * jnp.where(xfx > 0.0, _cl(g.rdxa), _cr(g.rdxa))
        xfx = g.dy * xfx * jnp.where(xfx > 0.0, _cl(g.sin_sg3), _cr(g.sin_sg1))
        yfx = dt * vt
        cry = yfx * jnp.where(yfx > 0.0, _rl(g.rdya), _rr(g.rdya))
        yfx = g.dx * yfx * jnp.where(yfx > 0.0, _rl(g.sin_sg4), _rr(g.sin_sg2))

    ra_x = g.area + xfx[..., :, :-1] - xfx[..., :, 1:]
    ra_y = g.area + yfx[..., :-1, :] - yfx[..., 1:, :]

    # ---- transport delp ---------------------------------------------------
    fx, fy = fv_tp_2d(delp, crx, cry, hord_dp, xfx, yfx, g.area, ra_x, ra_y,
                      g.dxa, g.dya, lim_fac=lim_fac,
                      nord=nord_v, damp_c=damp_v, g=g, edges=edges,
                      nord2=nord_v2, damp_c2=damp_v2)

    def div_c(fxc, fyc):
        return (fxc[..., :, :-1] - fxc[..., :, 1:]
                + fyc[..., :-1, :] - fyc[..., 1:, :]) * g.rarea[..., ctr, ctr]

    heat_source = None
    w_new = None
    if not hydrostatic:
        dw = None
        if _on(damp_w) or _on(damp_w2):
            dd8 = ke_bg * abs(dt)
            dw = 0.0
            for dwc, nwc in ((damp_w, nord_w), (damp_w2, nord_w2)):
                if not _on(dwc):
                    continue
                damp4 = (_pl(dwc, w.dtype) * g.da_min_c) ** (nwc + 1)
                fx2w, fy2w = deln_damp_fluxes(w, nwc, g, prefac=damp4,
                                              edges=edges)
                dw = dw + ((fx2w[..., ctr, wsl][..., :, :-1]
                            - fx2w[..., ctr, wsl][..., :, 1:]
                            + fy2w[..., wsl, ctr][..., :-1, :]
                            - fy2w[..., wsl, ctr][..., 1:, :])
                           * g.rarea[..., ctr, ctr])
            heat_source = dd8 - dw * (w[..., ctr, ctr] + 0.5 * dw)
        gx, gy = fv_tp_2d(w, crx, cry, hord_vt, xfx, yfx, g.area, ra_x, ra_y,
                          g.dxa, g.dya, lim_fac=lim_fac, mfx=fx, mfy=fy,
                          edges=edges)
        w_new = delp[..., ctr, ctr] * w[..., ctr, ctr] + div_c(gx, gy)

    if not sw_mode:
        gx, gy = fv_tp_2d(pt, crx, cry, hord_tm, xfx, yfx, g.area, ra_x, ra_y,
                          g.dxa, g.dya, lim_fac=lim_fac, mfx=fx, mfy=fy,
                          nord=nord_v, damp_c=damp_v, g=g, mass=delp,
                          edges=edges, nord2=nord_v2, damp_c2=damp_v2)

    delp_int = delp[..., ctr, ctr]
    delp_new = delp_int + div_c(fx, fy)
    if not sw_mode:
        pt_new = (pt[..., ctr, ctr] * delp_int + div_c(gx, gy)) / delp_new
    else:
        pt_new = pt[..., ctr, ctr]
    if not hydrostatic:
        w_new = w_new / delp_new
        if dw is not None:
            w_new = w_new + dw

    if advection_only:
        return SimpleNamespace(
            u=None if u is None else u[..., wsl, ctr],
            v=None if v is None else v[..., ctr, wsl],
            delp=delp_new, pt=pt_new, w=w_new,
            fx=fx, fy=fy, crx=crx, cry=cry, xfx=xfx, yfx=yfx,
            ra_x=ra_x, ra_y=ra_y, divg_d=divg_d, heat_source=heat_source)

    if stage == "fluxes":
        return SimpleNamespace(
            delp=delp_new, pt=pt_new, w=w_new, fx=fx, fy=fy,
            crx=crx, cry=cry, xfx=xfx, yfx=yfx, ra_x=ra_x, ra_y=ra_y,
            ut=ut, vt=vt, heat_source=heat_source)

    return _dsw_winds_stage(
        delp, u, v, uc, vc, ua, va, divg_d, g, crx, cry, xfx, yfx,
        ra_x, ra_y, ut, vt, fx, fy, delp_new, pt_new, w_new, heat_source,
        dt=dt, hord_mt=hord_mt, hord_vt=hord_vt, nord=nord, nord_v=nord_v,
        dddmp=dddmp, d2_bg_b=d2_bg_b, d4_bg=d4_bg, damp_v=damp_v,
        d_con=d_con, d_con_b=d_con_b, hydrostatic=hydrostatic,
        lim_fac=lim_fac, nord_mask=nord_mask, damp_v2=damp_v2,
        nord_v2=nord_v2, in_kernel=in_kernel)


def _dsw_winds_stage(delp, u, v, uc, vc, ua, va, divg_d, g, crx, cry,
                     xfx, yfx, ra_x, ra_y, ut, vt, fx, fy, delp_new,
                     pt_new, w_new, heat_source, *, dt, hord_mt, hord_vt,
                     nord, nord_v, dddmp, d2_bg_b, d4_bg, damp_v, d_con,
                     d_con_b, hydrostatic, lim_fac, nord_mask, damp_v2,
                     nord_v2, in_kernel, vortS_pre=None):
    """d_sw's KE / vorticity / damping / wind-update half (sw_core.F90:
    1063-1529), split out so the Pallas path can run it as its own
    compile-sized kernel."""
    npx = g.npx
    n = g.n
    f = fi
    edges = cube_edges(g)
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    catx = lambda ps: jnp.concatenate(ps, -1)
    caty = lambda ps: jnp.concatenate(ps, -2)

    # ---- kinetic energy (sw_core.F90:1063-1225) ---------------------------
    import os
    from .tp_core import _use_pallas_sweep
    if in_kernel:
        # iota-masked selects: free on VMEM-resident operands, and Mosaic's
        # offset-strip concat path miscompiles here (see devtools/mosaic_probe)
        ke = ke_section(u, v, uc, vc, ut, vt, g.cosa, g.rsina, g.dx, g.rdx,
                        g.dy, g.rdy, dt, hord_mt, lim_fac, npx, edges,
                        use_select=True)
    elif (_use_pallas_sweep(delp, edges)
            and os.environ.get("GFDL_TPU_PALLAS_KE", "1") != "0"):
        from .pallas_sw import ke_section_pallas
        ke = ke_section_pallas(u, v, uc, vc, ut, vt, g.cosa, g.rsina,
                               g.dx, g.rdx, g.dy, g.rdy, dt, hord_mt,
                               lim_fac, npx)
    else:
        ke = ke_section(u, v, uc, vc, ut, vt, g.cosa, g.rsina, g.dx, g.rdx,
                        g.dy, g.rdy, dt, hord_mt, lim_fac, npx, edges)
    dt6 = dt / 6.0

    # ---- relative vorticity (cell mean) -----------------------------------
    vt_w = u * g.dx                       # circulation along y-walls
    ut_w = v * g.dy
    wk = g.rarea * (vt_w[..., :-1, :] - vt_w[..., 1:, :]
                    - ut_w[..., :, :-1] + ut_w[..., :, 1:])

    # ---- divergence damping ----------------------------------------------
    # need0: levels using the del-2 branch exist (nord==0 everywhere, or a
    # sponge nord_mask under nord>0); needN: the del-2^nord branch.
    need0 = (nord == 0) or (nord_mask is not None and (
        _traced(nord_mask) or bool(np.any(nord_mask))))
    needN = nord > 0
    vortB0 = vortBN = None
    if need0:
        ptc_d = (u - 0.5 * (_rl(va) + _rr(va)) * g.cosa_v) * g.dyc * g.sina_v
        if edges:
            def ptc_row(jw):
                r = slice(f(jw), f(jw) + 1)
                return jnp.where(
                    vc[..., r, :] > 0.0,
                    u[..., r, :] * g.dyc[..., r, :]
                    * g.sin_sg4[..., f(jw - 1):f(jw - 1) + 1, :],
                    u[..., r, :] * g.dyc[..., r, :]
                    * g.sin_sg2[..., r, :])

            ptc_d = caty([ptc_d[..., :f(1), :], ptc_row(1),
                          ptc_d[..., f(1) + 1:f(npx), :], ptc_row(npx),
                          ptc_d[..., f(npx) + 1:, :]])
        vort_d = (v - 0.5 * (_cl(ua) + _cr(ua)) * g.cosa_u) * g.dxc * g.sina_u
        if edges:
            def vort_col(iw):
                cI = slice(f(iw), f(iw) + 1)
                return jnp.where(
                    uc[..., :, cI] > 0.0,
                    v[..., :, cI] * g.dxc[..., :, cI]
                    * g.sin_sg3[..., :, f(iw - 1):f(iw - 1) + 1],
                    v[..., :, cI] * g.dxc[..., :, cI]
                    * g.sin_sg1[..., :, cI])

            vort_d = catx([vort_d[..., :, :f(1)], vort_col(1),
                           vort_d[..., :, f(1) + 1:f(npx)], vort_col(npx),
                           vort_d[..., :, f(npx) + 1:]])
        delpc_d = _rl(vort_d) - _rr(vort_d) + _cl(ptc_d) - _cr(ptc_d)
        if edges:
            def pp(a, j, i):
                return a[..., f(j):f(j) + 1, f(i):f(i) + 1]

            row1 = catx([delpc_d[..., f(1):f(1) + 1, :f(1)],
                         pp(delpc_d, 1, 1) - pp(vort_d, 0, 1),
                         delpc_d[..., f(1):f(1) + 1, f(1) + 1:f(npx)],
                         pp(delpc_d, 1, npx) - pp(vort_d, 0, npx),
                         delpc_d[..., f(1):f(1) + 1, f(npx) + 1:]])
            rown = catx([delpc_d[..., f(npx):f(npx) + 1, :f(1)],
                         pp(delpc_d, npx, 1) + pp(vort_d, npx, 1),
                         delpc_d[..., f(npx):f(npx) + 1, f(1) + 1:f(npx)],
                         pp(delpc_d, npx, npx) + pp(vort_d, npx, npx),
                         delpc_d[..., f(npx):f(npx) + 1, f(npx) + 1:]])
            delpc_d = caty([delpc_d[..., :f(1), :], row1,
                            delpc_d[..., f(1) + 1:f(npx), :], rown,
                            delpc_d[..., f(npx) + 1:, :]])
        delpc_d = delpc_d * g.rarea_c
        damp = g.da_min_c * jnp.maximum(
            d2_bg_b, jnp.minimum(0.20, dddmp * jnp.abs(delpc_d * dt)))
        vortB0 = damp * delpc_d
    if needN:
        delpc_d = divg_d
        dd = divg_d
        for nn in range(1, nord + 1):
            nt = nord - nn
            if nt != 0 and edges:
                dd = fill_corners_bgrid(dd, 1, npx)
            vc_g = (dd[..., :, 1:] - dd[..., :, :-1]) * g.divg_u
            if nt != 0 and edges:
                dd = fill_corners_bgrid(dd, 2, npx)
            uc_g = (dd[..., 1:, :] - dd[..., :-1, :]) * g.divg_v
            if nt != 0 and edges:
                vc_g, uc_g = fill_corners_dgrid_vector(vc_g, uc_g, npx, sign=-1.0)
            dd = _rl(uc_g) - _rr(uc_g) + _cl(vc_g) - _cr(vc_g)
            if edges:
                def pp(a, j, i):
                    return a[..., f(j):f(j) + 1, f(i):f(i) + 1]

                row1 = catx([dd[..., f(1):f(1) + 1, :f(1)],
                             pp(dd, 1, 1) - pp(uc_g, 0, 1),
                             dd[..., f(1):f(1) + 1, f(1) + 1:f(npx)],
                             pp(dd, 1, npx) - pp(uc_g, 0, npx),
                             dd[..., f(1):f(1) + 1, f(npx) + 1:]])
                rown = catx([dd[..., f(npx):f(npx) + 1, :f(1)],
                             pp(dd, npx, 1) + pp(uc_g, npx, 1),
                             dd[..., f(npx):f(npx) + 1, f(1) + 1:f(npx)],
                             pp(dd, npx, npx) + pp(uc_g, npx, npx),
                             dd[..., f(npx):f(npx) + 1, f(npx) + 1:]])
                dd = caty([dd[..., :f(1), :], row1,
                           dd[..., f(1) + 1:f(npx), :], rown,
                           dd[..., f(npx) + 1:, :]])
            dd = dd * g.rarea_c
        if dddmp < 1.0e-5:
            vortS = jnp.zeros_like(dd)
        elif vortS_pre is not None:
            # Smagorinsky operand precomputed outside a Pallas kernel body
            # (a2b_ord4 of the cell-mean vorticity; ops/pallas_dsw.py)
            vortS = jnp.abs(dt) * jnp.sqrt(delpc_d ** 2 + vortS_pre ** 2)
        else:
            vortS = a2b_ord4(wk, g)
            vortS = jnp.abs(dt) * jnp.sqrt(delpc_d ** 2 + vortS ** 2)
        dd8 = (g.da_min_c * d4_bg) ** (nord + 1)
        damp2 = g.da_min_c * jnp.maximum(
            d2_bg_b, jnp.minimum(0.20, dddmp * vortS))
        vortBN = damp2 * delpc_d + dd8 * dd

    if vortB0 is not None and vortBN is not None:
        # blended per-level branch select (merged sponge groups); a traced
        # nord_mask is the in-kernel per-level 0/1 scalar from SMEM
        if _traced(nord_mask):
            # normalize dtype: the SMEM per-level scalar may arrive bool/int
            m0 = jnp.asarray(nord_mask, delp.dtype)
        else:
            m0 = jnp.asarray(np.asarray(nord_mask, np.float64),
                             delp.dtype).reshape((-1, 1, 1))
        vortB = m0 * vortB0 + (1.0 - m0) * vortBN
        divg_out = dd
    elif vortBN is not None:
        vortB = vortBN
        divg_out = dd
    else:
        vortB = vortB0
        divg_out = divg_d
    ke = ke + vortB

    do_heat = _on(d_con)
    if do_heat:
        ub_h = vortB[..., :, :-1] - vortB[..., :, 1:]       # y-wall shape
        vb_h = vortB[..., :-1, :] - vortB[..., 1:, :]       # x-wall shape

    # ---- vorticity transport & wind update -------------------------------
    vort_abs = wk + g.f0
    fxv, fyv = fv_tp_2d(vort_abs, crx, cry, hord_vt, xfx, yfx, g.area,
                        ra_x, ra_y, g.dxa, g.dya, lim_fac=lim_fac,
                        edges=edges)

    keB = ke
    u_full = vt_w + (keB[..., :, :-1] - keB[..., :, 1:])
    v_full = ut_w + (keB[..., :-1, :] - keB[..., 1:, :])
    u_new = u_full[..., wsl, ctr] + fyv
    v_new = v_full[..., ctr, wsl] - fxv

    # ---- vorticity damping (sw_core.F90:1513-1529) ------------------------
    fx2d = fy2d = None
    for dvc, nvc in ((damp_v, nord_v), (damp_v2, nord_v2)):
        if not _on(dvc):
            continue
        damp4 = (_pl(dvc, wk.dtype) * g.da_min_c) ** (nvc + 1)
        a_, b_ = deln_damp_fluxes(wk, nvc, g, prefac=damp4, edges=edges)
        fx2d = a_ if fx2d is None else fx2d + a_
        fy2d = b_ if fy2d is None else fy2d + b_

    if do_heat:
        rdx_c = g.rdx[..., wsl, ctr]
        rdy_c = g.rdy[..., ctr, wsl]
        ub2 = (ub_h[..., wsl, ctr]
               + (fy2d[..., wsl, ctr] if fy2d is not None else 0.0)) * rdx_c
        fy_d = u_new * rdx_c
        gy = fy_d * ub2
        vb2 = (vb_h[..., ctr, wsl]
               - (fx2d[..., ctr, wsl] if fx2d is not None else 0.0)) * rdy_c
        fx_d = v_new * rdy_c
        gx = fx_d * vb2
        u2 = fy_d[..., :-1, :] + fy_d[..., 1:, :]
        du2 = ub2[..., :-1, :] + ub2[..., 1:, :]
        v2 = fx_d[..., :, :-1] + fx_d[..., :, 1:]
        dv2 = vb2[..., :, :-1] + vb2[..., :, 1:]
        rs2 = g.rsin2[..., ctr, ctr]
        cs_ = g.cosa_s[..., ctr, ctr]
        tmp = rs2 * ((ub2[..., :-1, :] ** 2 + ub2[..., 1:, :] ** 2
                      + vb2[..., :, :-1] ** 2 + vb2[..., :, 1:] ** 2)
                     + 2.0 * (gy[..., :-1, :] + gy[..., 1:, :]
                              + gx[..., :, :-1] + gx[..., :, 1:])
                     - cs_ * (u2 * dv2 + v2 * du2 + du2 * dv2))
        hs0 = heat_source if heat_source is not None else 0.0
        heat_source = delp[..., ctr, ctr] * (hs0 - 0.25 * d_con_b * tmp)

    if fx2d is not None:
        u_new = u_new + fy2d[..., wsl, ctr]
        v_new = v_new - fx2d[..., ctr, wsl]

    return SimpleNamespace(
        u=u_new, v=v_new, delp=delp_new, pt=pt_new, w=w_new,
        fx=fx, fy=fy, crx=crx, cry=cry, xfx=xfx, yfx=yfx,
        ra_x=ra_x, ra_y=ra_y, divg_d=divg_out, ke=ke,
        heat_source=heat_source)


def _dsw_corner_solve(ut, vt, uc, vc, g, npx, use_select=False):
    """2x2 corner systems for parallel-to-edge uc/vc (sw_core.F90:763-860).

    The 16 point updates live within 6 rows of the top/bottom edges, so they
    are applied to thin row strips (cheap point sets on [.., 6, P] arrays)
    and stitched back with one concatenate per array, instead of 16
    full-array dynamic-update-slice passes. use_select=True (the in-kernel
    Pallas path) writes via two-stage iota-masked selects instead of
    .at[].set, which Mosaic lowers as scatter."""
    f = fi
    npy = npx
    S = 6
    NCr = ut.shape[-2]
    NWr = vt.shape[-2]
    strips = {
        "ut_t": ut[..., :S, :], "ut_b": ut[..., NCr - S:, :],
        "vt_t": vt[..., :S, :], "vt_b": vt[..., NWr - S:, :],
    }

    def _row(name, j, off):
        r = f(j)
        if r < S:
            return name + "_t", r
        return name + "_b", r - off

    def U(i, j):
        nm, r = _row("ut", j, NCr - S)
        return strips[nm][..., r:r + 1, f(i):f(i) + 1]

    def V(i, j):
        nm, r = _row("vt", j, NWr - S)
        return strips[nm][..., r:r + 1, f(i):f(i) + 1]

    if use_select:
        iy = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

        def _set(nm, r, i, val):
            s = strips[nm]
            ix = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
            zero = jnp.zeros((), s.dtype)
            # two-stage select: lanes first, then sublanes (Mosaic cannot
            # broadcast a [1,1] value into both dims in one select)
            row_val = jnp.where(ix == f(i), val, zero)
            strips[nm] = jnp.where((iy == r) & (ix == f(i)), row_val, s)
    else:
        def _set(nm, r, i, val):
            strips[nm] = strips[nm].at[..., r:r + 1, f(i):f(i) + 1].set(val)

    def setU(i, j, val):
        nm, r = _row("ut", j, NCr - S)
        _set(nm, r, i, val)

    def setV(i, j, val):
        nm, r = _row("vt", j, NWr - S)
        _set(nm, r, i, val)

    def UC(i, j):
        return uc[..., f(j):f(j) + 1, f(i):f(i) + 1]

    def VC(i, j):
        return vc[..., f(j):f(j) + 1, f(i):f(i) + 1]

    def CU(i, j):
        return g.cosa_u[..., f(j):f(j) + 1, f(i):f(i) + 1]

    def CV(i, j):
        return g.cosa_v[..., f(j):f(j) + 1, f(i):f(i) + 1]

    # SW corner
    damp = 1.0 / (1.0 - 0.0625 * CU(2, 0) * CV(1, 0))
    setU(2, 0,
        (UC(2, 0) - 0.25 * CU(2, 0) * (V(1, 1) + V(2, 1) + V(2, 0) + VC(1, 0)
         - 0.25 * CV(1, 0) * (U(1, 0) + U(1, -1) + U(2, -1)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(0, 1) * CV(0, 2))
    setV(0, 2,
        (VC(0, 2) - 0.25 * CV(0, 2) * (U(1, 1) + U(1, 2) + U(0, 2) + UC(0, 1)
         - 0.25 * CU(0, 1) * (V(0, 1) + V(-1, 1) + V(-1, 2)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(2, 1) * CV(1, 2))
    setU(2, 1,
        (UC(2, 1) - 0.25 * CU(2, 1) * (V(1, 1) + V(2, 1) + V(2, 2) + VC(1, 2)
         - 0.25 * CV(1, 2) * (U(1, 1) + U(1, 2) + U(2, 2)))) * damp)
    setV(1, 2,
        (VC(1, 2) - 0.25 * CV(1, 2) * (U(1, 1) + U(1, 2) + U(2, 2) + UC(2, 1)
         - 0.25 * CU(2, 1) * (V(1, 1) + V(2, 1) + V(2, 2)))) * damp)

    # SE corner
    damp = 1.0 / (1.0 - 0.0625 * CU(npx - 1, 0) * CV(npx - 1, 0))
    setU(npx - 1, 0,
        (UC(npx - 1, 0) - 0.25 * CU(npx - 1, 0) * (
            V(npx - 1, 1) + V(npx - 2, 1) + V(npx - 2, 0) + VC(npx - 1, 0)
            - 0.25 * CV(npx - 1, 0) * (U(npx, 0) + U(npx, -1) + U(npx - 1, -1)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(npx + 1, 1) * CV(npx, 2))
    setV(npx, 2,
        (VC(npx, 2) - 0.25 * CV(npx, 2) * (
            U(npx, 1) + U(npx, 2) + U(npx + 1, 2) + UC(npx + 1, 1)
            - 0.25 * CU(npx + 1, 1) * (V(npx, 1) + V(npx + 1, 1) + V(npx + 1, 2)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(npx - 1, 1) * CV(npx - 1, 2))
    setU(npx - 1, 1,
        (UC(npx - 1, 1) - 0.25 * CU(npx - 1, 1) * (
            V(npx - 1, 1) + V(npx - 2, 1) + V(npx - 2, 2) + VC(npx - 1, 2)
            - 0.25 * CV(npx - 1, 2) * (U(npx, 1) + U(npx, 2) + U(npx - 1, 2)))) * damp)
    setV(npx - 1, 2,
        (VC(npx - 1, 2) - 0.25 * CV(npx - 1, 2) * (
            U(npx, 1) + U(npx, 2) + U(npx - 1, 2) + UC(npx - 1, 1)
            - 0.25 * CU(npx - 1, 1) * (V(npx - 1, 1) + V(npx - 2, 1) + V(npx - 2, 2)))) * damp)

    # NE corner
    damp = 1.0 / (1.0 - 0.0625 * CU(npx - 1, npy) * CV(npx - 1, npy + 1))
    setU(npx - 1, npy,
        (UC(npx - 1, npy) - 0.25 * CU(npx - 1, npy) * (
            V(npx - 1, npy) + V(npx - 2, npy) + V(npx - 2, npy + 1) + VC(npx - 1, npy + 1)
            - 0.25 * CV(npx - 1, npy + 1) * (
                U(npx, npy) + U(npx, npy + 1) + U(npx - 1, npy + 1)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(npx + 1, npy - 1) * CV(npx, npy - 1))
    setV(npx, npy - 1,
        (VC(npx, npy - 1) - 0.25 * CV(npx, npy - 1) * (
            U(npx, npy - 1) + U(npx, npy - 2) + U(npx + 1, npy - 2) + UC(npx + 1, npy - 1)
            - 0.25 * CU(npx + 1, npy - 1) * (
                V(npx, npy) + V(npx + 1, npy) + V(npx + 1, npy - 1)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(npx - 1, npy - 1) * CV(npx - 1, npy - 1))
    setU(npx - 1, npy - 1,
        (UC(npx - 1, npy - 1) - 0.25 * CU(npx - 1, npy - 1) * (
            V(npx - 1, npy) + V(npx - 2, npy) + V(npx - 2, npy - 1) + VC(npx - 1, npy - 1)
            - 0.25 * CV(npx - 1, npy - 1) * (
                U(npx, npy - 1) + U(npx, npy - 2) + U(npx - 1, npy - 2)))) * damp)
    setV(npx - 1, npy - 1,
        (VC(npx - 1, npy - 1) - 0.25 * CV(npx - 1, npy - 1) * (
            U(npx, npy - 1) + U(npx, npy - 2) + U(npx - 1, npy - 2) + UC(npx - 1, npy - 1)
            - 0.25 * CU(npx - 1, npy - 1) * (
                V(npx - 1, npy) + V(npx - 2, npy) + V(npx - 2, npy - 1)))) * damp)

    # NW corner
    damp = 1.0 / (1.0 - 0.0625 * CU(2, npy) * CV(1, npy + 1))
    setU(2, npy,
        (UC(2, npy) - 0.25 * CU(2, npy) * (
            V(1, npy) + V(2, npy) + V(2, npy + 1) + VC(1, npy + 1)
            - 0.25 * CV(1, npy + 1) * (U(1, npy) + U(1, npy + 1) + U(2, npy + 1)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(0, npy - 1) * CV(0, npy - 1))
    setV(0, npy - 1,
        (VC(0, npy - 1) - 0.25 * CV(0, npy - 1) * (
            U(1, npy - 1) + U(1, npy - 2) + U(0, npy - 2) + UC(0, npy - 1)
            - 0.25 * CU(0, npy - 1) * (V(0, npy) + V(-1, npy) + V(-1, npy - 1)))) * damp)
    damp = 1.0 / (1.0 - 0.0625 * CU(2, npy - 1) * CV(1, npy - 1))
    setU(2, npy - 1,
        (UC(2, npy - 1) - 0.25 * CU(2, npy - 1) * (
            V(1, npy) + V(2, npy) + V(2, npy - 1) + VC(1, npy - 1)
            - 0.25 * CV(1, npy - 1) * (U(1, npy - 1) + U(1, npy - 2) + U(2, npy - 2)))) * damp)
    setV(1, npy - 1,
        (VC(1, npy - 1) - 0.25 * CV(1, npy - 1) * (
            U(1, npy - 1) + U(1, npy - 2) + U(2, npy - 2) + UC(2, npy - 1)
            - 0.25 * CU(2, npy - 1) * (V(1, npy) + V(2, npy) + V(2, npy - 1)))) * damp)

    ut = jnp.concatenate([strips["ut_t"], ut[..., S:NCr - S, :],
                          strips["ut_b"]], -2)
    vt = jnp.concatenate([strips["vt_t"], vt[..., S:NWr - S, :],
                          strips["vt_b"]], -2)
    return ut, vt


# ===========================================================================
# del2_cubed (dyn_core.F90:2356): Laplacian filter
# ===========================================================================

def del2_cubed(q, cd, g, nmax):
    """q: [..., P, P] padded cells (halo-exchanged). cd = K*da_min."""
    npx = g.npx
    f = fi
    ie = npx - 1
    ntimes = min(3, nmax)
    for _ in range(ntimes):
        # 3-cell corner averaging
        qsw = (q[..., f(1), f(1)] + q[..., f(1), f(0)] + q[..., f(0), f(1)]) * R3
        q = q.at[..., f(1), f(1)].set(qsw)
        q = q.at[..., f(1), f(0)].set(qsw)
        q = q.at[..., f(0), f(1)].set(qsw)
        qse = (q[..., f(1), f(ie)] + q[..., f(1), f(npx)] + q[..., f(0), f(ie)]) * R3
        q = q.at[..., f(1), f(ie)].set(qse)
        q = q.at[..., f(1), f(npx)].set(qse)
        q = q.at[..., f(0), f(ie)].set(qse)
        qne = (q[..., f(ie), f(ie)] + q[..., f(ie), f(npx)] + q[..., f(npx), f(ie)]) * R3
        q = q.at[..., f(ie), f(ie)].set(qne)
        q = q.at[..., f(ie), f(npx)].set(qne)
        q = q.at[..., f(npx), f(ie)].set(qne)
        qnw = (q[..., f(ie), f(1)] + q[..., f(ie), f(0)] + q[..., f(npx), f(1)]) * R3
        q = q.at[..., f(ie), f(1)].set(qnw)
        q = q.at[..., f(ie), f(0)].set(qnw)
        q = q.at[..., f(npx), f(1)].set(qnw)

        qx = copy_corners(q, H, 1)
        fx = g.del6_v[..., :, 1:-1] * (qx[..., :, :-1] - qx[..., :, 1:])
        fx = jnp.pad(fx, [(0, 0)] * (q.ndim - 1) + [(1, 1)])
        qy = copy_corners(q, H, 2)
        fyp = g.del6_u[..., 1:-1, :] * (qy[..., :-1, :] - qy[..., 1:, :])
        fyp = jnp.pad(fyp, [(0, 0)] * (q.ndim - 2) + [(1, 1), (0, 0)])
        q = q + cd * g.rarea * (fx[..., :, :-1] - fx[..., :, 1:]
                                + fyp[..., :-1, :] - fyp[..., 1:, :])
    return q
