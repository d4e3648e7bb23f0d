"""Nested/regional boundary machinery (components #19/#20).

Re-implements the interpolation/feedback operators of
/root/reference/model/boundary.F90 (nested_grid_BC_* :46-80, the 4-point
bilinear ind/wt interpolation of coarse-grid data onto fine-grid boundary
cells, and update_coarse_grid :78-80 area-weighted feedback) and the
regional lateral-BC application of model/fv_regional_bc.F90
(setup_regional_BC:259: two time levels with t1->t0 rotation :1306,
`bc_update_interval` time interpolation, `nrows_blend` blending rows
:250).

Round-1 scope: the operators + a planar nest driver; concurrent
multi-grid execution of cube nests is a later phase.
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

H = 3


def coarse_to_fine(field_c, refinement, offset_j=0, offset_i=0,
                   fine_shape=None):
    """Bilinear interpolation of a coarse cell field onto a finer grid
    (the nested_grid_BC ind/wt scheme, boundary.F90:~600).

    field_c: [..., ny_c, nx_c]; the fine grid covers coarse cells
    [offset_j, offset_j + ny_f/R) x [offset_i, ...). Returns
    [..., ny_f, nx_f]."""
    R = refinement
    ny_c, nx_c = field_c.shape[-2:]
    if fine_shape is None:
        fine_shape = ((ny_c - offset_j) * R, (nx_c - offset_i) * R)
    ny_f, nx_f = fine_shape

    # fine cell centers in coarse index space
    jf = offset_j + (np.arange(ny_f) + 0.5) / R - 0.5
    if_ = offset_i + (np.arange(nx_f) + 0.5) / R - 0.5
    j0 = np.clip(np.floor(jf).astype(int), 0, ny_c - 2)
    i0 = np.clip(np.floor(if_).astype(int), 0, nx_c - 2)
    wj = np.clip(jf - j0, 0.0, 1.0)
    wi = np.clip(if_ - i0, 0.0, 1.0)

    f00 = field_c[..., j0[:, None], i0[None, :]]
    f01 = field_c[..., j0[:, None], i0[None, :] + 1]
    f10 = field_c[..., j0[:, None] + 1, i0[None, :]]
    f11 = field_c[..., j0[:, None] + 1, i0[None, :] + 1]
    wjj = jnp.asarray(wj)[:, None]
    wii = jnp.asarray(wi)[None, :]
    return ((1 - wjj) * ((1 - wii) * f00 + wii * f01)
            + wjj * ((1 - wii) * f10 + wii * f11))


def coarse_to_fine_stagger(field_c, refinement, offset_j=0.0, offset_i=0.0,
                           fine_shape=None, wall=(False, False)):
    """coarse_to_fine generalized to staggered (wall) axes: a True entry in
    `wall` means that axis holds cell-wall values (D/C-grid winds), whose
    coordinates are integers in coarse index space rather than centers
    (nested_grid_BC's u/v ind/wt tables, boundary.F90:~700)."""
    R = refinement
    ny_c, nx_c = field_c.shape[-2:]
    ny_f, nx_f = fine_shape

    def coords(n_f, off, w, n_c):
        if w:
            x = off + np.arange(n_f) / R
        else:
            x = off + (np.arange(n_f) + 0.5) / R - 0.5
        i0 = np.clip(np.floor(x).astype(int), 0, n_c - 2)
        return i0, np.clip(x - i0, 0.0, 1.0)

    j0, wj = coords(ny_f, offset_j, wall[0], ny_c)
    i0, wi = coords(nx_f, offset_i, wall[1], nx_c)
    f00 = field_c[..., j0[:, None], i0[None, :]]
    f01 = field_c[..., j0[:, None], i0[None, :] + 1]
    f10 = field_c[..., j0[:, None] + 1, i0[None, :]]
    f11 = field_c[..., j0[:, None] + 1, i0[None, :] + 1]
    wjj = jnp.asarray(wj)[:, None]
    wii = jnp.asarray(wi)[None, :]
    return ((1 - wjj) * ((1 - wii) * f00 + wii * f01)
            + wjj * ((1 - wii) * f10 + wii * f11))


def blend_interior(field, bc, nrows_blend=5, wall=(False, False)):
    """Relax the rows nearest the lateral walls toward BC data on the
    INTERIOR frame (the nrows_blend zone of fv_regional_bc.F90:250 without
    a persistent halo: the model re-pads internally each step, so the
    boundary forcing lives in the blend rows). Weight 1 at the wall row,
    falling linearly to 0 past nrows_blend."""
    ny, nx = field.shape[-2:]

    def dist(n, w):
        d = np.arange(n, dtype=np.float64)
        d = np.minimum(d, n - 1 - d)
        if not w:
            d = d + 0.5
        return d

    d2 = np.minimum.outer(dist(ny, wall[0]), dist(nx, wall[1]))
    wgt = jnp.asarray(np.clip(1.0 - d2 / (nrows_blend + 0.5), 0.0, 1.0))
    return (1.0 - wgt) * field + wgt * bc


def fine_to_coarse(field_f, refinement, area_f=None):
    """Area-weighted feedback of the fine grid onto its coarse footprint
    (update_coarse_grid, boundary.F90:78-80)."""
    from ..utils.coarse_graining import (block_area_weighted_mean, block_mean)
    if area_f is None:
        return block_mean(field_f, refinement)
    return block_area_weighted_mean(field_f, area_f, refinement)


def twoway_feedback_dgrid(parent_u, parent_v, nest_u, nest_v, refinement,
                          offset_j, offset_i, blend=1.0,
                          dx_f=None, dy_f=None):
    """Two-way feedback of the D-grid winds (update_twowaynest's
    remap-along-wall averaging, fv_nesting.F90:2356-2440): each coarse
    wall coincides with a fine wall line; the coarse wind is the
    length-weighted mean of the R fine-wall segments it spans. Only walls
    strictly inside the nest footprint are updated (the reference's
    isu/ieu bounds exclude the BC edge). nest_u [T,K,nf+1,nf] (y-walls),
    nest_v [T,K,nf,nf+1]; dx_f/dy_f optional fine wall lengths for the
    weighting (plain mean otherwise)."""
    import jax.numpy as jnp
    R = refinement
    nf = nest_u.shape[-1]
    nc = nf // R

    # u: coarse y-wall j -> fine wall R*j; average R cells along x
    uw = nest_u[..., ::R, :]                          # [.., nc+1, nf]
    if dx_f is not None:
        wx = dx_f[..., ::R, :]
        u_c = ((uw * wx).reshape(*uw.shape[:-1], nc, R).sum(-1)
               / wx.reshape(*wx.shape[:-1], nc, R).sum(-1))
    else:
        u_c = uw.reshape(*uw.shape[:-1], nc, R).mean(-1)
    # v: coarse x-wall i -> fine wall R*i; average R cells along y
    vw = nest_v[..., :, ::R]                          # [.., nf, nc+1]
    if dy_f is not None:
        wy = dy_f[..., :, ::R]
        num = (vw * wy).reshape(*vw.shape[:-2], nc, R, nc + 1).sum(-2)
        den = wy.reshape(*wy.shape[:-2], nc, R, nc + 1).sum(-2)
        v_c = num / den
    else:
        v_c = vw.reshape(*vw.shape[:-2], nc, R, nc + 1).mean(-2)

    # interior walls only: rows/cols 1..nc-1 of the footprint
    ju = slice(offset_j + 1, offset_j + nc)
    iu = slice(offset_i, offset_i + nc)
    reg_u = parent_u[..., ju, iu]
    parent_u = parent_u.at[..., ju, iu].set(
        (1.0 - blend) * reg_u + blend * u_c[..., 1:-1, :])
    jv = slice(offset_j, offset_j + nc)
    iv = slice(offset_i + 1, offset_i + nc)
    reg_v = parent_v[..., jv, iv]
    parent_v = parent_v.at[..., jv, iv].set(
        (1.0 - blend) * reg_v + blend * v_c[..., :, 1:-1])
    return parent_u, parent_v


def twoway_feedback(parent_field, nest_field, refinement, offset_j, offset_i,
                    blend=1.0, area_f=None):
    """Two-way nesting feedback (fv_nesting.F90 twoway_nesting:2219):
    replace the parent cells under the nest footprint with the
    area-averaged nest solution, optionally blended."""
    coarse = fine_to_coarse(nest_field, refinement, area_f)
    nyc, nxc = coarse.shape[-2:]
    region = parent_field[..., offset_j:offset_j + nyc,
                          offset_i:offset_i + nxc]
    updated = (1.0 - blend) * region + blend * coarse
    return parent_field.at[..., offset_j:offset_j + nyc,
                           offset_i:offset_i + nxc].set(updated)


@dataclass
class RegionalBCBuffers:
    """Two-time-level lateral BC store (fv_regional_bc.F90
    setup_regional_BC): fields at t0 and t1, interval seconds."""
    t0: dict
    t1: dict
    interval: float

    def at_time(self, t_seconds):
        """Linear time interpolation (regional_bc_data + bc_time rotation)."""
        w = jnp.clip(t_seconds / self.interval, 0.0, 1.0)
        return {k: (1.0 - w) * self.t0[k] + w * self.t1[k] for k in self.t0}

    def rotate(self, new_t1):
        """t1 -> t0 rotation at a BC update (fv_regional_bc.F90:1306)."""
        self.t0 = self.t1
        self.t1 = new_t1


def apply_lateral_bc(field_padded, bc_padded, n, nrows_blend=5, h=H):
    """Overwrite the halo ring with BC data and blend `nrows_blend`
    interior rows toward it (regional_boundary_update + nrows_blend,
    fv_regional_bc.F90:250).

    field_padded/bc_padded: [..., n+2h, n+2h]. Blend weight falls linearly
    from 1 at the first interior row to 0 past nrows_blend."""
    P = n + 2 * h
    jj = np.arange(P)
    # distance (in rows) into the interior from the nearest boundary;
    # halo rows get distance <= 0
    dist = np.minimum(np.minimum(jj - h, P - 1 - h - jj + 0), 10 ** 9)
    d2 = np.minimum.outer(dist, dist)
    w = np.clip(1.0 - (d2 + 1.0) / (nrows_blend + 1.0), 0.0, 1.0)
    w = np.where(d2 < 0, 1.0, w)
    wj = jnp.asarray(w)
    return (1.0 - wj) * field_padded + wj * bc_padded


class PlanarNest:
    """A one-way (optionally two-way) planar nest driven from a parent
    doubly-periodic domain — the concurrent-grid pod of fv_control's
    multi-grid setup, reduced to a single process.

    parent/nest: dicts with grid packs and states; refinement R; the nest
    covers parent cells [oj, oj+nn/R) x [oi, oi+nn/R)."""

    def __init__(self, refinement, offset_j, offset_i, n_nest):
        self.R = refinement
        self.oj = offset_j
        self.oi = offset_i
        self.nn = n_nest

    def nest_bc_from_parent(self, parent_fields, h=H):
        """Interpolate the parent state onto the nest's PADDED frame
        (setup_nested_grid_BCs role): returns padded [.., nn+2h, nn+2h]
        fields usable with apply_lateral_bc."""
        out = {}
        for k, fc in parent_fields.items():
            # nest padded frame covers coarse extent offset by h/R
            fine = coarse_to_fine(
                fc, self.R,
                offset_j=self.oj - h / self.R * 1.0,
                offset_i=self.oi - h / self.R * 1.0,
                fine_shape=(self.nn + 2 * h, self.nn + 2 * h))
            out[k] = fine
        return out

    def feedback(self, parent_field, nest_field, blend=1.0):
        return twoway_feedback(parent_field, nest_field, self.R,
                               self.oj, self.oi, blend=blend)
