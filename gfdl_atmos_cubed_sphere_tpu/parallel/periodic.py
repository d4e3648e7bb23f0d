"""Doubly-periodic halo exchange (grid_type 4, the reference's cartesian
`setup_cartesian` domain, fv_grid_tools.F90:1160 + CYCLIC_GLOBAL_DOMAIN).

Same API as HaloExchanger (parallel/halo.py) so the dynamical core is
topology-agnostic: fields are [T, ..., n, n] (T = 1 tile); halos wrap
around with jnp.roll-style concatenation; vector components keep their
orientation (no cube rotations), and the duplicated D/C wall is the
periodic image of wall 0.
"""

import jax.numpy as jnp


class PeriodicHalo:
    def __init__(self, n, h):
        self.n = n
        self.h = h

    # -- scalars -----------------------------------------------------------

    def pad_cell(self, q, name=None):
        h = self.h
        q = jnp.concatenate([q[..., -h:, :], q, q[..., :h, :]], axis=-2)
        q = jnp.concatenate([q[..., :, -h:], q, q[..., :, :h]], axis=-1)
        return q


    def pad_cells(self, fields, names=None):
        """Grouped-pack API (see parallel/shard_halo.py): default
        per-field fallback."""
        names = names or (None,) * len(tuple(fields))
        return tuple(self.pad_cell(q, name=nm)
                     for q, nm in zip(fields, names))

    def pad_corner(self, q, name=None):
        """Corner-point field [.., n+1, n+1] where row/col n duplicates 0:
        pad periodically using the unique n interior walls."""
        h = self.h
        qq = q[..., :-1, :-1]                      # unique walls [n, n]
        qq = jnp.concatenate([qq[..., -h:, :], qq, qq[..., :h + 1, :]], -2)
        qq = jnp.concatenate([qq[..., :, -h:], qq, qq[..., :, :h + 1]], -1)
        return qq

    # -- vectors -----------------------------------------------------------

    def _pad_wall_y(self, u):
        """y-wall field [.., n+1, n] (row n == periodic image of row 0)."""
        h = self.h
        uu = u[..., :-1, :]                        # unique rows
        uu = jnp.concatenate([uu[..., -h:, :], uu, uu[..., :h + 1, :]], -2)
        uu = jnp.concatenate([uu[..., :, -h:], uu, uu[..., :, :h]], -1)
        return uu

    def _pad_wall_x(self, v):
        h = self.h
        vv = v[..., :, :-1]
        vv = jnp.concatenate([vv[..., :, -h:], vv, vv[..., :, :h + 1]], -1)
        vv = jnp.concatenate([vv[..., -h:, :], vv, vv[..., :h, :]], -2)
        return vv

    def pad_dgrid(self, u, v, names=None):
        """u [.., n+1, n] y-walls; v [.., n, n+1] x-walls."""
        return self._pad_wall_y(u), self._pad_wall_x(v)

    def pad_cgrid(self, uc, vc, names=None):
        """uc x-walls [.., n, n+1]; vc y-walls [.., n+1, n]."""
        return self._pad_wall_x(uc), self._pad_wall_y(vc)

    def reconcile_dgrid(self, u, v):
        """Duplicated wall consistency: wall n is the image of wall 0."""
        u = u.at[..., -1, :].set(u[..., 0, :])
        v = v.at[..., :, -1].set(v[..., :, 0])
        return u, v
