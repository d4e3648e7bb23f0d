"""Limited-area (regional) halo backend (component #20).

The reference's regional mode (model/fv_regional_bc.F90) runs the core on
a single limited-area tile whose data-domain ghost ring is filled from
externally prescribed lateral boundary conditions (setup_regional_BC:259,
regional_bc_data:1574) rather than from neighbor ranks. This module is
the halo-API face of that design: same pad surface as PeriodicHalo
(parallel/periodic.py) / HaloExchanger (parallel/halo.py), so the
dynamical core stays topology-agnostic.

Pads are zero-gradient (edge replication) extrapolations of the outermost
prognostic row. The prescribed-BC content itself is imposed by Davies
relaxation over `nrows_blend` interior rows (model/fv_regional_bc.py),
which the reference applies per acoustic step via
`regional_boundary_update`; with the blend rows pinned to BC data, the
replicated ghost ring carries the BC values into the one-sided stencils.
This replaces the reference's per-variable ghost-ring scatter
(fv_regional_bc.F90:~2600 bc_*_t1 fills) with a formulation that keeps
every field's pad a pure function of the current state — no mutable ghost
storage, XLA-friendly.
"""

import jax.numpy as jnp


def _edge_pad(q, h, axes=(-2, -1), extra=(0, 0)):
    """Replicate the outermost entries h times on both ends of `axes`."""
    for ax in axes:
        lo = jnp.repeat(jnp.take(q, jnp.asarray([0]), axis=ax), h, axis=ax)
        hi = jnp.repeat(jnp.take(q, jnp.asarray([q.shape[ax] - 1]), axis=ax),
                        h, axis=ax)
        q = jnp.concatenate([lo, q, hi], axis=ax)
    return q


class RegionalHalo:
    """Zero-gradient lateral pads for the limited-area domain.

    Field layout matches the doubly-periodic pack (build_grid_ops_dp):
    [T=1, K, y, x] with n cells per side; pads produce the same shapes as
    PeriodicHalo so dyn_core/sw_core run unchanged.
    """

    def __init__(self, n, h):
        self.n = n
        self.h = h

    # -- scalars -----------------------------------------------------------

    def pad_cell(self, q, name=None):
        """[.., n, n] -> [.., n+2h, n+2h]."""
        return _edge_pad(q, self.h)


    def pad_cells(self, fields, names=None):
        """Grouped-pack API (see parallel/shard_halo.py): default
        per-field fallback."""
        names = names or (None,) * len(tuple(fields))
        return tuple(self.pad_cell(q, name=nm)
                     for q, nm in zip(fields, names))

    def pad_corner(self, q, name=None):
        """[.., n+1, n+1] -> [.., n+2h+1, n+2h+1]. All walls are unique on
        the open domain (no duplicated periodic image)."""
        return _edge_pad(q, self.h)

    # -- vectors -----------------------------------------------------------

    def pad_dgrid(self, u, v, names=None):
        """u [.., n+1, n] y-walls -> [.., n+2h+1, n+2h];
        v [.., n, n+1] x-walls -> [.., n+2h, n+2h+1]."""
        return _edge_pad(u, self.h), _edge_pad(v, self.h)

    def pad_cgrid(self, uc, vc, names=None):
        """uc x-walls [.., n, n+1]; vc y-walls [.., n+1, n]."""
        return _edge_pad(uc, self.h), _edge_pad(vc, self.h)

    def reconcile_dgrid(self, u, v):
        """No duplicated walls on the open limited-area domain."""
        return u, v
