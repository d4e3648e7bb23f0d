"""Coarse graining (component #27).

Re-implements the block-reduction strategies of
/root/reference/tools/coarse_graining.F90 (:32-42: model_level_area_weighted
/ area_weighted mean, mode, masked-area, min) as XLA block reshapes.
Fields are [6, ..., n, n] with n divisible by the coarsening factor.
"""

import jax.numpy as jnp


def _blocks(field, factor):
    *lead, ny, nx = field.shape
    assert ny % factor == 0 and nx % factor == 0, (ny, nx, factor)
    return field.reshape(*lead, ny // factor, factor, nx // factor, factor)


def block_area_weighted_mean(field, area, factor):
    """coarse_graining.F90 weighted_block_average: sum(q*area)/sum(area)."""
    fb = _blocks(field * area, factor)
    ab = _blocks(jnp.broadcast_to(area, field.shape), factor)
    return fb.sum(axis=(-3, -1)) / ab.sum(axis=(-3, -1))


def block_mean(field, factor):
    return _blocks(field, factor).mean(axis=(-3, -1))


def block_sum(field, factor):
    return _blocks(field, factor).sum(axis=(-3, -1))


def block_min(field, factor):
    """blocks -> min (terrain coarsening strategy)."""
    return _blocks(field, factor).min(axis=(-3, -1))


def block_max(field, factor):
    return _blocks(field, factor).max(axis=(-3, -1))


def block_masked_area_mean(field, area, mask, factor, fill=0.0):
    """masked_area_average (coarse_graining.F90 statistics-based strategy):
    mean over cells where mask is true; `fill` where no cell qualifies."""
    m = jnp.broadcast_to(mask, field.shape)
    fa = _blocks(jnp.where(m, field * area, 0.0), factor).sum(axis=(-3, -1))
    aa = _blocks(jnp.where(m, jnp.broadcast_to(area, field.shape), 0.0),
                 factor).sum(axis=(-3, -1))
    return jnp.where(aa > 0.0, fa / jnp.maximum(aa, 1e-300), fill)


def block_mode(field, factor, num_classes):
    """blocks -> most frequent integer class (mode strategy for categorical
    fields like land type). field: integer classes in [0, num_classes)."""
    fb = _blocks(field, factor)
    counts = jnp.stack(
        [(fb == c).sum(axis=(-3, -1)) for c in range(num_classes)], axis=-1)
    return jnp.argmax(counts, axis=-1)


def coarse_grain_state(state, area, factor, weighted=("delp", "pt", "w")):
    """Coarsen a dict of cell-centered fields (coarse_grained_restart_files
    pattern): area-weighted for listed fields, plain mean otherwise."""
    out = {}
    for k, v in state.items():
        if v is None:
            continue
        if v.shape[-1] % factor != 0:
            continue          # staggered fields need their own treatment
        if k in weighted:
            out[k] = block_area_weighted_mean(v, area, factor)
        else:
            out[k] = block_mean(v, factor)
    return out
