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


def block_mass_weighted_mean(field, delp, area, factor):
    """coarse_graining.F90 mass_weighted_block_average: weights delp*area
    (the model_level_mass_weighted restart strategy)."""
    w = delp * area
    fb = _blocks(field * w, factor).sum(axis=(-3, -1))
    wb = _blocks(jnp.broadcast_to(w, field.shape), factor).sum(axis=(-3, -1))
    return fb / wb


def length_weighted_coarse_grain_u(u, dx, factor):
    """D-grid u (y-walls [..., ny+1, nx]) -> coarse y-walls: keep every
    factor-th wall row and dx-weight-average along the wall
    (coarse_graining.F90 weighted_block_edge_average_x pattern)."""
    *lead, nyp, nx = u.shape
    assert (nyp - 1) % factor == 0 and nx % factor == 0
    us = u[..., ::factor, :] * dx[..., ::factor, :]
    ws = jnp.broadcast_to(dx, u.shape)[..., ::factor, :]
    usb = us.reshape(*lead, (nyp - 1) // factor + 1, nx // factor, factor)
    wsb = ws.reshape(*lead, (nyp - 1) // factor + 1, nx // factor, factor)
    return usb.sum(-1) / wsb.sum(-1)


def length_weighted_coarse_grain_v(v, dy, factor):
    """D-grid v (x-walls [..., ny, nx+1]) -> coarse x-walls (dy weights)."""
    *lead, ny, nxp = v.shape
    assert ny % factor == 0 and (nxp - 1) % factor == 0
    vs = v[..., :, ::factor] * dy[..., :, ::factor]
    ws = jnp.broadcast_to(dy, v.shape)[..., :, ::factor]
    vsb = vs.reshape(*lead, ny // factor, factor, (nxp - 1) // factor + 1)
    wsb = ws.reshape(*lead, ny // factor, factor, (nxp - 1) // factor + 1)
    return vsb.sum(-2) / wsb.sum(-2)


def coarse_grain_restart(state, q, g, factor,
                         strategy="model_level_area_weighted"):
    """Coarsen a full prognostic state for a coarse-grained restart
    (coarse_grained_restart_files.F90:481-511): delp always area-weighted
    (mass conserving), other cell fields area- or mass-weighted per the
    strategy, D winds length-weighted along the retained wall rows.
    Returns (coarse_state, coarse_q)."""
    if strategy not in ("model_level_area_weighted",
                        "model_level_mass_weighted"):
        raise ValueError(strategy)
    area = jnp.asarray(g.geom.interior("area"))[:, None]
    dx = jnp.asarray(g.geom.interior("dx"))[:, None]
    dy = jnp.asarray(g.geom.interior("dy"))[:, None]
    delp = state["delp"]
    mass = strategy == "model_level_mass_weighted"

    def cell(fld):
        if mass:
            return block_mass_weighted_mean(fld, delp, area, factor)
        return block_area_weighted_mean(fld, area, factor)

    out = {}
    for k, v in state.items():
        if v is None:
            continue
        if k == "delp":
            out[k] = block_area_weighted_mean(v, area, factor)
        elif k == "u":
            out[k] = length_weighted_coarse_grain_u(v, dx, factor)
        elif k == "v":
            out[k] = length_weighted_coarse_grain_v(v, dy, factor)
        elif k == "phis":
            out[k] = block_area_weighted_mean(
                v, area if v.ndim == area.ndim else area[:, 0], factor)
        elif v.ndim >= 3 and v.shape[-1] == area.shape[-1]:
            out[k] = cell(v)
        else:
            out[k] = v
    qc = {k: cell(v) for k, v in (q or {}).items()}
    return out, qc
