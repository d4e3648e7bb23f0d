"""Negative-tracer fillers (reference model/fv_fill.F90).

Three fillers, matching the reference module surface:

* ``fillz`` — vertical borrowing, top-down (fv_fill.F90:34); lives in
  :mod:`..ops.fv_mapz` (used inside the remap) and is re-exported here.
* ``fill_gfs`` — vertical two-sweep borrowing on GFS-ordered columns
  (fv_fill.F90 fill_gfs:141): an upward pass pulls each negative into the
  layer above, then a downward pass pulls residual negatives into the layer
  below.  Exactly mass-conserving; layer 0 may retain a residual negative
  (so does the reference).
* ``fill2d`` — one-pass diffusive horizontal filling (fv_fill.F90
  fill2D:183): fluxes act only across faces where the tracer *mass*
  (q·delp·area) changes sign, with a fixed diffusive coefficient 0.25.

All operate on ``[..., km]`` columns / ``[6, ..., n, n]`` cube fields and are
jit-friendly (lax.scan for the sequential sweeps, halo gather for fill2d).
"""

import jax
import jax.numpy as jnp

from .fv_mapz import fillz  # noqa: F401  (re-export, fv_fill.F90:34)

_DIF = 0.25  # fv_fill.F90 fill2D diffusive coefficient


def fill_gfs(q, dp):
    """Two-sweep vertical filler (fv_fill.F90 fill_gfs:141).

    q, dp: [..., km] with k=0 the *bottom* layer (GFS ordering; the
    reference computes dp = pe2(k) - pe2(k+1) on its upside-down pressure
    edges — here dp is passed in positive).  Returns the filled q.
    """
    km = q.shape[-1]
    qf = jnp.moveaxis(q, -1, 0)
    dpf = jnp.moveaxis(dp, -1, 0)

    def sweep(q_lead, dp_lead, q_last, dp_last):
        """Borrow each layer's negative mass into the next layer; the
        final layer absorbs the residual and is not zeroed."""

        def body(carry, x):
            qk, dpk = x
            qk = qk + carry / dpk          # mass borrowed from the previous layer
            neg = jnp.minimum(qk, 0.0)
            return neg * dpk, qk - neg     # pass the deficit on; layer -> max(q,0)

        debt, out = jax.lax.scan(body, jnp.zeros_like(q_lead[0]),
                                 (q_lead, dp_lead))
        return out, q_last + debt / dp_last

    # upward: k = 0 .. km-2 borrow from above; top layer absorbs
    up, top = sweep(qf[:-1], dpf[:-1], qf[-1], dpf[-1])
    qf = jnp.concatenate([up, top[None]], axis=0)
    # downward: k = km-1 .. 1 borrow from below; bottom layer absorbs
    dn, bot = sweep(qf[:0:-1], dpf[:0:-1], qf[0], dpf[0])
    qf = jnp.concatenate([bot[None], dn[::-1]], axis=0)
    return jnp.moveaxis(qf, 0, -1)


def fill2d(q, delp, g):
    """Diffusive horizontal filler (fv_fill.F90 fill2D:183).

    q, delp: [6, ..., n, n].  One ring of halo is exchanged for the tracer
    mass qt = q*delp*area; a face flux fx = qt_left - qt_right is applied
    only where the two masses have opposite sign, scaled by 0.25.
    """
    h = g.halo.h
    n = g.n
    ctr = slice(h, h + n)
    area = jnp.asarray(g.geom.interior("area"), q.dtype)
    area = area.reshape(area.shape[:1] + (1,) * (q.ndim - 3) + area.shape[1:])
    qt = q * delp * area
    p = g.halo.pad_cell(qt)
    lx = p[..., ctr, h - 1:h + n]
    rx = p[..., ctr, h:h + n + 1]
    fx = jnp.where(lx * rx < 0.0, lx - rx, 0.0)
    ly = p[..., h - 1:h + n, ctr]
    ry = p[..., h:h + n + 1, ctr]
    fy = jnp.where(ly * ry < 0.0, ly - ry, 0.0)
    div = (fx[..., :-1] - fx[..., 1:]) + (fy[..., :-1, :] - fy[..., 1:, :])
    return q + _DIF * div / (delp * area)
