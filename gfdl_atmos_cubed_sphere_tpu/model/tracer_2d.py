"""Large-timestep tracer transport with CFL-adaptive subcycling.

Re-implements /root/reference/model/fv_tracer2d.F90 (tracer_2d:~300, the
single-nsplt variant): the acoustic loop accumulates mass fluxes mfx/mfy and
Courant numbers cx/cy (flux capacitors, dyn_core.F90); tracers are then
advected over the big timestep in ``nsplt`` subcycles where
``nsplt = floor(1 + max|courant|)`` (global max, the mp_reduce_max at
fv_tracer2d.F90:164-166), each subcycle applying fv_tp_2d with the 1/nsplt-
scaled fluxes and updating the pressure thickness consistently.

All tracers are advected as one batched array [6, T, K, y, x] — the
reference's per-tracer loop becomes a leading batch dim feeding the MXU/VPU
together.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from ..ops.sw_core import _cl, _cr, _rl, _rr
from ..ops.tp_core import fv_tp_2d
from ..ops.fill_corners import cube_edges

H = 3


def _tracer_fluxes(cx, cy, g):
    """Area fluxes xfx/yfx recovered from accumulated Courant numbers
    (fv_tracer2d.F90:117-140 upwind dxa/sin_sg pick)."""
    xfx = cx * g.dy * jnp.where(cx > 0.0, _cl(g.dxa * g.sin_sg3),
                                _cr(g.dxa * g.sin_sg1))
    yfx = cy * g.dx * jnp.where(cy > 0.0, _rl(g.dya * g.sin_sg4),
                                _rr(g.dya * g.sin_sg2))
    return xfx, yfx


def tracer_2d(q, dp1, mfx, mfy, cx, cy, g, hord_tr, q_split=0,
              max_split=10, lim_fac=1.0):
    """Advect the tracer dict `q` ([6, K, n, n] each) over one big timestep.

    dp1: delp BEFORE the acoustic loop (fv_dynamics.F90:474-481);
    mfx/mfy: accumulated mass fluxes on compute walls [6,K,n,n+1]/[6,K,n+1,n];
    cx/cy: accumulated Courant numbers on padded walls (d_sw shapes).
    q_split > 0 forces a static subcycle count (jit-static trip count, the
    namelist q_split); q_split == 0 uses the CFL-adaptive count under a
    bounded lax.while_loop.
    Returns (new q dict, dp_final [6, K, n, n]).
    """
    halo = g.halo
    n = g.n
    ctr = slice(H, H + n)
    names = list(q.keys())
    qs = jnp.stack([q[k] for k in names], axis=1)        # [6, T, K, n, n]

    xfx, yfx = _tracer_fluxes(cx, cy, g)
    rarea = g.rarea[..., ctr, ctr]

    def substep(frac, dp_in, qs_in):
        cxi, cyi = frac * cx, frac * cy
        xfxi, yfxi = frac * xfx, frac * yfx
        mfxi, mfyi = frac * mfx, frac * mfy
        ra_x = g.area + xfxi[..., :, :-1] - xfxi[..., :, 1:]
        ra_y = g.area + yfxi[..., :-1, :] - yfxi[..., 1:, :]
        dp2 = dp_in + (mfxi[..., :, :-1] - mfxi[..., :, 1:]
                       + mfyi[..., :-1, :] - mfyi[..., 1:, :]) * rarea
        qp = halo.pad_cell(qs_in)
        # add a tracer batch dim so grid arrays [6,1,P,P] stay aligned with
        # the rank-5 stacked tracers [6,T,K,P,P]
        e = lambda a: a[:, None]
        fx, fy = fv_tp_2d(qp, e(cxi), e(cyi), hord_tr, e(xfxi), e(yfxi),
                          e(g.area), e(ra_x), e(ra_y), e(g.dxa), e(g.dya),
                          lim_fac=lim_fac, mfx=e(mfxi), mfy=e(mfyi),
                          edges=cube_edges(g))
        qs_out = (qs_in * dp_in[:, None]
                  + (fx[..., :, :-1] - fx[..., :, 1:]
                     + fy[..., :-1, :] - fy[..., 1:, :]) * e(rarea)) / dp2[:, None]
        return dp2, qs_out

    if q_split > 0:
        frac = 1.0 / q_split
        dp = dp1
        for _ in range(q_split):
            dp, qs = substep(frac, dp, qs)
    else:
        # adaptive: nsplt = floor(1 + cmax) (fv_tracer2d.F90:164-166);
        # bounded while_loop keeps the trip count data-dependent under jit.
        # Max over the compute domain only — padded corner blocks hold
        # NaN-poison from the metric precompute.
        wsl = slice(H, H + n + 1)
        cmax = jnp.maximum(jnp.max(jnp.abs(cx[..., ctr, wsl])),
                           jnp.max(jnp.abs(cy[..., wsl, ctr])))
        axis = getattr(halo, "axis", None)
        if axis is not None:
            # tile-parallel: the split count must be the GLOBAL courant max
            # (fv_tracer2d.F90 mp_reduce_max analog)
            cmax = jax.lax.pmax(cmax, axis)
        nsplt = jnp.minimum(jnp.floor(1.0 + cmax), float(max_split))
        frac = 1.0 / nsplt

        def cond(carry):
            it, _, _ = carry
            return it < nsplt

        def body(carry):
            it, dp_in, qs_in = carry
            dp2, qs_out = substep(frac, dp_in, qs_in)
            return (it + 1.0, dp2, qs_out)

        _, dp, qs = jax.lax.while_loop(cond, body, (jnp.asarray(0.0, cx.dtype),
                                                    dp1, qs))

    q_new = {k: qs[:, i] for i, k in enumerate(names)}
    return q_new, dp
