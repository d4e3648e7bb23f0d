"""Pallas TPU mega-kernel for the 2-D PPM advection operator.

fv_tp_2d (tp_core.F90:85) is the hottest composite in the acoustic loop
(called 4-6x per d_sw per level). The XLA op-graph version executes as
dozens of separate ~0.1 ms fusions per call; this kernel computes both
directional sweeps for one (tile, level) face slab entirely in VMEM —
one kernel, one HBM read per operand, one write per flux.

The kernel body REUSES the pure-jnp xppm/yppm from tp_core (Mosaic
supports the slice/where/select graph), so the numerics are identical by
construction; corner sweep fills (copy_corners) are applied outside the
kernel where the topology gathers live.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tp_core

H = 3


def _tp2d_body(q, qx, qy, crx, cry, xfx, yfx, area, ra_x, ra_y, dxa, dya,
               hord, lim_fac, with_mf):
    """The fv_tp_2d double-sweep on one [P, P] face (wall arrays [P, W] /
    [W, P] pre-sliced to compute walls). Returns (fx, fy[, fx2c, fy2c])."""
    h = H
    n = q.shape[-1] - 2 * h
    ord_in = 8 if hord == 10 else hord
    ord_ou = hord
    ctr = slice(h, h + n)

    fy2 = tp_core.yppm(qy, cry, dya, ord_in, lim_fac, True)
    fyy = yfx * fy2
    q_i = (q[..., ctr, :] * area[..., ctr, :]
           + fyy[..., :-1, :] - fyy[..., 1:, :]) / ra_y
    fx_ou = tp_core.xppm(q_i, crx[..., ctr, :], dxa[..., ctr, :], ord_ou,
                         lim_fac, True)

    fx2 = tp_core.xppm(qx, crx, dxa, ord_in, lim_fac, True)
    fx1 = xfx * fx2
    q_j = (q[..., :, ctr] * area[..., :, ctr]
           + fx1[..., :, :-1] - fx1[..., :, 1:]) / ra_x
    fy_ou = tp_core.yppm(q_j, cry[..., :, ctr], dya[..., :, ctr], ord_ou,
                         lim_fac, True)

    return fx_ou, fx2, fy_ou, fy2


def _make_kernel(hord, lim_fac, with_mf, rank5=False):
    def kernel(q_ref, qx_ref, qy_ref, crx_ref, cry_ref, xfx_ref, yfx_ref,
               area_ref, rax_ref, ray_ref, dxa_ref, dya_ref, mfx_ref,
               mfy_ref, fx_ref, fy_ref):
        sq = (lambda r: r[0, 0]) if rank5 else (lambda r: r[0])
        q = sq(q_ref)
        fx_ou, fx2, fy_ou, fy2 = _tp2d_body(
            q, sq(qx_ref), sq(qy_ref), sq(crx_ref), sq(cry_ref),
            sq(xfx_ref), sq(yfx_ref), sq(area_ref), sq(rax_ref),
            sq(ray_ref), sq(dxa_ref), sq(dya_ref), hord, lim_fac, with_mf)
        n = q.shape[-1] - 2 * H
        ctr = slice(H, H + n)
        if with_mf:
            fx = 0.5 * (fx_ou + fx2[..., ctr, :]) * sq(mfx_ref)
            fy = 0.5 * (fy_ou + fy2[..., :, ctr]) * sq(mfy_ref)
        else:
            fx = 0.5 * (fx_ou + fx2[..., ctr, :]) * sq(xfx_ref)[..., ctr, :]
            fy = 0.5 * (fy_ou + fy2[..., :, ctr]) * sq(yfx_ref)[..., :, ctr]
        if rank5:
            fx_ref[0, 0] = fx
            fy_ref[0, 0] = fy
        else:
            fx_ref[0] = fx
            fy_ref[0] = fy

    return kernel


def fv_tp_2d_pallas(q, crx, cry, hord, xfx, yfx, area, ra_x, ra_y, dxa, dya,
                    h=3, lim_fac=1.0, mfx=None, mfy=None,
                    nord=None, damp_c=None, g=None, mass=None):
    """Drop-in replacement for tp_core.fv_tp_2d on TPU.

    Shapes as fv_tp_2d: q [6, K, P, P] (or [6, P, P]); metric arrays
    broadcastable [6, 1, P, P]. Del-n damping (nord/damp_c) is applied
    outside the kernel via deln_flux_add (same as the reference's separate
    deln_flux pass)."""
    n = q.shape[-1] - 2 * h
    ctr = slice(h, h + n)
    wsl = slice(h, h + n + 1)
    squeeze_k = False
    if q.ndim == 3:
        q = q[:, None]
        squeeze_k = True
    K = q.shape[1]

    # slice full-wall arrays down to compute walls (as fv_tp_2d does)
    if crx.shape[-1] == n + 1 + 2 * h:
        crx = crx[..., :, wsl]
        xfx = xfx[..., :, wsl]
    if cry.shape[-2] == n + 1 + 2 * h:
        cry = cry[..., wsl, :]
        yfx = yfx[..., wsl, :]
    if ra_x.shape[-1] == q.shape[-1]:
        ra_x = ra_x[..., :, ctr]
    if ra_y.shape[-2] == q.shape[-2]:
        ra_y = ra_y[..., ctr, :]

    qx = tp_core.copy_corners(q, h, 1)
    qy = tp_core.copy_corners(q, h, 2)

    with_mf = mfx is not None
    if not with_mf:
        mfx = jnp.zeros((6, 1, 1, 1), q.dtype)
        mfy = jnp.zeros((6, 1, 1, 1), q.dtype)

    def bcast(a, K_target):
        a = jnp.asarray(a, q.dtype)
        if a.ndim == 3:
            a = a[:, None]
        return a

    ins = [q, qx, qy, bcast(crx, K), bcast(cry, K), bcast(xfx, K),
           bcast(yfx, K), bcast(area, K), bcast(ra_x, K), bcast(ra_y, K),
           bcast(dxa, K), bcast(dya, K), bcast(mfx, K), bcast(mfy, K)]

    def spec_for(a, kb):
        _, kk, yy, xx = a.shape
        if kk == 1:
            return pl.BlockSpec((1, 1, yy, xx),
                                (lambda t, k: (t, 0, 0, 0)),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, kb, yy, xx),
                            (lambda t, k: (t, k, 0, 0)),
                            memory_space=pltpu.VMEM)

    P = q.shape[-1]
    W = n + 1
    out_shape = [
        jax.ShapeDtypeStruct((6, K, n, W), q.dtype),
        jax.ShapeDtypeStruct((6, K, W, n), q.dtype),
    ]
    def out_specs(kb):
        return [
            pl.BlockSpec((1, kb, n, W), lambda t, k: (t, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, W, n), lambda t, k: (t, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    # batch several levels per program to amortize per-program overhead
    kb = 1
    for cand in (4, 2, 1):
        if K % cand == 0:
            kb = cand
            break
    kernel = _make_kernel(hord, float(lim_fac), with_mf)
    fx, fy = pl.pallas_call(
        kernel,
        grid=(6, K // kb),
        in_specs=[spec_for(a, kb) for a in ins],
        out_specs=out_specs(kb),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    if nord is not None and damp_c is not None and damp_c > 1.0e-4 and g is not None:
        damp4 = (damp_c * g.da_min) ** (nord + 1)
        fx, fy = tp_core.deln_flux_add(q, fx, fy, nord, damp4, g, mass=mass)
    if squeeze_k:
        fx = fx[:, 0]
        fy = fy[:, 0]
    return fx, fy


def tp2d_sweep_pallas(q, crx, cry, hord, xfx, yfx, area, ra_x, ra_y,
                      dxa, dya, lim_fac=1.0, mfx=None, mfy=None):
    """The fv_tp_2d double sweep as one Pallas kernel per (tile, level).

    Called from tp_core.fv_tp_2d on TPU with operands already sliced to
    compute walls; returns the combined (fx, fy) — the caller applies
    del-n damping. q: [6, K, P, P], or the batched-tracer rank-5 form
    [6, T, K, P, P] with winds/metrics [6, 1, K|1, ...]: the grid gets a
    tracer dimension whose index_map pins the shared wind slabs, so each
    wind level is read from HBM once regardless of tracer count
    (tracer_2d's all-tracers-one-call path, fv_tracer2d.F90:390-400)."""
    h = H
    n = q.shape[-1] - 2 * h
    rank5 = q.ndim == 5
    T = q.shape[1] if rank5 else 1
    K = q.shape[2] if rank5 else q.shape[1]

    qx = tp_core.copy_corners(q, h, 1)
    qy = tp_core.copy_corners(q, h, 2)

    with_mf = mfx is not None
    zshape = (6, 1, 1, 1, 1) if rank5 else (6, 1, 1, 1)
    if not with_mf:
        mfx = jnp.zeros(zshape, q.dtype)
        mfy = jnp.zeros(zshape, q.dtype)

    def bcast(a):
        a = jnp.asarray(a, q.dtype)
        while a.ndim < q.ndim:
            a = a[:, None]
        return a

    ins = [q, qx, qy, bcast(crx), bcast(cry), bcast(xfx), bcast(yfx),
           bcast(area), bcast(ra_x), bcast(ra_y), bcast(dxa), bcast(dya),
           bcast(mfx), bcast(mfy)]

    W = n + 1
    kb = 1
    for cand in (4, 2, 1):
        if K % cand == 0:
            kb = cand
            break
    V = pltpu.VMEM

    if rank5:
        def spec_for(a, kb):
            _, tt, kk, yy, xx = a.shape
            if kk == 1:
                return pl.BlockSpec((1, 1, 1, yy, xx),
                                    (lambda t, b, k: (t, 0, 0, 0, 0)),
                                    memory_space=V)
            if tt == 1:
                return pl.BlockSpec((1, 1, kb, yy, xx),
                                    (lambda t, b, k: (t, 0, k, 0, 0)),
                                    memory_space=V)
            return pl.BlockSpec((1, 1, kb, yy, xx),
                                (lambda t, b, k: (t, b, k, 0, 0)),
                                memory_space=V)

        out_shape = [
            jax.ShapeDtypeStruct((6, T, K, n, W), q.dtype),
            jax.ShapeDtypeStruct((6, T, K, W, n), q.dtype),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, kb, n, W), lambda t, b, k: (t, b, k, 0, 0),
                         memory_space=V),
            pl.BlockSpec((1, 1, kb, W, n), lambda t, b, k: (t, b, k, 0, 0),
                         memory_space=V),
        ]
        grid = (6, T, K // kb)
    else:
        def spec_for(a, kb):
            _, kk, yy, xx = a.shape
            if kk == 1:
                return pl.BlockSpec((1, 1, yy, xx),
                                    (lambda t, k: (t, 0, 0, 0)),
                                    memory_space=V)
            return pl.BlockSpec((1, kb, yy, xx),
                                (lambda t, k: (t, k, 0, 0)),
                                memory_space=V)

        out_shape = [
            jax.ShapeDtypeStruct((6, K, n, W), q.dtype),
            jax.ShapeDtypeStruct((6, K, W, n), q.dtype),
        ]
        out_specs = [
            pl.BlockSpec((1, kb, n, W), lambda t, k: (t, k, 0, 0),
                         memory_space=V),
            pl.BlockSpec((1, kb, W, n), lambda t, k: (t, k, 0, 0),
                         memory_space=V),
        ]
        grid = (6, K // kb)

    kernel = _make_kernel(hord, float(lim_fac), with_mf, rank5=rank5)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_for(a, kb) for a in ins],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # 14 operands x [kb, P, P] blocks exceed the default 16M scoped
            # vmem at kb = 4 (hit by the K+1 = 80 NH height sweep)
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
