"""Pallas TPU column kernels: fused vertical-integration passes.

geopk (dyn_core.F90 geopk:2202) is executed 2x per acoustic iteration
(13x per big step): pe/peln/pk/gz/pkz from delp/pt. As XLA ops this is
~8 bandwidth passes (two cumsums, log, exp, divides) over [6,K,Y,X];
here one kernel per (tile, y-strip) holds the whole column in VMEM and
writes every output in a single HBM round trip. Vertical prefix sums use
log-step shifted adds (7 passes for K<=128) rather than a sequential
k loop — the k axis is the major dim of the block, so the shifts are
free-striding VMEM copies.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gfdl_atmos_cubed_sphere_tpu.constants as con

# Default OFF: the fused kernel is 1.5x faster than geopk in ISOLATION
# (3.0 vs 4.5 ms at C192L79) but made the full step 13% SLOWER (1.376 vs
# 1.213 s/step) — XLA fuses geopk's elementwise tail into its consumers
# (p_grad_c, one_grad_p terms), and the opaque custom-call forces all 5
# outputs plus their consumers through HBM. Mega-kernels only pay when
# they swallow the consumers too. Enable with GFDL_TPU_PALLAS_COL=1.
_PALLAS_COL = os.environ.get("GFDL_TPU_PALLAS_COL", "0") != "0"


def _cumsum_k(x):
    """Inclusive prefix sum along axis 0 via log-step shifted adds."""
    K = x.shape[0]
    s = 1
    while s < K:
        pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-s]], axis=0)
        s *= 2
    return x


def _rcumsum_k(x):
    """Reverse (suffix) prefix sum along axis 0."""
    K = x.shape[0]
    s = 1
    while s < K:
        pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([x[s:], pad], axis=0)
        s *= 2
    return x


def _geopk_kernel(akap, ptop, delp_ref, pt_ref, phis_ref,
                  pe_ref, peln_ref, pk_ref, gz_ref, pkz_ref):
    delp = delp_ref[0]                     # [K, by, X]
    pt = pt_ref[0]
    phis = phis_ref[0, 0]                  # [by, X]

    pe_b = ptop + _cumsum_k(delp)          # interfaces 1..K
    pe = jnp.concatenate(
        [jnp.full_like(pe_b[:1], ptop), pe_b], axis=0)   # [K+1, by, X]
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    dpk = pk[1:] - pk[:-1]
    incr = con.CP_AIR * pt * dpk
    gz_above = _rcumsum_k(incr)
    gz = jnp.concatenate([gz_above, jnp.zeros_like(gz_above[:1])],
                         axis=0) + phis[None]
    pkz = dpk / (akap * (peln[1:] - peln[:-1]))

    pe_ref[0] = pe
    peln_ref[0] = peln
    pk_ref[0] = pk
    gz_ref[0] = gz
    pkz_ref[0] = pkz


def geopk_pallas(delp_p, pt_p, phis_p, akap, ptop):
    """Fused geopk: same contract as model.dyn_core.geopk. delp_p/pt_p
    [6, K, Y, X]; phis_p [6, Y, X] or [6, 1, Y, X]."""
    T, K, Y, X = delp_p.shape
    if phis_p.ndim == 3:
        phis_p = phis_p[:, None]
    # Mosaic requires the second-minor block dim divisible by 8: pad the
    # y extent up and slice the outputs back (the slices fuse into the
    # consumers; the pad is 2 small concats vs ~8 full passes saved)
    Y0 = Y
    if Y % 8:
        Yp = (Y + 7) // 8 * 8
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:2] + (Yp - Y, X), a.dtype)], axis=2)
        delp_p = zpad(delp_p)
        pt_p = zpad(pt_p)
        phis_p = zpad(phis_p)
        Y = Yp
    by = 8

    V = pltpu.VMEM
    cell = pl.BlockSpec((1, K, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    face = pl.BlockSpec((1, K + 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    surf = pl.BlockSpec((1, 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    out_shape = [
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # pe
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # peln
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # pk
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # gz
        jax.ShapeDtypeStruct((T, K, Y, X), delp_p.dtype),      # pkz
    ]
    out_specs = [face, face, face, face, cell]
    kernel = functools.partial(_geopk_kernel, float(akap), float(ptop))
    outs = pl.pallas_call(
        kernel,
        grid=(T, Y // by),
        in_specs=[cell, cell, surf],
        out_specs=out_specs,
        out_shape=out_shape,
    )(delp_p, pt_p, phis_p)
    if Y != Y0:
        outs = tuple(o[:, :, :Y0] for o in outs)
    return outs


def use_pallas_col(a):
    if not (_PALLAS_COL and a.ndim == 4):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
