"""Pallas TPU kernel for a2b_ord4 (A-grid -> B-grid corner interpolation).

The D-grid pressure-gradient stage runs a2b_ord4 twice per acoustic
iteration on [6, K+1, P, P] interface fields (pk, gz — dyn_core.F90
one_grad_p:1909; four times in the nonhydrostatic nh_p_grad:1697), costing
~27 ms/iter at C192L79 as XLA glue (PERFORMANCE.md round-2 attribution).
One Pallas program computes the full corner-point output for a
(tile, interface-block) face with everything VMEM-resident.

The body is the UNCHANGED ops/a2b_edge.a2b_ord4 jnp formulation — it is
already concat/select based (no .at[].set, no flips), which Mosaic
accepts. Body size ~150 ops: well inside the compile-safe class
(PERFORMANCE.md round-3 post-mortem — small bodies compile in seconds at
any grid; the >2000-op mega-kernels crash the remote compiler at C192).
"""

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 3
KB = 4

_PALLAS_A2B = os.environ.get("GFDL_TPU_PALLAS_A2B", "1") != "0"


def use_pallas_a2b(q, g):
    if not (_PALLAS_A2B and q.ndim == 4
            and getattr(g, "grid_type", 0) < 3
            and getattr(g, "a2b_corner_w", None) is not None):
        return False
    from ..parallel import halo as _halo
    if _halo._IN_KERNEL_CORNERS:       # already inside a kernel body
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def a2b_ord4_pallas(qin, g, interpret=False):
    """qin: [6, KI, P, P] padded cells -> [6, KI, NW, NW] corner values.
    One program per (tile, kb-interface block)."""
    from .a2b_edge import a2b_ord4

    T, KI = qin.shape[:2]
    n = qin.shape[-1] - 2 * H
    NW = n + 1 + 2 * H
    dtype = qin.dtype
    kb = KB if KI > 1 else 1
    Kp = -(-KI // kb) * kb
    if Kp != KI:
        qin_p = jnp.pad(qin, [(0, 0), (0, Kp - KI), (0, 0), (0, 0)])
    else:
        qin_p = qin

    dxa = jnp.asarray(g.dxa, dtype)                      # [6, 1, P, P]
    dya = jnp.asarray(g.dya, dtype)
    cw = jnp.asarray(g.a2b_corner_w, dtype)              # [6, 1, 4, 3]
    # full-width corner-aligned edge factors for the select-based body:
    # value at padded corner index c = edge_x[c_f - 1] for c_f in
    # [2, npx-1], zero elsewhere (c = c_f + 2)
    def _full(nm):
        # [6,1,n+1] -> [6,1,NW] with edge_x[c_f-1] at padded corner index
        # c = c_f + 2 for c_f in [2, npx-1], zero elsewhere (traced-safe)
        e = jnp.asarray(getattr(g, nm), dtype)
        return jnp.pad(e[..., 1:n], ((0, 0), (0, 0), (4, 4)))

    ew_ = _full("edge_w")[:, :, :, None]                 # [6,1,NW,1]
    ee_ = _full("edge_e")[:, :, :, None]
    es_ = _full("edge_s")[:, :, None, :]                 # [6,1,1,NW]
    en_ = _full("edge_n")[:, :, None, :]
    edges = [ew_, ee_, es_, en_]

    from .a2b_edge import _a2b_ord4_sel, a2b_edge_rows

    # the output edge rows/cols + cube-corner values need corner-aligning
    # pads on offset slices, which Mosaic rejects — compute them in XLA
    # (thin row/col arrays) and feed the kernel as inputs
    gg0 = SimpleNamespace(dxa=dxa, dya=dya, a2b_corner_w=cw,
                          edge_w_full=jnp.asarray(_full("edge_w"),
                                                  dtype)[:, :, :, None],
                          edge_e_full=jnp.asarray(_full("edge_e"),
                                                  dtype)[:, :, :, None],
                          edge_s_full=jnp.asarray(_full("edge_s"),
                                                  dtype)[:, :, None, :],
                          edge_n_full=jnp.asarray(_full("edge_n"),
                                                  dtype)[:, :, None, :])
    srow, nrow, wcol, ecol, cvals = a2b_edge_rows(qin_p, gg0)
    # corner values padded to lane width 128 never hurt; keep [.,1,4]

    def kernel(q_ref, dxa_ref, dya_ref, cw_ref, ew_ref, ee_ref, es_ref,
               en_ref, sr_ref, nr_ref, wc_ref, ec_ref, cv_ref, out_ref):
        gg = SimpleNamespace()
        gg.dxa = dxa_ref[0, 0]
        gg.dya = dya_ref[0, 0]
        gg.a2b_corner_w = cw_ref[0, 0]                   # [4, 3]
        gg.edge_w_full = ew_ref[0, 0]                    # [NW, 1]
        gg.edge_e_full = ee_ref[0, 0]
        gg.edge_s_full = es_ref[0, 0]                    # [1, NW]
        gg.edge_n_full = en_ref[0, 0]
        gg.grid_type = 0
        out_ref[0] = _a2b_ord4_sel(q_ref[0], gg, sr_ref[0], nr_ref[0],
                                   wc_ref[0], ec_ref[0], cv_ref[0])

    fspec = pl.BlockSpec((1, kb, qin.shape[-2], qin.shape[-1]),
                         (lambda t, k: (t, k, 0, 0)),
                         memory_space=pltpu.VMEM)
    mspec = lambda a: pl.BlockSpec((1, 1) + a.shape[-2:],
                                   (lambda t, k: (t, 0, 0, 0)),
                                   memory_space=pltpu.VMEM)

    kspec = lambda a: pl.BlockSpec((1, kb) + a.shape[-2:],
                                    (lambda t, k: (t, k, 0, 0)),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(T, Kp // kb),
        in_specs=[fspec, mspec(dxa), mspec(dya), mspec(cw)]
                 + [mspec(e) for e in edges]
                 + [kspec(a) for a in (srow, nrow, wcol, ecol, cvals)],
        out_specs=pl.BlockSpec((1, kb, NW, NW), (lambda t, k: (t, k, 0, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Kp, NW, NW), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qin_p, dxa, dya, cw, *edges, srow, nrow, wcol, ecol, cvals)
    return out if Kp == KI else out[:, :KI]
