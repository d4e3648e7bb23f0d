"""Pallas TPU mega-kernel for the C-grid half-step (c_sw).

c_sw (sw_core.F90:79) is ~23% of the acoustic iteration as an XLA op-graph
(43 ms/iter at C192L79, PERFORMANCE.md round-2 attribution), dominated by
edge-override DUS passes and small glue fusions around d2a2c_vect. One
Pallas program runs the whole half-step for a (tile, level) face in VMEM.

The kernel body calls sw_core.c_sw(in_kernel=True): the identical jnp
formulation with iota-masked selects for the edge/corner overrides (current
Pallas TPU lowers static-slice .at[].set to scatter and jnp.flip to an
unimplemented `rev`). Equivalence vs the XLA path is pinned by
tests/test_pallas_csw.py (interpret mode, f64, 1e-12).

Levels run kb=4 per program (K padded up): Mosaic compile time grows
steeply with grid trip count (see ops/pallas_dsw.py).
"""

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sw_core

H = 3
KB = 4          # levels per program

_METRICS = (
    "cosa_s", "rsin2", "dxa", "dya",
    "sin_sg1", "sin_sg2", "sin_sg3", "sin_sg4",
    "cos_sg1", "cos_sg2", "cos_sg3", "cos_sg4",
    "cosa_u", "rsin_u", "cosa_v", "rsin_v", "sina_u", "sina_v",
    "dx", "dy", "dxc", "dyc", "rdxc", "rdyc",
    "rarea", "rarea_c", "fC",
)

_PALLAS_CSW = os.environ.get("GFDL_TPU_PALLAS_CSW", "1") != "0"


def use_pallas_csw(q, edges, sw_mode):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
    ok = _PALLAS_CSW and edges and q.ndim == 4 and not sw_mode
    if on_tpu and _PALLAS_CSW and not ok:
        import warnings
        warnings.warn("pallas c_sw falling back to the XLA path "
                      f"(edges={edges}, ndim={q.ndim}, sw_mode={sw_mode})",
                      stacklevel=2)
    return ok and on_tpu


def c_sw_pallas(delp, pt, w, u, v, g, dt2, hydrostatic=True, nord=0,
                interpret=False):
    """Drop-in replacement for sw_core.c_sw on TPU (edges, sw_mode=False)."""
    T, K = delp.shape[:2]
    n = g.n
    npx = g.npx
    dtype = delp.dtype
    NC = n + 2 * H
    NW = n + 1 + 2 * H
    kb = KB if K > 1 else 1
    Kp = -(-K // kb) * kb

    def padk(a):
        if a is None or Kp == K:
            return a
        return jnp.pad(a, [(0, 0), (0, Kp - K)] + [(0, 0)] * (a.ndim - 2))

    fields = [("delp", padk(delp)), ("pt", padk(pt)), ("u", padk(u)),
              ("v", padk(v))]
    if not hydrostatic:
        fields.append(("w", padk(w)))
    field_names = [nm for nm, _ in fields]

    out_shapes = {
        "delpc": (NC, NC), "ptc": (NC, NC),
        "uc": (NC, NW), "vc": (NW, NC),
        "ua": (NC, NC), "va": (NC, NC),
        "ut": (NC, NW), "vt": (NW, NC),
    }
    if not hydrostatic:
        out_shapes["wc"] = (NC, NC)
    if nord > 0:
        out_shapes["divg_d"] = (NW, NW)
    out_names = list(out_shapes)

    statics = dict(npx=npx, n=n, dt2=float(dt2), nord=nord,
                   hydrostatic=hydrostatic)

    def kernel(*refs):
        nf, nm = len(field_names), len(_METRICS)
        fr = dict(zip(field_names, refs[:nf]))
        mr = dict(zip(_METRICS, refs[nf:nf + nm]))
        outs = dict(zip(out_names, refs[nf + nm:]))
        sq = lambda r: r[0]
        gg = SimpleNamespace(**{k: mr[k][0, 0] for k in _METRICS})
        gg.npx = statics["npx"]
        gg.n = statics["n"]
        gg.grid_type = 0

        from ..parallel.halo import in_kernel_corners
        with in_kernel_corners():
            cs = sw_core.c_sw(
                sq(fr["delp"]), sq(fr["pt"]),
                sq(fr["w"]) if "w" in fr else None,
                sq(fr["u"]), sq(fr["v"]), gg, statics["dt2"],
                hydrostatic=statics["hydrostatic"], nord=statics["nord"],
                sw_mode=False, in_kernel=True)
        for nm_ in out_names:
            outs[nm_][0] = getattr(cs, nm_)

    fspec = lambda a: pl.BlockSpec((1, kb) + a.shape[-2:],
                                   (lambda t, k: (t, k, 0, 0)),
                                   memory_space=pltpu.VMEM)
    mspec = lambda a: pl.BlockSpec((1, 1) + a.shape[-2:],
                                   (lambda t, k: (t, 0, 0, 0)),
                                   memory_space=pltpu.VMEM)
    marrs = [jnp.asarray(getattr(g, nm), dtype) for nm in _METRICS]
    ins = [a for _, a in fields] + marrs
    in_specs = [fspec(a) for _, a in fields] + [mspec(a) for a in marrs]
    out_specs = [pl.BlockSpec((1, kb) + out_shapes[nm],
                              (lambda t, k: (t, k, 0, 0)),
                              memory_space=pltpu.VMEM)
                 for nm in out_names]
    out_shape = [jax.ShapeDtypeStruct((T, Kp) + out_shapes[nm], dtype)
                 for nm in out_names]

    outs = pl.pallas_call(
        kernel,
        grid=(T, Kp // kb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    od = {nm: (a if Kp == K else a[:, :K]) for nm, a in zip(out_names, outs)}
    return SimpleNamespace(
        delpc=od["delpc"], ptc=od["ptc"], wc=od.get("wc"),
        uc=od["uc"], vc=od["vc"], ua=od["ua"], va=od["va"],
        divg_d=od.get("divg_d"), ut=od["ut"], vt=od["vt"])
