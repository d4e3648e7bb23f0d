"""Pallas TPU mega-kernel for the full D-grid shallow-water step (d_sw).

d_sw (sw_core.F90:494) is the acoustic loop's dominant stage: ~90 ms/iter
at C192L79 as an XLA op-graph, of which only ~27 ms is the PPM sweep
arithmetic — the rest is bandwidth-bound glue fusions and edge-override
passes (PERFORMANCE.md round-2 attribution). This kernel runs the WHOLE
d_sw body for one (tile, level-block) face inside a single Pallas program
with every operand VMEM-resident: one HBM read per input, one write per
output, no intermediate round trips.

Numerics: the kernel body calls sw_core.d_sw(in_kernel=True) — the exact
same jnp formulation as the XLA path (iota-select edge handling instead of
strip concats, which Mosaic lowers better; equivalence is pinned by
tests/test_dsw_select_paths.py and tests/test_pallas_dsw.py).

Levels are processed kb=4 per program: Mosaic compile time grows steeply
with the grid trip count (measured: 69 s at grid 6x8 vs >35 min at 6x79,
C192 f32), so K is padded to a multiple of kb and the per-level sponge
damping profiles (dyn_core.F90:675-733) ride along as [kb, 1, 1] VMEM
blocks that broadcast over the [kb, Y, X] fields — the same merged-sponge
array semantics the XLA path uses. Uniform profiles fold to static Python
floats at trace time.

Metric arrays use a k-constant index_map, so Pallas's pipeline revisiting
skips their re-fetch between consecutive level blocks: each metric slab is
read from HBM once per tile, not once per program.
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

# every g.<name> the d_sw body touches (incl. fv_tp_2d / deln_damp_fluxes /
# ke_section / divergence-damping internals)
_METRICS = (
    "cosa_u", "cosa_v", "rsin_u", "rsin_v",
    "sin_sg1", "sin_sg2", "sin_sg3", "sin_sg4",
    "dx", "dy", "rdx", "rdy", "dxa", "dya", "rdxa", "rdya",
    "dxc", "dyc", "area", "rarea", "rarea_c",
    "cosa", "rsina", "sina_u", "sina_v",
    "del6_u", "del6_v", "divg_u", "divg_v",
    "f0", "rsin2", "cosa_s",
)

_PALLAS_DSW = os.environ.get("GFDL_TPU_PALLAS_DSW", "0") != "0"


def use_pallas_dsw(q, edges, dddmp, advection_only, sw_mode):
    """Gate: TPU backend, cube-edge mode, [6, K, P, P] operands, no
    divergence-damping dddmp term (needs a2b_ord4 metrics — falls back),
    full d_sw (not the advection-only / SW-mode reduced paths)."""
    if not (_PALLAS_DSW and edges and q.ndim == 4
            and not advection_only and not sw_mode and dddmp < 1.0e-5):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _classify(p, Kp, dtype):
    """Per-level damping parameter -> ('off', None) | ('static', float) |
    ('prof', [Kp, 1, 1] device array). Uniform [K] profiles fold to
    floats; varying ones ride as per-level-block VMEM values."""
    if p is None:
        return "off", None
    a = np.asarray(p, np.float64)
    if a.ndim == 0:
        return "static", float(a)
    if np.all(a == a.flat[0]):
        return "static", float(a.flat[0])
    prof = np.zeros(Kp)
    prof[:a.size] = a
    return "prof", jnp.asarray(prof, dtype).reshape(Kp, 1, 1)


def d_sw_pallas(delp, pt, w, u, v, uc, vc, ua, va, divg_d, g, *,
                dt, hord_mt, hord_vt, hord_dp, hord_tm, nord, nord_v,
                dddmp, d2_bg, d4_bg, damp_v, d_con=0.0, ke_bg=0.0,
                damp_w=0.0, nord_w=0, hydrostatic=True, lim_fac=1.0,
                nord_mask=None, damp_v2=None, nord_v2=0,
                damp_w2=None, nord_w2=0, interpret=False):
    """Drop-in replacement for sw_core.d_sw on TPU (edges=True path).

    All field inputs [6, K, ., .] padded; returns the same SimpleNamespace
    as d_sw. One Pallas program per (tile, kb-level block)."""
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
              ("v", padk(v)), ("uc", padk(uc)), ("vc", padk(vc)),
              ("ua", padk(ua)), ("va", padk(va))]
    if not hydrostatic:
        fields.append(("w", padk(w)))
    if nord > 0:
        fields.append(("divg_d", padk(divg_d)))

    # ---- per-level damping params: fold uniform profiles to statics ------
    scal = {}
    profs = []
    for name, p in (("d2_bg", d2_bg), ("d_con", d_con),
                    ("damp_v", damp_v), ("damp_v2", damp_v2),
                    ("damp_w", damp_w if not hydrostatic else None),
                    ("damp_w2", damp_w2 if not hydrostatic else None)):
        mode, val = _classify(p, Kp, dtype)
        scal[name] = (mode, val)
        if mode == "prof":
            profs.append((name, val))
    if nord_mask is None:
        scal["nord_mask"] = ("off", None)
    else:
        a = np.asarray(nord_mask, np.float64)
        if np.all(a == 0.0):
            scal["nord_mask"] = ("off", None)
        elif np.all(a != 0.0):
            scal["nord_mask"] = ("static_one", None)
        else:
            scal["nord_mask"] = ("prof", None)
            prof = np.zeros(Kp)
            prof[:a.size] = a
            profs.append(("nord_mask", jnp.asarray(prof, dtype)
                          .reshape(Kp, 1, 1)))

    do_heat = scal["d_con"][0] != "off" and not (
        scal["d_con"][0] == "static" and scal["d_con"][1] <= 1.0e-5)
    if not do_heat:
        scal["d_con"] = ("static", 0.0)

    statics = dict(npx=npx, n=n, dt=float(dt), hord_mt=hord_mt,
                   hord_vt=hord_vt, hord_dp=hord_dp, hord_tm=hord_tm,
                   nord=nord, nord_v=nord_v, d4_bg=float(d4_bg),
                   ke_bg=float(ke_bg), nord_w=nord_w, nord_v2=nord_v2,
                   nord_w2=nord_w2, hydrostatic=hydrostatic,
                   lim_fac=float(lim_fac),
                   da_min=float(g.da_min), da_min_c=float(g.da_min_c))

    # ---- outputs ---------------------------------------------------------
    out_shapes = {
        "u_new": (n + 1, n), "v_new": (n, n + 1),
        "delp_new": (n, n), "pt_new": (n, n),
        "fx": (n, n + 1), "fy": (n + 1, n),
        "crx": (NC, NW), "cry": (NW, NC),
        "xfx": (NC, NW), "yfx": (NW, NC),
    }
    if not hydrostatic:
        out_shapes["w_new"] = (n, n)
    nh_heat = (not hydrostatic) and (
        scal["damp_w"][0] != "off" or scal["damp_w2"][0] != "off")
    if do_heat or nh_heat:
        out_shapes["heat"] = (n, n)
    out_names = list(out_shapes)

    field_names = [nm for nm, _ in fields]
    prof_names = [nm for nm, _ in profs]

    def kernel(*refs):
        nf, nm_, npr = len(field_names), len(_METRICS), len(prof_names)
        fr = dict(zip(field_names, refs[:nf]))
        mr = dict(zip(_METRICS, refs[nf:nf + nm_]))
        pr = dict(zip(prof_names, refs[nf + nm_:nf + nm_ + npr]))
        outs = dict(zip(out_names, refs[nf + nm_ + npr:]))

        sq = lambda r: r[0]             # (1, kb, Y, X) block -> [kb, Y, X]
        sqm = lambda r: r[0, 0]         # metric (1, 1, Y, X) -> [Y, X]
        gg = SimpleNamespace(**{k: sqm(mr[k]) for k in _METRICS})
        gg.npx = statics["npx"]
        gg.n = statics["n"]
        gg.grid_type = 0
        gg.da_min = statics["da_min"]
        gg.da_min_c = statics["da_min_c"]

        def param(name):
            mode, val = scal[name]
            if mode == "off":
                return None
            if mode == "static":
                return val
            if mode == "static_one":
                return jnp.zeros((), sq(fr["delp"]).dtype) + 1.0
            return pr[name][...]        # [kb, 1, 1] per-level block values

        from ..parallel.halo import in_kernel_corners
        with in_kernel_corners():
            ds = sw_core.d_sw(
                sq(fr["delp"]), sq(fr["pt"]),
                sq(fr["w"]) if "w" in fr else None,
                sq(fr["u"]), sq(fr["v"]), sq(fr["uc"]), sq(fr["vc"]),
                sq(fr["ua"]), sq(fr["va"]),
                sq(fr["divg_d"]) if "divg_d" in fr else None,
                gg,
                dt=statics["dt"], hord_mt=statics["hord_mt"],
                hord_vt=statics["hord_vt"], hord_dp=statics["hord_dp"],
                hord_tm=statics["hord_tm"], nord=statics["nord"],
                nord_v=statics["nord_v"], dddmp=0.0,
                d2_bg=param("d2_bg"), d4_bg=statics["d4_bg"],
                damp_v=param("damp_v"), d_con=param("d_con"),
                ke_bg=statics["ke_bg"],
                damp_w=param("damp_w"), nord_w=statics["nord_w"],
                hydrostatic=statics["hydrostatic"], sw_mode=False,
                advection_only=False, lim_fac=statics["lim_fac"],
                nord_mask=param("nord_mask"),
                damp_v2=param("damp_v2"), nord_v2=statics["nord_v2"],
                damp_w2=param("damp_w2"), nord_w2=statics["nord_w2"],
                in_kernel=True)

        for nm2 in out_names:
            outs[nm2][0] = getattr(ds, {"u_new": "u", "v_new": "v",
                                        "delp_new": "delp",
                                        "pt_new": "pt", "w_new": "w",
                                        "heat": "heat_source"}.get(nm2, nm2))

    fspec = lambda a: pl.BlockSpec((1, kb) + a.shape[-2:],
                                   (lambda t, k: (t, k, 0, 0)),
                                   memory_space=pltpu.VMEM)
    mspec = lambda a: pl.BlockSpec((1, 1) + a.shape[-2:],
                                   (lambda t, k: (t, 0, 0, 0)),
                                   memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((kb, 1, 1), (lambda t, k: (k, 0, 0)),
                         memory_space=pltpu.VMEM)

    marrs = [jnp.asarray(getattr(g, nm), dtype) for nm in _METRICS]
    ins = ([a for _, a in fields] + marrs + [a for _, a in profs])
    in_specs = ([fspec(a) for _, a in fields]
                + [mspec(a) for a in marrs]
                + [pspec for _ in profs])
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
    od = {nm2: (a if Kp == K else a[:, :K])
          for nm2, a in zip(out_names, outs)}

    return SimpleNamespace(
        u=od["u_new"], v=od["v_new"], delp=od["delp_new"], pt=od["pt_new"],
        w=od.get("w_new"), fx=od["fx"], fy=od["fy"],
        crx=od["crx"], cry=od["cry"], xfx=od["xfx"], yfx=od["yfx"],
        ra_x=None, ra_y=None, divg_d=None, ke=None,
        heat_source=od.get("heat"))
