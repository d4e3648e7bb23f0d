"""Pallas TPU kernels for the D-grid shallow-water step (d_sw), split in two.

d_sw (sw_core.F90:494) is the acoustic loop's dominant stage (~92 ms/iter
at C192L79 as an XLA op-graph). A single whole-body kernel exceeds the
remote-compile service's module-size cap (HTTP 413 — PERFORMANCE.md round
3), so the step runs as TWO compile-sized kernels along sw_core.d_sw's
natural seam (the `stage` parameter):

  1. fluxes: contravariant winds + edge/corner solve + courant/area
     fluxes + the delp/pt(/w) PPM transports (sw_core.F90:695-1062);
  2. winds: KE stage, relative vorticity, divergence/vorticity damping,
     vorticity transport, wind update, dissipative heating
     (sw_core.F90:1063-1529).

Each kernel processes a (tile, kb-level block) face with every operand
VMEM-resident; the ~10 intermediate arrays between the stages take one
HBM round trip (~1 ms/iter at C192L79). Kernel bodies are the UNCHANGED
sw_core jnp formulations with in_kernel=True select paths; equivalence is
pinned by tests/test_pallas_dsw.py (interpret, f64, 1e-10).

Per-level sponge damping profiles (dyn_core.F90:675-733) ride as
[kb, 1, 1] VMEM blocks broadcasting over the [kb, Y, X] fields — the same
merged-sponge array semantics as the XLA path; uniform profiles fold to
static Python floats. Metric arrays use k-constant index maps (fetched
once per tile via pipeline revisiting) and MUST be jit arguments at the
call site, not captured constants (grid_ops.split_metrics) — embedded
metric constants overflow the compile service.
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
KB = int(os.environ.get("GFDL_TPU_DSW_KB", "4"))   # levels per program

_METRICS_FLUX = (
    "cosa_u", "cosa_v", "rsin_u", "rsin_v",
    "sin_sg1", "sin_sg2", "sin_sg3", "sin_sg4",
    "dx", "dy", "rdxa", "rdya", "dxa", "dya",
    "area", "rarea", "del6_u", "del6_v",
)
_METRICS_WIND = (
    "cosa_u", "cosa_v", "sina_u", "sina_v",
    "sin_sg1", "sin_sg2", "sin_sg3", "sin_sg4",
    "dx", "dy", "rdx", "rdy", "dxa", "dya", "dxc", "dyc",
    "area", "rarea", "rarea_c", "cosa", "rsina",
    "del6_u", "del6_v", "divg_u", "divg_v",
    "f0", "rsin2", "cosa_s",
)

_PALLAS_DSW = os.environ.get("GFDL_TPU_PALLAS_DSW", "1") != "0"


def use_pallas_dsw(q, edges, dddmp, advection_only, sw_mode):
    """Gate: TPU backend, cube-edge mode, [6, K, P, P] operands, full d_sw
    (not the advection-only / SW-mode reduced paths). The Smagorinsky
    dddmp term is supported: its a2b_ord4(vorticity) operand is computed
    outside the winds kernel and fed in (sw_core.F90:1466-1473)."""
    del dddmp
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
    ok = (_PALLAS_DSW and edges and q.ndim == 4
          and not advection_only and not sw_mode)
    if on_tpu and _PALLAS_DSW and not ok:
        import warnings
        warnings.warn(
            "pallas d_sw falling back to the XLA path "
            f"(edges={edges}, ndim={q.ndim}, advection_only="
            f"{advection_only}, sw_mode={sw_mode})", stacklevel=2)
    return ok and on_tpu


def _classify(p, Kp, dtype):
    """Per-level damping parameter -> ('off', None) | ('static', float) |
    ('prof', [Kp, 1, 1] device array)."""
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


def _run_stage(stage_name, fields, metric_names, profs, out_shapes, g,
               body, T, Kp, kb, dtype, interpret):
    """Shared two-level pallas_call builder: fields [6, Kp, ., .] blocks,
    metrics [6, 1, ., .] k-constant, profiles [Kp, 1, 1] per-block."""
    field_names = [nm for nm, _ in fields]
    prof_names = [nm for nm, _ in profs]
    out_names = list(out_shapes)
    marrs = [jnp.asarray(getattr(g, nm), dtype) for nm in metric_names]

    def kernel(*refs):
        nf, nm_, npr = len(field_names), len(metric_names), len(prof_names)
        fr = dict(zip(field_names, refs[:nf]))
        mr = dict(zip(metric_names, refs[nf:nf + nm_]))
        pr = dict(zip(prof_names, refs[nf + nm_:nf + nm_ + npr]))
        outs = dict(zip(out_names, refs[nf + nm_ + npr:]))
        gg = SimpleNamespace(**{k: mr[k][0, 0] for k in metric_names})
        gg.npx = g.npx
        gg.n = g.n
        gg.grid_type = 0
        gg.da_min = float(g.da_min)
        gg.da_min_c = float(g.da_min_c)
        res = body({k: r[0] for k, r in fr.items()},
                   {k: r[...] for k, r in pr.items()}, gg)
        for nm2 in out_names:
            outs[nm2][0] = res[nm2]

    fspec = lambda a: pl.BlockSpec((1, kb) + a.shape[-2:],
                                   (lambda t, k: (t, k, 0, 0)),
                                   memory_space=pltpu.VMEM)
    mspec = lambda a: pl.BlockSpec((1, 1) + a.shape[-2:],
                                   (lambda t, k: (t, 0, 0, 0)),
                                   memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((kb, 1, 1), (lambda t, k: (k, 0, 0)),
                         memory_space=pltpu.VMEM)
    ins = [a for _, a in fields] + marrs + [a for _, a in profs]
    in_specs = ([fspec(a) for _, a in fields]
                + [mspec(a) for a in marrs] + [pspec for _ in profs])
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
    return dict(zip(out_names, outs))


def d_sw_pallas(delp, pt, w, u, v, uc, vc, ua, va, divg_d, g, *,
                dt, hord_mt, hord_vt, hord_dp, hord_tm, nord, nord_v,
                dddmp, d2_bg, d4_bg, damp_v, d_con=0.0, ke_bg=0.0,
                damp_w=0.0, nord_w=0, hydrostatic=True, lim_fac=1.0,
                nord_mask=None, damp_v2=None, nord_v2=0,
                damp_w2=None, nord_w2=0, interpret=False):
    """Drop-in replacement for sw_core.d_sw on TPU (edges=True path).

    All field inputs [6, K, ., .] padded; returns the same SimpleNamespace
    as d_sw. Two Pallas kernels per call (fluxes, winds), kb levels per
    program."""
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

    # ---- per-level damping params ----------------------------------------
    scal = {}
    all_profs = {}
    for name, p in (("d2_bg", d2_bg), ("d_con", d_con),
                    ("damp_v", damp_v), ("damp_v2", damp_v2),
                    ("damp_w", damp_w if not hydrostatic else None),
                    ("damp_w2", damp_w2 if not hydrostatic else None)):
        mode, val = _classify(p, Kp, dtype)
        scal[name] = (mode, val)
        if mode == "prof":
            all_profs[name] = val
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
            all_profs["nord_mask"] = jnp.asarray(prof, dtype).reshape(Kp, 1, 1)

    do_heat = scal["d_con"][0] != "off" and not (
        scal["d_con"][0] == "static" and scal["d_con"][1] <= 1.0e-5)
    if not do_heat:
        scal["d_con"] = ("static", 0.0)
    nh_heat = (not hydrostatic) and (
        scal["damp_w"][0] != "off" or scal["damp_w2"][0] != "off")

    def param(name, pr, ref_dtype_arr):
        mode, val = scal[name]
        if mode == "off":
            return None
        if mode == "static":
            return val
        if mode == "static_one":
            return jnp.zeros((), ref_dtype_arr.dtype) + 1.0
        return pr[name]

    base_kw = dict(dt=float(dt), hord_mt=hord_mt, hord_vt=hord_vt,
                   hord_dp=hord_dp, hord_tm=hord_tm, nord=nord,
                   nord_v=nord_v, dddmp=0.0, d4_bg=float(d4_bg),
                   ke_bg=float(ke_bg), nord_w=nord_w, nord_v2=nord_v2,
                   nord_w2=nord_w2, hydrostatic=hydrostatic, sw_mode=False,
                   advection_only=False, lim_fac=float(lim_fac),
                   in_kernel=True)

    from ..parallel.halo import in_kernel_corners

    # ================= kernel 1: fluxes + transport =======================
    flux_fields = [("delp", padk(delp)), ("pt", padk(pt)),
                   ("uc", padk(uc)), ("vc", padk(vc))]
    if not hydrostatic:
        flux_fields.append(("w", padk(w)))
    flux_profs = [(nm, all_profs[nm]) for nm in
                  ("damp_v", "damp_v2", "damp_w", "damp_w2")
                  if nm in all_profs]
    flux_out = {
        "delp_new": (n, n), "pt_new": (n, n),
        "fx": (n, n + 1), "fy": (n + 1, n),
        "crx": (NC, NW), "cry": (NW, NC),
        "xfx": (NC, NW), "yfx": (NW, NC),
        "ra_x": (NC, NC), "ra_y": (NC, NC),
        "ut": (NC, NW), "vt": (NW, NC),
    }
    if not hydrostatic:
        flux_out["w_new"] = (n, n)
    if nh_heat:
        flux_out["heat"] = (n, n)

    def flux_body(fr, pr, gg):
        with in_kernel_corners():
            ds = sw_core.d_sw(
                fr["delp"], fr["pt"], fr.get("w"), None, None,
                fr["uc"], fr["vc"], None, None, None, gg,
                d2_bg=0.0, d_con=0.0, nord_mask=None,
                damp_v=param("damp_v", pr, fr["delp"]),
                damp_v2=param("damp_v2", pr, fr["delp"]),
                damp_w=param("damp_w", pr, fr["delp"]),
                damp_w2=param("damp_w2", pr, fr["delp"]),
                stage="fluxes", **base_kw)
        out = dict(delp_new=ds.delp, pt_new=ds.pt, fx=ds.fx, fy=ds.fy,
                   crx=ds.crx, cry=ds.cry, xfx=ds.xfx, yfx=ds.yfx,
                   ra_x=ds.ra_x, ra_y=ds.ra_y, ut=ds.ut, vt=ds.vt)
        if not hydrostatic:
            out["w_new"] = ds.w
        if nh_heat:
            out["heat"] = ds.heat_source
        return out

    f_out = _run_stage("fluxes", flux_fields, _METRICS_FLUX, flux_profs,
                       flux_out, g, flux_body, T, Kp, kb, dtype, interpret)

    # ================= kernel 2: KE / vorticity / winds ===================
    wind_fields = [("delp", padk(delp)), ("u", padk(u)), ("v", padk(v)),
                   ("uc", padk(uc)), ("vc", padk(vc)),
                   ("ua", padk(ua)), ("va", padk(va)),
                   ("crx", f_out["crx"]), ("cry", f_out["cry"]),
                   ("xfx", f_out["xfx"]), ("yfx", f_out["yfx"]),
                   ("ra_x", f_out["ra_x"]), ("ra_y", f_out["ra_y"]),
                   ("ut", f_out["ut"]), ("vt", f_out["vt"])]
    if nord > 0:
        wind_fields.append(("divg_d", padk(divg_d)))
    if nord > 0 and dddmp >= 1.0e-5:
        # Smagorinsky-modulated damping (sw_core.F90:1466-1473): the
        # B-grid |vorticity| operand needs a2b_ord4's edge-row assembly,
        # which cannot live inside the winds kernel body — compute the
        # cell-mean relative vorticity and its corner interpolation
        # outside (the a2b itself goes through ops/pallas_a2b.py)
        from .a2b_edge import a2b_ord4
        vt_w = u * jnp.asarray(g.dx, dtype)
        ut_w = v * jnp.asarray(g.dy, dtype)
        wk_pre = jnp.asarray(g.rarea, dtype) * (
            vt_w[..., :-1, :] - vt_w[..., 1:, :]
            - ut_w[..., :, :-1] + ut_w[..., :, 1:])
        wind_fields.append(("vortS", padk(a2b_ord4(wk_pre, g))))
    if nh_heat:
        wind_fields.append(("heat_w", f_out["heat"]))
    wind_profs = [(nm, all_profs[nm]) for nm in
                  ("d2_bg", "d_con", "damp_v", "damp_v2", "nord_mask")
                  if nm in all_profs]
    wind_out = {"u_new": (n + 1, n), "v_new": (n, n + 1)}
    if do_heat or nh_heat:
        wind_out["heat"] = (n, n)

    def wind_body(fr, pr, gg):
        pre = dict(crx=fr["crx"], cry=fr["cry"], xfx=fr["xfx"],
                   yfx=fr["yfx"], ra_x=fr["ra_x"], ra_y=fr["ra_y"],
                   ut=fr["ut"], vt=fr["vt"],
                   fx=jnp.zeros((1, 1), fr["delp"].dtype),
                   fy=jnp.zeros((1, 1), fr["delp"].dtype),
                   delp_new=None, pt_new=None, w_new=None,
                   heat_source=fr.get("heat_w"), vortS=fr.get("vortS"))
        wind_kw = dict(base_kw, dddmp=float(dddmp))
        with in_kernel_corners():
            ds = sw_core.d_sw(
                fr["delp"], None, None, fr["u"], fr["v"],
                fr["uc"], fr["vc"], fr["ua"], fr["va"],
                fr.get("divg_d"), gg,
                d2_bg=param("d2_bg", pr, fr["delp"]),
                d_con=param("d_con", pr, fr["delp"]),
                nord_mask=param("nord_mask", pr, fr["delp"]),
                damp_v=param("damp_v", pr, fr["delp"]),
                damp_v2=param("damp_v2", pr, fr["delp"]),
                damp_w=None, damp_w2=None,
                stage="winds", pre=pre, **wind_kw)
        out = dict(u_new=ds.u, v_new=ds.v)
        if do_heat or nh_heat:
            out["heat"] = ds.heat_source
        return out

    w_out = _run_stage("winds", wind_fields, _METRICS_WIND, wind_profs,
                       wind_out, g, wind_body, T, Kp, kb, dtype, interpret)

    unpad = lambda a: (a if (a is None or Kp == K) else a[:, :K])
    return SimpleNamespace(
        u=unpad(w_out["u_new"]), v=unpad(w_out["v_new"]),
        delp=unpad(f_out["delp_new"]), pt=unpad(f_out["pt_new"]),
        w=unpad(f_out.get("w_new")),
        fx=unpad(f_out["fx"]), fy=unpad(f_out["fy"]),
        crx=unpad(f_out["crx"]), cry=unpad(f_out["cry"]),
        xfx=unpad(f_out["xfx"]), yfx=unpad(f_out["yfx"]),
        ra_x=unpad(f_out["ra_x"]), ra_y=unpad(f_out["ra_y"]),
        divg_d=None, ke=None,
        heat_source=unpad(w_out.get("heat")))
