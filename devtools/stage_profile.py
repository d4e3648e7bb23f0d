"""Per-stage device-time profiler for the hydrostatic acoustic body at the
headline shape (C192L79). Each stage is wrapped in a lax.fori_loop whose
carry feeds a zero-scaled perturbation back into the inputs, forcing the
device to execute N serialized iterations inside ONE executable — robust
against the axon-tunnel wall-clock issues noted in PERFORMANCE.md.

Usage: python devtools/stage_profile.py [N_ITERS]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import (
    DynConfig, geopk, p_grad_c, one_grad_p, mix_dp, ray_fast,
    ray_fast_profile, _sponge_level_params, H, fi)
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core
import gfdl_atmos_cubed_sphere_tpu.constants as con


def timed(name, fn, *args, n=None):
    """fn(*args) -> pytree; run n serialized reps inside one jit."""
    n = n or N
    def rep(args):
        def body(i, acc):
            eps = (acc * 0.0).astype(args[0].dtype)
            pert = [a + eps if jnp.issubdtype(a.dtype, jnp.floating) else a
                    for a in args]
            out = fn(*pert)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return acc + sum(jnp.sum(l[..., :1, :1]).astype(jnp.float32)
                             for l in leaves)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    f = jax.jit(rep)
    r = f(args); r.block_until_ready()
    t0 = time.perf_counter()
    r = f(args); r.block_until_ready()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.3f} ms/call")
    return dt


N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
npx, npz, dtt, n_split = 193, 79, 450.0, 6
g = build_grid_ops(npx, dtype=jnp.float32)
ks, ptop, ak, bk = set_eta(npz)
ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True, moist=True)
prepare_phis(g, ic["phis"])
cfg = DynConfig(npx=npx, npz=npz, dt=dtt, n_split=n_split, adiabatic=False)
akap = con.KAPPA
halo = g.halo
n = g.n
f = fi
ctr = slice(H, H + n)
wsl = slice(f(1), f(npx) + 1)
dt = dtt / n_split
dt2 = 0.5 * dt
ptk = ptop ** akap
phis_p = g.phis_p
pl = _sponge_level_params(cfg)
dpmin = 0.01 * (np.diff(np.asarray(ak, np.float64))
                + np.diff(np.asarray(bk, np.float64)) * 1.e5)
rfp = (ray_fast_profile(ak, bk, abs(dt), cfg.tau, cfg.rf_cutoff, ptop)
       if cfg.rf_fast and cfg.tau > 0.0 else None)

delp = jnp.asarray(ic["delp"], jnp.float32)
pt = jnp.asarray(ic["pt"], jnp.float32)
u = jnp.asarray(ic["u"], jnp.float32)
v = jnp.asarray(ic["v"], jnp.float32)

print(f"shape: tiles=6 K={npz} n={n}  iters/stage={N}  "
      f"backend={jax.default_backend()}")

# --- stage inputs (computed once, on device) ---
@jax.jit
def mk_inputs(delp, pt, u, v):
    u, v = halo.reconcile_dgrid(u, v)
    delp_p = halo.pad_cell(delp)
    pt_p = halo.pad_cell(pt)
    u_p, v_p = halo.pad_dgrid(u, v)
    cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, dt2,
                      hydrostatic=True, nord=cfg.nord, sw_mode=False)
    _, _, pkc, gzc, _ = geopk(cs.delpc, cs.ptc, phis_p, akap, ptop)
    uc, vc = p_grad_c(cs.uc, cs.vc, cs.delpc, pkc, gzc, g, dt2, npx)
    uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr])
    divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl])
    return (delp_p, pt_p, u_p, v_p, cs.delpc, cs.ptc, cs.uc, cs.vc,
            cs.ua, cs.va, cs.divg_d, pkc, gzc, uc, vc, uc_p, vc_p, divg_p)

(delp_p, pt_p, u_p, v_p, delpc, ptc, csuc, csvc, ua, va, divg_d,
 pkc, gzc, uc, vc, uc_p, vc_p, divg_p) = [
    x.block_until_ready() for x in mk_inputs(delp, pt, u, v)]


def dsw_stage(delp_p, pt_p, u_p, v_p, uc_p, vc_p, ua, va, divg_p):
    return sw_core.d_sw(
        delp_p, pt_p, None, u_p, v_p, uc_p, vc_p, ua, va, divg_p, g,
        dt=dt, hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
        hord_dp=cfg.hord_dp, hord_tm=cfg.hord_tm,
        dddmp=cfg.dddmp, d4_bg=cfg.d4_bg,
        hydrostatic=True, sw_mode=False, lim_fac=cfg.lim_fac,
        **{k: pl[k] for k in ("nord", "nord_v", "d2_bg", "d_con",
                              "nord_mask", "damp_v", "damp_v2", "nord_v2")})

def dsw_tuple(*a):
    r = dsw_stage(*a)
    return (r.delp, r.pt, r.u, r.v, r.fx, r.fy, r.crx, r.cry, r.xfx, r.yfx)

ds_t = jax.jit(dsw_tuple)(delp_p, pt_p, u_p, v_p, uc_p, vc_p, ua, va, divg_p)
ds_t = [x.block_until_ready() for x in ds_t]
from types import SimpleNamespace
ds = SimpleNamespace(delp=ds_t[0], pt=ds_t[1], u=ds_t[2], v=ds_t[3])


def full_body(delp, pt, u, v):
    u, v = halo.reconcile_dgrid(u, v)
    delp_p = halo.pad_cell(delp)
    pt_p = halo.pad_cell(pt)
    u_p, v_p = halo.pad_dgrid(u, v)
    cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, dt2,
                      hydrostatic=True, nord=cfg.nord, sw_mode=False)
    _, _, pkc, gzc, _ = geopk(cs.delpc, cs.ptc, phis_p, akap, ptop)
    uc, vc = p_grad_c(cs.uc, cs.vc, cs.delpc, pkc, gzc, g, dt2, npx)
    uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr])
    divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl])
    dsr = dsw_stage(delp_p, pt_p, u_p, v_p, uc_p, vc_p, ua, va, divg_p)
    delp2, pt2 = dsr.delp, dsr.pt
    if cfg.fill_dp:
        delp2, pt2, _ = mix_dp(delp2, pt2, None, dpmin, hydrostatic=True)
    delp_p2 = halo.pad_cell(delp2)
    pt_p2 = halo.pad_cell(pt2)
    _, _, pk, gz, _ = geopk(delp_p2, pt_p2, phis_p, akap, ptop)
    u2, v2 = one_grad_p(dsr.u, dsr.v, pk, gz, g, dt, npx, ptk)
    if rfp is not None:
        u2, v2, _ = ray_fast(u2, v2, None, *rfp)
    return delp2, pt2, u2, v2


t_pad = timed("halo.pad_cell x2 + pad_dgrid", lambda a, b, c, d: (
    halo.pad_cell(a), halo.pad_cell(b), halo.pad_dgrid(c, d)),
    delp, pt, u, v)
t_rec = timed("reconcile_dgrid", lambda a, b: halo.reconcile_dgrid(a, b),
              u, v)
def csw_tuple(a, b, c, d):
    r = sw_core.c_sw(a, b, None, c, d, g, dt2, hydrostatic=True,
                     nord=cfg.nord, sw_mode=False)
    return (r.delpc, r.ptc, r.uc, r.vc, r.ua, r.va, r.divg_d)

t_csw = timed("c_sw", csw_tuple, delp_p, pt_p, u_p, v_p)
t_geo = timed("geopk(C)", lambda a, b: geopk(a, b, phis_p, akap, ptop),
              delpc, ptc)
t_pgc = timed("p_grad_c + pad_cgrid + pad_corner",
              lambda a, b, c, d, e, dd: (
                  halo.pad_cgrid(*[w[..., ctr, wsl] if i == 0 else
                                   w[..., wsl, ctr] for i, w in
                                   enumerate(p_grad_c(a, b, c, d, e, g,
                                                      dt2, npx))]),
                  halo.pad_corner(dd[..., wsl, wsl])),
              csuc, csvc, delpc, pkc, gzc, divg_d)
t_dsw = timed("d_sw (merged full-K)", dsw_tuple,
              delp_p, pt_p, u_p, v_p, uc_p, vc_p, ua, va, divg_p)
t_mix = (timed("mix_dp", lambda a, b: mix_dp(a, b, None, dpmin,
                                             hydrostatic=True),
               ds.delp, ds.pt) if cfg.fill_dp else 0.0)
t_gd = timed("geopk(D) + pads", lambda a, b: geopk(
    halo.pad_cell(a), halo.pad_cell(b), phis_p, akap, ptop), ds.delp, ds.pt)
pk_p = jax.jit(lambda a, b: geopk(halo.pad_cell(a), halo.pad_cell(b),
                                  phis_p, akap, ptop))(ds.delp, ds.pt)
pk_, gz_ = pk_p[2].block_until_ready(), pk_p[3].block_until_ready()
t_ogp = timed("one_grad_p", lambda a, b, c, d: one_grad_p(
    a, b, c, d, g, dt, npx, ptk), ds.u, ds.v, pk_, gz_)

tot = t_pad + t_rec + t_csw + t_geo + t_pgc + t_dsw + t_mix + t_gd + t_ogp
print(f"{'SUM of stages':34s} {tot:8.3f} ms")
t_full = timed("FULL acoustic body", full_body, delp, pt, u, v)
print(f"{'fusion-across-stages gain':34s} {tot - t_full:8.3f} ms")
