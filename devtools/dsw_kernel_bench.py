"""Isolated timing of the d_sw Pallas kernels at the headline shape.

Usage: python devtools/dsw_kernel_bench.py [reps]
Env: GFDL_TPU_DSW_KB (levels/program), GFDL_TPU_DSW_SEM
     (arbitrary|parallel dimension semantics probe).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (build_grid_ops,
                                                        split_metrics,
                                                        merge_metrics)
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import (
    DynConfig, geopk, p_grad_c, _sponge_level_params, H)
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core, pallas_dsw
from gfdl_atmos_cubed_sphere_tpu.ops.fill_corners import fi
import gfdl_atmos_cubed_sphere_tpu.constants as con

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
npx, npz = 193, 79
g = build_grid_ops(npx, dtype=jnp.float32)
ks, ptop, ak, bk = set_eta(npz)
ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
prepare_phis(g, ic["phis"])
cfg = DynConfig(npx=npx, npz=npz, dt=450.0, n_split=6, adiabatic=False)
pl_ = _sponge_level_params(cfg)
akap = con.KAPPA
dt = 450.0 / 6
dt2 = 0.5 * dt
f = fi
n = g.n
ctr = slice(H, H + n)
wsl = slice(f(1), f(npx) + 1)

delp = jnp.asarray(ic["delp"], jnp.float32)
ptv = jnp.asarray(ic["pt"], jnp.float32)
u = jnp.asarray(ic["u"], jnp.float32)
v = jnp.asarray(ic["v"], jnp.float32)

halo = g.halo
delp_p = halo.pad_cell(delp)
pt_p = halo.pad_cell(ptv)
u_p, v_p = halo.pad_dgrid(u, v)
cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, dt2, hydrostatic=True,
                  nord=cfg.nord, sw_mode=False)
_, _, pkc, gzc, _ = geopk(cs.delpc, cs.ptc, g.phis_p, akap, ptop)
uc, vc = p_grad_c(cs.uc, cs.vc, cs.delpc, pkc, gzc, g, dt2, npx)
uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr])
divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl])
ins = [jax.device_put(x) for x in
       (delp_p, pt_p, u_p, v_p, uc_p, vc_p, cs.ua, cs.va, divg_p)]
jax.block_until_ready(ins)

garrs, grest = split_metrics(g)
kw = dict(dt=dt, hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
          hord_dp=cfg.hord_dp, hord_tm=cfg.hord_tm,
          dddmp=float(_os.environ.get("DDDMP", "0")),
          d4_bg=cfg.d4_bg, hydrostatic=True, lim_fac=cfg.lim_fac,
          **{k: pl_[k] for k in ("nord", "nord_v", "d2_bg", "d_con",
                                 "nord_mask", "damp_v", "damp_v2",
                                 "nord_v2")})


def run(garrs, dp, pt_, u_, v_, uc_, vc_, ua_, va_, dg_):
    gg = merge_metrics(garrs, grest)
    ds = pallas_dsw.d_sw_pallas(dp, pt_, None, u_, v_, uc_, vc_, ua_, va_,
                                dg_, gg, **kw)
    return ds.u, ds.v, ds.delp, ds.pt, ds.fx, ds.fy


fn = jax.jit(run)
t0 = time.perf_counter()
out = fn(garrs, *ins)
jax.block_until_ready(out)
print(f"compile+1st: {time.perf_counter() - t0:.1f} s", flush=True)
t0 = time.perf_counter()
for _ in range(REPS):
    out = fn(garrs, *ins)
jax.block_until_ready(out)
dtm = (time.perf_counter() - t0) / REPS * 1e3
print(f"KB={pallas_dsw.KB} d_sw_pallas full call: {dtm:.2f} ms")
