"""Step-level device-time breakdown at the headline shape (C192L79 moist):
dyn_core vs tracer_2d vs vertical remap vs GFDL MP vs full step. Same
serialized-fori methodology as stage_profile.py.

Usage (from repo root): python -c "import runpy,sys; sys.argv=['p','N'];
runpy.run_path('devtools/step_profile.py', run_name='__main__')"
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig, dyn_core_hydro
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
    fv_dynamics_hydro, remap_hydro)
from gfdl_atmos_cubed_sphere_tpu.model.tracer_2d import tracer_2d
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.physics.gfdl_mp import MPConfig, gfdl_mp_driver
from gfdl_atmos_cubed_sphere_tpu.ops import fv_sg
import gfdl_atmos_cubed_sphere_tpu.constants as con

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
npx, npz, dtt, n_split = 193, 79, 450.0, 6
g = build_grid_ops(npx, dtype=jnp.float32)
ks, ptop, ak, bk = set_eta(npz)
ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True, moist=True)
prepare_phis(g, ic["phis"])
cfg = DynConfig(npx=npx, npz=npz, dt=dtt, n_split=n_split, adiabatic=False)
mpc = MPConfig()
akap = con.KAPPA
akj = jnp.asarray(ak, jnp.float32)
bkj = jnp.asarray(bk, jnp.float32)
q = {"sphum": jnp.asarray(ic["sphum"], jnp.float32)}
for nm in ("liq_wat", "rainwat", "ice_wat", "snowwat", "graupel"):
    q[nm] = jnp.full(q["sphum"].shape, 1e-6, jnp.float32)
delp = jnp.asarray(ic["delp"], jnp.float32)
pt = jnp.asarray(ic["pt"], jnp.float32)
u = jnp.asarray(ic["u"], jnp.float32)
v = jnp.asarray(ic["v"], jnp.float32)
print(f"C{npx-1}L{npz} moist, iters/stage={N}, backend={jax.default_backend()}")


def timed(name, fn, *args):
    def rep(args):
        def body(i, acc):
            eps = (acc * 0.0).astype(jnp.float32)
            pert = jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args)
            out = fn(*pert)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return acc + sum(jnp.sum(l[..., :1, :1]).astype(jnp.float32)
                             for l in leaves)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
    f = jax.jit(rep)
    r = f(args); r.block_until_ready()
    t0 = time.perf_counter()
    r = f(args); r.block_until_ready()
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:30s} {dt_ms:9.2f} ms")
    return dt_ms


# precompute stage inputs
ptv_fn = jax.jit(lambda delp, pt, q: (
    pt * (1.0 + 0.608 * q["sphum"])
    / ((jnp.exp(akap * jnp.log(ptop + jnp.concatenate(
        [jnp.zeros_like(delp[:, :1]), jnp.cumsum(delp, axis=1)],
        axis=1)))[:, 1:]
        - jnp.exp(akap * jnp.log(ptop + jnp.concatenate(
            [jnp.zeros_like(delp[:, :1]), jnp.cumsum(delp, axis=1)],
            axis=1)))[:, :-1])
       / (akap * (jnp.log(ptop + jnp.cumsum(delp, axis=1))
                  - jnp.log(ptop + jnp.concatenate(
                      [jnp.zeros_like(delp[:, :1]),
                       jnp.cumsum(delp, axis=1)], axis=1)[:, :-1]))))))
ptv = ptv_fn(delp, pt, q).block_until_ready()

core = jax.jit(lambda delp, ptv, u, v: dyn_core_hydro(
    delp, ptv, u, v, None, g, cfg, akap, ptop, n_split, dtt / n_split,
    ak=akj, bk=bkj))
res = core(delp, ptv, u, v)
res = jax.tree_util.tree_map(lambda x: x.block_until_ready()
                             if hasattr(x, "block_until_ready") else x, res)

t_core = timed("dyn_core_hydro (6 iters)", lambda a, b, c, d: (
    lambda r: (r.delp, r.pt, r.u, r.v, r.mfx, r.mfy))(
        dyn_core_hydro(a, b, c, d, None, g, cfg, akap, ptop, n_split,
                       dtt / n_split, ak=akj, bk=bkj)), delp, ptv, u, v)
t_trac = timed("tracer_2d (6 tracers)", lambda q, dp, mfx, mfy, cx, cy: (
    tracer_2d(q, dp, mfx, mfy, cx, cy, g, hord_tr=cfg.hord_tr,
              q_split=cfg.q_split)[0]), q, delp, res.mfx, res.mfy,
    res.cx, res.cy)
t_rem = timed("remap_hydro (+u/v edge)", lambda dp, pt_, u_, v_, q_: (
    lambda r: (r.delp, r.tv, r.u, r.v, r.q))(
        remap_hydro(dp, pt_, u_, v_, q_, res.pe, res.peln, res.pkz,
                    akj, bkj, g, cfg, akap, last_step=True)),
    res.delp, res.pt, res.u, res.v, q)
t_neg = timed("neg_adj3", lambda pt_, dp, q_: fv_sg.neg_adj3(
    pt_, dp, q_, hydrostatic=True), pt, delp, q)
t_mp = timed("gfdl_mp_driver", lambda pt_, dp, q_: gfdl_mp_driver(
    pt_, dp, None, q_, dtt, ptop, cfg=mpc, hydrostatic=True)[:2],
    pt, delp, q)

tot = t_core + t_trac + t_rem + t_neg + t_mp
print(f"{'SUM':30s} {tot:9.2f} ms")

t_full = timed("FULL fv_dynamics_hydro", lambda a, b, c, d, q_: (
    lambda r: (r.delp, r.pt, r.u, r.v, r.q))(
        fv_dynamics_hydro(a, b, c, d, q_, g, cfg, akj, bkj, ptop,
                          mp_cfg=mpc)), delp, pt, u, v, q)
