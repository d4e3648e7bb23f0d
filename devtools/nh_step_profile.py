"""Step-level device-time breakdown for the HEADLINE config (C192L79
nonhydrostatic moist, dddmp=0.2, d_con=1, k_split=2, n_split=6):
dyn_core_nh vs tracer_2d vs remap_nh vs neg_adj3 vs GFDL MP vs full step.
Serialized-fori methodology from step_profile.py.

Usage: python devtools/nh_step_profile.py [N_ITERS]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig, dyn_core_nh
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
    fv_dynamics_nh, remap_nh)
from gfdl_atmos_cubed_sphere_tpu.model.tracer_2d import tracer_2d
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.physics.gfdl_mp import MPConfig, gfdl_mp_driver
from gfdl_atmos_cubed_sphere_tpu.ops import fv_sg
import gfdl_atmos_cubed_sphere_tpu.constants as con

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
npx, npz, dtt, n_split, k_split = 193, 79, 450.0, 6, 2
g = build_grid_ops(npx, dtype=jnp.float32)
ks, ptop, ak, bk = set_eta(npz)
ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True, moist=True)
prepare_phis(g, ic["phis"])
cfg = DynConfig(npx=npx, npz=npz, dt=dtt, n_split=n_split, k_split=k_split,
                adiabatic=False, hydrostatic=False, dddmp=0.2, d_con=1.0,
                do_vort_damp=True)
mpc = MPConfig()
akap = con.KAPPA
akj = jnp.asarray(ak, jnp.float32)
bkj = jnp.asarray(bk, jnp.float32)
dp0 = np.diff(ak) + np.diff(bk) * 1.0e5
q = {"sphum": jnp.asarray(ic["sphum"], jnp.float32)}
for nm in ("liq_wat", "rainwat", "ice_wat", "snowwat", "graupel"):
    q[nm] = jnp.full(q["sphum"].shape, 1e-6, jnp.float32)
delp = jnp.asarray(ic["delp"], jnp.float32)
pt = jnp.asarray(ic["pt"], jnp.float32)
u = jnp.asarray(ic["u"], jnp.float32)
v = jnp.asarray(ic["v"], jnp.float32)
w = jnp.asarray(ic["w"], jnp.float32)
delz = jnp.asarray(ic["delz"], jnp.float32)
mdt = dtt / k_split
print(f"C{npx-1}L{npz} NH moist dddmp=0.2, iters/stage={N}, "
      f"backend={jax.default_backend()}")


def timed(name, fn, *args):
    """Direct timing (no fori wrapper: the serialized-loop methodology
    makes the C192 NH module too large for the compile service). Compile
    once, run N times back-to-back with one final block."""
    f = jax.jit(lambda args: fn(*args))
    r = f(args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(N):
        r = f(args)
    jax.block_until_ready(r)
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:32s} {dt_ms:9.2f} ms", flush=True)
    return dt_ms


# -- stage inputs: theta_v scaffolding exactly as fv_dynamics_nh:384-407 ----
rrg = -con.RDGAS / con.GRAV
zvir = 0.608
tv = pt * (1.0 + zvir * q["sphum"])
pkz = jnp.exp(akap * jnp.log(rrg * delp / delz * tv))
ptv = tv / pkz

core = jax.jit(lambda a, b, c, d, e, f_: vars(dyn_core_nh(
    a, b, c, d, e, f_, None, g, cfg, akap, ptop, n_split, mdt / n_split,
    dp0, ak=akj, bk=bkj)))
from types import SimpleNamespace
res = SimpleNamespace(**core(delp, ptv, u, v, w, delz))
jax.block_until_ready(res.delp)

t_core = timed("dyn_core_nh (6 iters)", lambda a, b, c, d, e, f_: (
    lambda r: (r.delp, r.pt, r.u, r.v, r.w, r.delz, r.mfx, r.mfy))(
        dyn_core_nh(a, b, c, d, e, f_, None, g, cfg, akap, ptop, n_split,
                    mdt / n_split, dp0, ak=akj, bk=bkj)),
    delp, ptv, u, v, w, delz)
t_trac = timed("tracer_2d (6 tracers)", lambda q_, dp, mfx, mfy, cx, cy: (
    tracer_2d(q_, dp, mfx, mfy, cx, cy, g, hord_tr=cfg.hord_tr,
              q_split=cfg.q_split)[0]), q, delp, res.mfx, res.mfy,
    res.cx, res.cy)
t_rem = timed("remap_nh (+w/delz)", lambda dp, pt_, u_, v_, w_, dz_, q_: (
    lambda r: (r.delp, r.tv, r.u, r.v, r.w, r.delz, r.q))(
        remap_nh(dp, pt_, u_, v_, w_, dz_, res.ws, q_, res.pe, res.peln,
                 akj, bkj, g, cfg, akap, last_step=True)),
    res.delp, res.pt, res.u, res.v, res.w, res.delz, q)
t_neg = timed("neg_adj3", lambda pt_, dp, q_: fv_sg.neg_adj3(
    pt_, dp, q_, delz=delz, hydrostatic=False), pt, delp, q)
t_mp = timed("gfdl_mp_driver (sedi_w)", lambda pt_, dp, dz_, q_, w_: (
    lambda r: (r[0], r[1]))(gfdl_mp_driver(
        pt_, dp, dz_, q_, dtt, ptop, cfg=mpc, hydrostatic=False, w=w_)),
    pt, delp, delz, q, w)

tot = k_split * (t_core + t_trac + t_rem) + t_neg + t_mp
print(f"{'SUM (k_split*(core+trac+rem))':32s} {tot:9.2f} ms")

t_full = timed("FULL fv_dynamics_nh", lambda a, b, c, d, e, f_, q_: (
    lambda r: (r.delp, r.pt, r.u, r.v, r.w, r.delz, r.q))(
        fv_dynamics_nh(a, b, c, d, e, f_, q_, g, cfg, akj, bkj, ptop,
                       dp0, mp_cfg=mpc)), delp, pt, u, v, w, delz, q)
