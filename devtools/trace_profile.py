"""Device-trace attribution of the headline step: run bench steps under
jax.profiler.trace and aggregate HLO op self-times via the tensorboard
profile plugin. Absolute per-stage wall timings through the axon tunnel
are unreliable (PERFORMANCE.md); the xplane trace is ground truth.

Run from repo root:
  python -c "import runpy; runpy.run_path('devtools/trace_profile.py')"
"""
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

LOGDIR = "/tmp/fv3_trace"


def build_step():
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_hydro
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    from gfdl_atmos_cubed_sphere_tpu.physics.gfdl_mp import MPConfig

    npx, npz, dt, n_split = 193, 79, 450.0, 6
    g = build_grid_ops(npx, dtype=jnp.float32)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True, moist=True)
    prepare_phis(g, ic["phis"])
    cfg = DynConfig(npx=npx, npz=npz, dt=dt, n_split=n_split,
                    adiabatic=False)
    mpc = MPConfig()
    akj = jnp.asarray(ak, jnp.float32)
    bkj = jnp.asarray(bk, jnp.float32)
    q = {"sphum": jnp.asarray(ic["sphum"], jnp.float32)}
    for nm in ("liq_wat", "rainwat", "ice_wat", "snowwat", "graupel"):
        q[nm] = jnp.full(q["sphum"].shape, 1e-6, jnp.float32)

    def step(delp, pt, u, v, q):
        r = fv_dynamics_hydro(delp, pt, u, v, q, g, cfg, akj, bkj, ptop,
                              mp_cfg=mpc)
        return r.delp, r.pt, r.u, r.v, r.q

    fn = jax.jit(step)
    st = [jnp.asarray(ic[k], jnp.float32)
          for k in ("delp", "pt", "u", "v")] + [q]
    return fn, st


def main():
    os.system(f"rm -rf {LOGDIR}")
    fn, st = build_step()
    out = fn(*st)
    jax.block_until_ready(out)
    st = list(out)
    with jax.profiler.trace(LOGDIR):
        for _ in range(2):
            st = list(fn(*st))
        jax.block_until_ready(st[0])

    xs = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane:", xs, file=sys.stderr)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("hlo_stats", "hlo_stats.json", "hlo_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xs, tool, {})
            break
        except Exception as e:
            print("tool", tool, "failed:", e, file=sys.stderr)
            data = None
    if data is None:
        return
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # gviz table: cols + rows
    cols = [c["label"] if "label" in c else c["id"] for c in obj["cols"]]
    print("COLS:", cols)
    rows = obj["rows"]

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return i
        return None

    i_cat = col("category")
    i_name = col("HLO op name") or col("name")
    i_self = col("self time (us)") or col("self")
    i_src = col("source")
    agg = {}
    for r in rows:
        c = r["c"]
        cat = c[i_cat]["v"] if i_cat is not None else "?"
        t = float(c[i_self]["v"]) if c[i_self] and c[i_self]["v"] else 0.0
        src = (c[i_src]["v"] if i_src is not None and c[i_src] else "")
        key = (cat, src)
        agg[key] = agg.get(key, 0.0) + t
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    tot = sum(agg.values())
    print(f"total self time: {tot/1e3:.1f} ms (2 steps)")
    for (cat, src), t in top:
        print(f"{t/1e3:9.2f} ms  {cat:28s} {src}")


if __name__ == "__main__":
    main()
