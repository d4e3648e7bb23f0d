"""Benchmarks (BASELINE.md north stars). Prints ONE JSON line per config.

Default (driver invocation, no args): BOTH standing configs — c192_hydro
first, then the HEADLINE c192_nh LAST (the driver parses the final line).
c192_nh is C192L79 nonhydrostatic moist baroclinic wave with GFDL-MP
tracers, Smagorinsky divergence damping (dddmp=0.2), dissipative heating
(d_con=1), k_split=2 — a realistic SHiELD-style forecast configuration,
NOT the flattering hydro/no-damping setup (round-3 VERDICT weak #4).

  python bench.py [--config c192_nh|c192_hydro|c384l91_nh|sw_c768]
                  [--steps N]

The reference publishes no numbers (BASELINE.md), so vs_baseline is null.
"""

import argparse
import json
import os
import time

# Persistent XLA compilation cache: the C192 programs take tens of
# minutes to compile through the axon relay; cache them across bench
# invocations so repeated runs (and the driver's end-of-round bench)
# start from a warm cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

CONFIGS = {
    # name: (npx, npz, dt, mode, overrides)
    "c192_nh": dict(npx=193, npz=79, dt=450.0, mode="nh",
                    k_split=2, n_split=6, dddmp=0.2, d_con=1.0,
                    do_vort_damp=True),
    "c192_hydro": dict(npx=193, npz=79, dt=450.0, mode="hydro",
                       k_split=1, n_split=6),
    "c384l91_nh": dict(npx=385, npz=91, dt=225.0, mode="nh",
                       k_split=2, n_split=6, dddmp=0.2, d_con=1.0,
                       do_vort_damp=True),
    "sw_c768": dict(npx=769, npz=1, dt=225.0, mode="sw", n_split=1),
}


def build_step_3d(spec):
    """Returns (fn, garrs, state, cfg): jitted step + its arguments."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (
        build_grid_ops, split_metrics, merge_metrics)
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
        fv_dynamics_hydro, fv_dynamics_nh)
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    from gfdl_atmos_cubed_sphere_tpu.physics.gfdl_mp import MPConfig

    npx, npz, dt = spec["npx"], spec["npz"], spec["dt"]
    mode = spec["mode"]
    cfg_kw = {k: v for k, v in spec.items()
              if k not in ("npx", "npz", "dt", "mode")}
    g = build_grid_ops(npx, dtype=jnp.float32)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True, moist=True)
    prepare_phis(g, ic["phis"])
    cfg = DynConfig(npx=npx, npz=npz, dt=dt, adiabatic=False,
                    hydrostatic=(mode == "hydro"), **cfg_kw)
    mpc = MPConfig()
    akj = jnp.asarray(ak, jnp.float32)
    bkj = jnp.asarray(bk, jnp.float32)
    q = {"sphum": jnp.asarray(ic["sphum"], jnp.float32)}
    for nm in ("liq_wat", "rainwat", "ice_wat", "snowwat", "graupel"):
        q[nm] = jnp.full(q["sphum"].shape, 1e-6, jnp.float32)
    garrs, grest = split_metrics(g)

    if mode == "hydro":
        def step(garrs, delp, pt, u, v, w, delz, q):
            gg = merge_metrics(garrs, grest)
            r = fv_dynamics_hydro(delp, pt, u, v, q, gg, cfg, akj, bkj,
                                  ptop, mp_cfg=mpc)
            return r.delp, r.pt, r.u, r.v, w, delz, r.q
    else:
        dp0 = np.diff(ak) + np.diff(bk) * 1.0e5

        def step(garrs, delp, pt, u, v, w, delz, q):
            gg = merge_metrics(garrs, grest)
            r = fv_dynamics_nh(delp, pt, u, v, w, delz, q, gg, cfg, akj,
                               bkj, ptop, dp0, mp_cfg=mpc)
            return r.delp, r.pt, r.u, r.v, r.w, r.delz, r.q

    fn = jax.jit(step)
    st = [jnp.asarray(ic[k], jnp.float32)
          for k in ("delp", "pt", "u", "v", "w", "delz")] + [q]
    return fn, garrs, st, cfg


def run_3d(name, spec, nsteps):
    import jax
    import numpy as np
    fn, garrs, st, cfg = build_step_3d(spec)
    npx, npz, dt = spec["npx"], spec["npz"], spec["dt"]
    mode = spec["mode"]
    out = fn(garrs, *st)
    jax.block_until_ready(out)
    # force a 4-byte device->host readback of a reduction over the warmup
    # result: on the tunneled axon backend, block_until_ready on a buffer
    # handle has been observed to return before the computation finishes
    # (a 2.3 s/step run once measured as 0.19 ms/step); a scalar fetched
    # from the end of the dependency chain cannot lie.
    import jax.numpy as _jnp
    float(_jnp.sum(out[0]))
    st = list(out)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        st = list(fn(garrs, *st))
    float(_jnp.sum(st[0]))
    dt_step = (time.perf_counter() - t0) / nsteps
    points = 6 * (npx - 1) ** 2 * npz
    line = json.dumps({
        "metric": f"{name}_moist_mp_gridpoints_levels_per_s_per_chip",
        "value": points / dt_step,
        "unit": "pts*lev/s/chip",
        "vs_baseline": None,
        "detail": {"sec_per_step": dt_step, "dt_s": dt, "mode": mode,
                   "k_split": cfg.k_split, "n_split": cfg.n_split,
                   "dddmp": cfg.dddmp, "d_con": float(np.max(cfg.d_con)),
                   "tracers": 6, "backend": jax.default_backend()},
    })
    print(line, flush=True)
    return line


def run_sw(name, spec, nsteps):
    import jax
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (
        build_grid_ops, split_metrics, merge_metrics)
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import (
        SWConfig, make_sw_step, prepare_phis)
    from gfdl_atmos_cubed_sphere_tpu.init import sw_cases

    npx, dt = spec["npx"], spec["dt"]
    g = build_grid_ops(npx, dtype=jnp.float32)
    ic = sw_cases.case2(g.geom)
    prepare_phis(g, ic["phis"])
    garrs, grest = split_metrics(g)
    cfg = SWConfig(npx=npx, dt=dt, n_split=spec.get("n_split", 1))

    def step(garrs, d, u, v):
        # rebuild the metric pack from jit args (split_metrics contract)
        gg = merge_metrics(garrs, grest)
        return make_sw_step(gg, cfg)(d, u, v, None, None)

    fn = jax.jit(step)
    d, u, v = (jnp.asarray(ic[k], jnp.float32) for k in ("delp", "u", "v"))
    out = fn(garrs, d, u, v)
    jax.block_until_ready(out)
    d, u, v = out
    import jax.numpy as _jnp
    float(_jnp.sum(d))
    t0 = time.perf_counter()
    for _ in range(nsteps):
        d, u, v = fn(garrs, d, u, v)
    float(_jnp.sum(d))                     # scalar completion barrier
    dt_step = (time.perf_counter() - t0) / nsteps
    points = 6 * (npx - 1) ** 2
    print(json.dumps({
        "metric": f"{name}_gridpoints_per_s_per_chip",
        "value": points / dt_step,
        "unit": "pts/s/chip",
        "vs_baseline": None,
        "detail": {"sec_per_step": dt_step, "dt_s": dt,
                   "backend": jax.default_backend()},
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="default",
                    choices=sorted(CONFIGS) + ["default"])
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    if args.config == "default":
        # Emit BOTH standing configs each driver run so cross-round trends
        # survive metric renames (round-4 VERDICT weak #4). The headline
        # NH config runs FIRST — C192 compiles through the axon relay can
        # take tens of minutes, so if the harness kills the run mid-way
        # the headline line has already been printed — and its line is
        # RE-EMITTED at the end so the final JSON line (what the driver
        # parses) is always the NH headline.
        nh_line = run_3d("c192_nh", CONFIGS["c192_nh"], args.steps)
        run_3d("c192_hydro", CONFIGS["c192_hydro"], args.steps)
        print(nh_line, flush=True)
        return
    spec = CONFIGS[args.config]
    if spec["mode"] == "sw":
        run_sw(args.config, spec, args.steps)
    else:
        run_3d(args.config, spec, args.steps)


if __name__ == "__main__":
    main()
