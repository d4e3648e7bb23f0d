"""Headline benchmark (BASELINE.md north-star): C192L79 moist baroclinic
wave with GFDL-microphysics tracers, gridpoints x levels per second per
chip. Prints ONE JSON line. The reference publishes no numbers
(BASELINE.md), so vs_baseline is null.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (
        build_grid_ops, split_metrics, merge_metrics)
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

    # metrics ride as jit arguments (not embedded constants): cuts the
    # serialized program from >100 MB to a few MB (see grid_ops.split_metrics)
    garrs, grest = split_metrics(g)

    def step(garrs, delp, pt, u, v, q):
        gg = merge_metrics(garrs, grest)
        r = fv_dynamics_hydro(delp, pt, u, v, q, gg, cfg, akj, bkj, ptop,
                              mp_cfg=mpc)
        return r.delp, r.pt, r.u, r.v, r.q

    fn = jax.jit(step)
    st = [jnp.asarray(ic[k], jnp.float32)
          for k in ("delp", "pt", "u", "v")] + [q]
    out = fn(garrs, *st)
    jax.block_until_ready(out)
    st = list(out)
    t0 = time.perf_counter()
    nsteps = 5
    for _ in range(nsteps):
        st = list(fn(garrs, *st))
    jax.block_until_ready(st[0])
    dt_step = (time.perf_counter() - t0) / nsteps
    points = 6 * (npx - 1) ** 2 * npz
    print(json.dumps({
        "metric": "C192L79_moist_mp_gridpoints_levels_per_s_per_chip",
        "value": points / dt_step,
        "unit": "pts*lev/s/chip",
        "vs_baseline": None,
        "detail": {"sec_per_step": dt_step, "dt_s": dt,
                   "n_split": n_split, "tracers": 6,
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
