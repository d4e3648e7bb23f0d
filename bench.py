"""Headline benchmark: hydrostatic dynamical-core throughput on one chip.

Prints ONE JSON line: gridpoints x levels per second per chip for the
C96L32 baroclinic-wave configuration (north-star config 2; the C192L79 moist
configuration takes over once the microphysics path lands). The reference
publishes no numbers (BASELINE.md), so vs_baseline is null.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge

    npx, npz = 97, 32
    step, args = ge._build(npx, npz, jnp.float32, dt=600.0, n_split=4)
    fn = jax.jit(step)
    args = jax.block_until_ready(fn(*args))     # compile + 1 warm step
    t0 = time.perf_counter()
    nsteps = 10
    for _ in range(nsteps):
        args = fn(*args)
    jax.block_until_ready(args)
    dt_step = (time.perf_counter() - t0) / nsteps
    points = 6 * (npx - 1) ** 2 * npz
    print(json.dumps({
        "metric": "C96L32_gridpoints_levels_per_s_per_chip",
        "value": points / dt_step,
        "unit": "pts*lev/s/chip",
        "vs_baseline": None,
        "detail": {"sec_per_step": dt_step, "dt_s": 600.0,
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
