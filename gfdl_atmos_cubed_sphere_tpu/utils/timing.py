"""Named-scope wall-clock profiler (component #30).

Re-implements /root/reference/tools/fv_timing.F90 (timing_on:100,
timing_off:168, timing_prt:241) as nestable context-manager timers, plus a
hook into the JAX profiler for device traces.
"""

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class Timers:
    """Accumulating named timers. Use `with timers("DYN_CORE"): ...`;
    `report()` prints a fv_timing-style table."""

    def __init__(self, sync=True):
        self._tot = defaultdict(float)
        self._count = defaultdict(int)
        self._sync = sync
        self._stack = []

    @contextmanager
    def __call__(self, name):
        self._stack.append(name)
        full = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync:
                # block on any outstanding device work so the scope owns it
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            self._tot[full] += time.perf_counter() - t0
            self._count[full] += 1
            self._stack.pop()

    def report(self, out=print):
        out(f"{'timer':<40s} {'calls':>7s} {'total_s':>10s} {'mean_ms':>10s}")
        for name in sorted(self._tot):
            tot = self._tot[name]
            cnt = self._count[name]
            out(f"{name:<40s} {cnt:7d} {tot:10.3f} {1e3 * tot / cnt:10.3f}")

    def asdict(self):
        return {k: dict(total_s=self._tot[k], calls=self._count[k])
                for k in self._tot}


@contextmanager
def device_trace(logdir):
    """jax.profiler trace scope (TPU tensorboard trace)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
