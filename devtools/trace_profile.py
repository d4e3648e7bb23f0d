"""Device-trace attribution of the headline step: run bench steps under
jax.profiler.trace and aggregate HLO op self-times via the tensorboard
profile plugin. Absolute per-stage wall timings through the axon tunnel
are unreliable (PERFORMANCE.md); the xplane trace is ground truth.

Run from repo root:
  python -c "import runpy; runpy.run_path('devtools/trace_profile.py')"
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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


def build_step(config=None):
    """Reuses bench.py's step builder so the trace matches the bench
    exactly. config: a bench.CONFIGS key (default: the bench headline)."""
    import bench
    config = config or os.environ.get("TRACE_CONFIG", "c192_nh")
    jf, garrs, st, _ = bench.build_step_3d(bench.CONFIGS[config])
    fn = lambda *s: jf(garrs, *s)
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
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    report(xs[0])


def report(xplane_path, top=45):
    """Aggregate XLA-op self times by (category, source line). NOTE: the
    'while' row ENCLOSES its body ops (double counted) — subtract it for
    the true step total. Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=
    python when the fast protobuf rejects the tf generated code."""
    import re
    from collections import defaultdict
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(xplane_path, "rb").read())
    plane = [p for p in sp.planes if p.name == "/device:TPU:0"][0]
    em, sm = plane.event_metadata, plane.stat_metadata
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    cnt = defaultdict(int)
    tot = 0.0
    for ev in line.events:
        dur = ev.duration_ps / 1e12
        tot += dur
        md = em[ev.metadata_id]
        src = cat = ""
        for st in list(ev.stats) + list(md.stats):
            nm = sm[st.metadata_id].name
            if nm == "source":
                src = st.str_value
            elif nm == "hlo_category":
                cat = st.str_value
        by_src[(cat, src)] += dur
        by_cat[cat] += dur
        cnt[(cat, src)] += 1
    print(f"total XLA-op time {tot:.3f} s over 2 steps "
          f"({len(line.events) // 2} events/step)")
    print("== by category (ms/step) ==")
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:14]:
        print(f"{t / 2e3 * 1e6:9.2f}  {c}")
    print("== by (category, source) (ms/step) ==")
    for (c, srx), t in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t / 2e3 * 1e6:8.2f}  n={cnt[(c, srx)] // 2:5d}  {c:20s} {srx}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        report(sys.argv[1])
    else:
        main()
