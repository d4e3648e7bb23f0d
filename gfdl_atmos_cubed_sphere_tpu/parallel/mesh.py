"""Device-mesh utilities for the multi-chip execution path.

The single-array execution mode runs under plain ``jit`` with GSPMD
propagating shardings through the topology-derived halo gathers (the analog
of the reference's FMS domain2D decomposition, tools/fv_mp_mod.F90:276-640).

GSPMD caveat (jax 0.9 / XLA, observed on an 8-device CPU mesh): when the
acoustic loop is a ``lax.scan``, the while-loop body's edge
dynamic-update-slice chains (a2b_edge-style masked edge updates) are
partitioned inconsistently and produce wrong values / NaN on a sharded mesh
— the identical computation is correct when the loop is python-unrolled, on
one device, or at scan length 1. Adding ``with_sharding_constraint`` pins
made the unrolled path wrong too, so constraints are no workaround either.
Hence ``DynConfig.use_scan`` / ``SWConfig.use_scan``: scan (fast compile) on
a single device, unrolled under a mesh. The long-term multi-chip path is an
explicitly partitioned ``shard_map`` backend with ppermute halo exchange,
which bypasses GSPMD propagation entirely (SURVEY.md §5 comm plan).
"""

import jax


def current_mesh():
    """The mesh active at trace time, or None.

    Detects both the modern ``jax.sharding.use_mesh`` abstract-mesh context
    and the legacy ``with mesh:`` context manager.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is not None and not am.empty:
        return am
    try:
        from jax.interpreters import pxla
        pm = pxla.thread_resources.env.physical_mesh
        if not pm.empty:
            return pm
    except Exception:
        pass
    return None
