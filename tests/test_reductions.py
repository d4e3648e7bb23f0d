"""Bitwise-reproducible global sums (parallel/reductions.py; the reference's
g_sum BITWISE_EXACT_SUM contract, fv_grid_utils.F90:2879-2929)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gfdl_atmos_cubed_sphere_tpu.parallel.reductions import (
    reproduce_sum, g_sum_reproducible, checksum, checksum_host)


def test_order_invariance_bitwise():
    """Any permutation of the elements gives the identical bit pattern —
    the property plain float sums do NOT have."""
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 200_000) * 10.0 ** rng.integers(-6, 6, 200_000)
    s0 = float(reproduce_sum(jnp.asarray(x)))
    for seed in range(3):
        perm = np.random.default_rng(seed).permutation(x.size)
        s1 = float(reproduce_sum(jnp.asarray(x[perm])))
        assert s0 == s1, f"perm {seed}: {s0} != {s1}"
    # sanity: close to the true (f64 pairwise) sum
    assert abs(s0 - x.sum()) <= 1e-9 * np.abs(x).sum()


def test_partition_invariance_bitwise():
    """Splitting the array across 2/3/4/6/12 shard_map shards (with psum
    across the mesh) gives bits identical to the single-array sum."""
    ndev = len(jax.devices())
    if ndev < 12:
        pytest.skip("needs 12 virtual devices")
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (12, 4096))
    s_ref = float(reproduce_sum(jnp.asarray(x)))

    for nd in (2, 3, 4, 6, 12):
        mesh = Mesh(np.asarray(jax.devices()[:nd]), ("d",))
        f = shard_map(lambda a: reproduce_sum(a, axis_name="d"),
                      mesh=mesh, in_specs=P("d"), out_specs=P())
        s = float(jax.jit(f)(jnp.asarray(x)))
        assert s == s_ref, f"{nd} shards: {s} != {s_ref}"


def test_area_weighted_mean_matches_plain():
    rng = np.random.default_rng(2)
    f = rng.normal(300, 10, (6, 24, 24))
    a = rng.uniform(0.5, 2.0, (6, 24, 24))
    got = float(g_sum_reproducible(jnp.asarray(f), jnp.asarray(a)))
    want = (f * a).sum() / a.sum()
    assert abs(got - want) < 1e-10 * abs(want)


def test_zero_and_constant_fields():
    z = jnp.zeros(1000)
    assert float(reproduce_sum(z)) == 0.0
    c = jnp.full(1000, 2.5)
    assert abs(float(reproduce_sum(c)) - 2500.0) < 1e-9


def test_checksum_device_host_agree():
    rng = np.random.default_rng(3)
    for dt in (np.float64, np.float32):
        x = rng.normal(0, 1, (6, 8, 8)).astype(dt)
        assert int(checksum(jnp.asarray(x))) == checksum_host(x)
    # differs when one bit changes
    x = rng.normal(0, 1, 64)
    y = x.copy()
    y[17] = np.nextafter(y[17], 1.0)
    assert checksum_host(x) != checksum_host(y)
