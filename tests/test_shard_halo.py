"""shard_map + ppermute halo backend vs the single-array gather halo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.parallel.shard_halo import (
    ShardHalo, shard_step, tile_mesh, localize_g)

N = 12
H = 3


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 6:
        pytest.skip("needs >= 6 devices")
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    return g, tile_mesh()


def _run_halo_op(g, mesh, fn, *args):
    return shard_step(g, fn, mesh=mesh)(*args)


def test_pad_cell_corner_parity(setup):
    g, mesh = setup
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(6, 4, N, N)))
    ref = g.halo.pad_cell(q)
    out = _run_halo_op(g, mesh, lambda gl, x: gl.halo.pad_cell(x), q)
    _, _, _, valid = g.geom.topology.cell_halo_spec(H)
    m = jnp.asarray(valid)[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(m, out, 0.0)),
                                  np.asarray(jnp.where(m, ref, 0.0)))

    qc = jnp.asarray(rng.normal(size=(6, 2, N + 1, N + 1)))
    refc = g.halo.pad_corner(qc)
    outc = _run_halo_op(g, mesh, lambda gl, x: gl.halo.pad_corner(x), qc)
    _, _, _, validc = g.geom.topology.corner_halo_spec(H)
    mc = jnp.asarray(validc)[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(mc, outc, 0.0)),
                                  np.asarray(jnp.where(mc, refc, 0.0)))


def test_pad_vector_parity(setup):
    g, mesh = setup
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(6, 3, N + 1, N)))
    v = jnp.asarray(rng.normal(size=(6, 3, N, N + 1)))
    ref_u, ref_v = g.halo.pad_dgrid(u, v)
    out_u, out_v = _run_halo_op(
        g, mesh, lambda gl, a, b: gl.halo.pad_dgrid(a, b), u, v)
    specs = g.geom.topology.vector_halo_spec(H, "D")
    mu = jnp.asarray(specs["u"]["valid"])[:, None]
    mv = jnp.asarray(specs["v"]["valid"])[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(mu, out_u, 0.0)),
                                  np.asarray(jnp.where(mu, ref_u, 0.0)))
    np.testing.assert_array_equal(np.asarray(jnp.where(mv, out_v, 0.0)),
                                  np.asarray(jnp.where(mv, ref_v, 0.0)))

    uc = jnp.asarray(rng.normal(size=(6, 3, N, N + 1)))
    vc = jnp.asarray(rng.normal(size=(6, 3, N + 1, N)))
    ref_uc, ref_vc = g.halo.pad_cgrid(uc, vc)
    out_uc, out_vc = _run_halo_op(
        g, mesh, lambda gl, a, b: gl.halo.pad_cgrid(a, b), uc, vc)
    specs = g.geom.topology.vector_halo_spec(H, "C")
    muc = jnp.asarray(specs["u"]["valid"])[:, None]
    mvc = jnp.asarray(specs["v"]["valid"])[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(muc, out_uc, 0.0)),
                                  np.asarray(jnp.where(muc, ref_uc, 0.0)))
    np.testing.assert_array_equal(np.asarray(jnp.where(mvc, out_vc, 0.0)),
                                  np.asarray(jnp.where(mvc, ref_vc, 0.0)))


def test_reconcile_parity(setup):
    g, mesh = setup
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(6, 3, N + 1, N)))
    v = jnp.asarray(rng.normal(size=(6, 3, N, N + 1)))
    ref_u, ref_v = g.halo.reconcile_dgrid(u, v)
    out_u, out_v = _run_halo_op(
        g, mesh, lambda gl, a, b: gl.halo.reconcile_dgrid(a, b), u, v)
    np.testing.assert_array_equal(np.asarray(out_u), np.asarray(ref_u))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))
