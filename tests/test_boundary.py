"""Nesting/regional boundary operators (#19/#20)."""

import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.boundary import (
    coarse_to_fine, fine_to_coarse, twoway_feedback, RegionalBCBuffers,
    apply_lateral_bc, PlanarNest)

H = 3


def test_coarse_to_fine_linear_exact():
    ny, nx, R = 12, 16, 3
    j = np.arange(ny) + 0.5
    i = np.arange(nx) + 0.5
    f = jnp.asarray(2.0 * j[:, None] + 3.0 * i[None, :] + 1.0)
    fine = coarse_to_fine(f, R)
    jf = (np.arange(ny * R) + 0.5) / R
    if_ = (np.arange(nx * R) + 0.5) / R
    expect = 2.0 * jf[:, None] + 3.0 * if_[None, :] + 1.0
    # exact in the interior (clamped extrapolation at the outer half-cell)
    np.testing.assert_allclose(np.asarray(fine)[R:-R, R:-R],
                               expect[R:-R, R:-R], rtol=1e-12)


def test_fine_coarse_roundtrip_and_feedback():
    R = 2
    x = (np.arange(8) + 0.5) / 8.0
    coarse = jnp.asarray(np.sin(2 * np.pi * x)[None, :, None]
                         * np.cos(2 * np.pi * x)[None, None, :]
                         * np.ones((3, 1, 1)))
    fine = coarse_to_fine(coarse, R)
    back = fine_to_coarse(fine, R)
    # smooth-field consistency (bilinear then block mean ~ identity)
    assert float(jnp.abs(back - coarse)[..., 1:-1, 1:-1].max()) < 0.15

    parent = jnp.zeros((3, 8, 8))
    nest = jnp.ones((3, 8, 8))          # covers a 4x4 coarse footprint
    upd = twoway_feedback(parent, nest, R, 2, 3)
    assert float(upd[..., 2:6, 3:7].min()) == 1.0
    assert float(jnp.abs(upd).sum()) == 3 * 16.0   # only the footprint


def test_regional_bc_buffers():
    t0 = {"pt": jnp.zeros((2, 2))}
    t1 = {"pt": jnp.full((2, 2), 10.0)}
    buf = RegionalBCBuffers(t0, t1, interval=3600.0)
    mid = buf.at_time(1800.0)
    np.testing.assert_allclose(np.asarray(mid["pt"]), 5.0)
    buf.rotate({"pt": jnp.full((2, 2), 20.0)})
    np.testing.assert_allclose(np.asarray(buf.at_time(0.0)["pt"]), 10.0)


def test_apply_lateral_bc():
    n = 16
    P = n + 2 * H
    field = jnp.zeros((2, P, P))
    bc = jnp.ones((2, P, P))
    out = apply_lateral_bc(field, bc, n, nrows_blend=4)
    # halo fully replaced
    np.testing.assert_allclose(np.asarray(out[:, :H, :]), 1.0)
    np.testing.assert_allclose(np.asarray(out[:, :, -H:]), 1.0)
    # deep interior untouched
    c = P // 2
    assert float(out[:, c, c].max()) == 0.0
    # blend decreases inward
    row = np.asarray(out[0, H:H + 6, c])
    assert np.all(np.diff(row) <= 1e-12)


def test_planar_nest_tracks_parent():
    """One-way nest driven by parent BCs reproduces a translating feature
    (advection consistency of the BC machinery)."""
    rng = np.random.default_rng(1)
    npar, R, nn = 24, 2, 16
    nest = PlanarNest(R, offset_j=8, offset_i=8, n_nest=nn)
    x = np.arange(npar) + 0.5
    blob = lambda s: np.exp(-(((x[None, :] - 12 - s) / 3.0) ** 2
                              + ((x[:, None] - 12) / 3.0) ** 2))
    nest_state = None
    for step in range(4):
        parent = jnp.asarray(blob(step * 0.5))[None]
        bc = nest.nest_bc_from_parent({"q": parent})["q"]
        if nest_state is None:
            nest_state = bc
        else:
            nest_state = apply_lateral_bc(nest_state, bc, nn, nrows_blend=3)
    # after repeated BC application the nest halo matches the parent interp
    np.testing.assert_allclose(np.asarray(nest_state[:, :H, :]),
                               np.asarray(bc[:, :H, :]), rtol=1e-12)
    assert not bool(jnp.isnan(nest_state).any())
