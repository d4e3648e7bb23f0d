"""DA increments (fv_treat_da_inc.F90 read_da_inc) and IAU
(fv_iau_mod.F90): lat-lon increment regrid, one-shot application, and
windowed spreading."""

import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.io.da_increment import (
    IAU, IAUConfig, apply_da_inc, cube_increments, read_da_inc)
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops

NPX, K = 13, 4


def _raw_inc(km, const_T=1.5):
    nlat, nlon = 19, 36
    lat = np.linspace(-90.0, 90.0, nlat)
    lon = np.arange(nlon) * (360.0 / nlon)
    return {
        "lon": lon, "lat": lat,
        "T_inc": np.full((km, nlat, nlon), const_T),
        "sphum_inc": np.full((km, nlat, nlon), 1e-4),
        "u_inc": np.ones((km, nlat, nlon)),
        "v_inc": np.zeros((km, nlat, nlon)),
    }


def test_cube_increment_regrid_constant():
    """A constant lat-lon increment must regrid to the same constant
    everywhere on the cube (bilinear exactness on constants)."""
    g = build_grid_ops(NPX, dtype=jnp.float64)
    inc = cube_increments(_raw_inc(K), g.geom, g=g)
    assert inc["pt"].shape == (6, K, NPX - 1, NPX - 1)
    np.testing.assert_allclose(np.asarray(inc["pt"]), 1.5, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(inc["sphum"]), 1e-4, rtol=1e-12)
    # constant eastward A-grid wind -> D-grid u covariant components are
    # bounded by |u|, and somewhere near the equator ~1
    assert float(jnp.abs(inc["u"]).max()) < 1.0 + 1e-6
    assert float(jnp.abs(inc["u"]).max()) > 0.9


def test_apply_da_inc_oneshot():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    inc = cube_increments(_raw_inc(K), g.geom, g=g)
    n = NPX - 1
    state = {"pt": jnp.full((6, K, n, n), 300.0),
             "delp": jnp.full((6, K, n, n), 1e4)}
    out = apply_da_inc(state, inc)
    np.testing.assert_allclose(np.asarray(out["pt"]), 301.5, rtol=1e-12)
    # fields without increments pass through untouched
    np.testing.assert_array_equal(np.asarray(out["delp"]),
                                  np.asarray(state["delp"]))


def test_iau_window_integrates_to_increment():
    """Summing the IAU forcing over the window reproduces the one-shot
    increment (constant and filtered weights both integrate to 1)."""
    inc = {"pt": jnp.ones((2, 3))}
    for filtered in (False, True):
        iau = IAU(inc, IAUConfig(window_s=3600.0, filtered=filtered))
        dt = 90.0
        tot = 0.0
        for i in range(40):
            f = iau.forcing(i * dt, dt)
            if f:
                tot = tot + f["pt"]
        np.testing.assert_allclose(np.asarray(tot), 1.0, rtol=2e-2)
        # outside the window: no forcing
        assert iau.forcing(7200.0, dt) == {}
        assert iau.weight(-1.0) == 0.0
