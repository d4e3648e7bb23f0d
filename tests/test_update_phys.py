"""Physics coupling (model/fv_update_phys.py): wind transform round trip.

The A->D scatter (update_dwinds_phys) followed by the D->A transform
(cubed_to_latlon) must approximately recover a smooth lat-lon tendency
field — the consistency contract between fv_update_phys.F90 and
fv_grid_utils.F90 c2l.
"""

import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.fv_update_phys import (
    del2_phys,
    cubed_to_latlon, update_dwinds_phys, fv_update_phys)

NPX = 25


def test_wind_roundtrip():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    n = g.n
    K = 3
    lat = jnp.asarray(g.geom.interior("aglat"))[:, None]
    lon = jnp.asarray(g.geom.interior("aglon"))[:, None]
    # smooth solid-body-like lat-lon tendency
    u_dt = (10.0 * jnp.cos(lat)) * jnp.ones((6, K, n, n))
    v_dt = (3.0 * jnp.sin(lon) * jnp.cos(lat)) * jnp.ones((6, K, n, n))

    u0 = jnp.zeros((6, K, n + 1, n))
    v0 = jnp.zeros((6, K, n, n + 1))
    u1, v1 = update_dwinds_phys(u0, v0, u_dt, v_dt, g, dt=1.0)
    ua, va = cubed_to_latlon(u1, v1, g)

    err_u = float(jnp.abs(ua - u_dt).max()) / 10.0
    err_v = float(jnp.abs(va - v_dt).max()) / 10.0
    assert err_u < 0.05, err_u          # few-% interpolation error
    assert err_v < 0.05, err_v
    assert not bool(jnp.isnan(u1).any())


def test_fv_update_phys_applies_tendencies():
    g = build_grid_ops(13, dtype=jnp.float64)
    n = g.n
    K = 2
    pt = jnp.full((6, K, n, n), 250.0)
    delp = jnp.full((6, K, n, n), 5e4)
    u = jnp.zeros((6, K, n + 1, n))
    v = jnp.zeros((6, K, n, n + 1))
    q = {"sphum": jnp.full((6, K, n, n), 1e-3)}
    t_dt = jnp.full((6, K, n, n), 1.0 / 86400.0)
    q_dt = {"sphum": jnp.full((6, K, n, n), -1e-9)}
    zdt = jnp.zeros((6, K, n, n))
    pt2, u2, v2, q2 = fv_update_phys(1800.0, pt, delp, u, v, q,
                                     zdt, zdt, t_dt, q_dt, g)
    np.testing.assert_allclose(float(pt2[0, 0, 0, 0]) - 250.0,
                               1800.0 / 86400.0, rtol=1e-10)
    np.testing.assert_allclose(float(q2["sphum"][0, 0, 0, 0]),
                               1e-3 - 1800.0 * 1e-9, rtol=1e-10)


def test_del2_phys_filters_tendencies():
    """del2_phys (fv_update_phys.F90:770): with uniform delp a constant
    tendency is invariant (zero gradient fluxes), noise loses variance,
    and the mass-weighted integral is conserved (flux form)."""
    g = build_grid_ops(13, dtype=jnp.float64)
    n = g.n
    K = 3
    delp = jnp.full((6, K, n, n), 500.0)
    c = jnp.full((6, K, n, n), 2.5)
    out = del2_phys(c, delp, g, 0.2)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-12)

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.normal(0.0, 1.0, (6, K, n, n)))
    outn = del2_phys(noise, delp, g, 0.2)
    assert float(jnp.var(outn)) < float(jnp.var(noise))
    area = jnp.asarray(g.geom.interior("area"))[:, None]
    tot0 = float(jnp.sum(noise * delp * area))
    tot1 = float(jnp.sum(outn * delp * area))
    np.testing.assert_allclose(tot1, tot0, rtol=1e-9, atol=1e-6)
