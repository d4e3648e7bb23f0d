"""The SIM1 Pallas column kernel (ops/pallas_nh.py) must reproduce the
scan-based solver exactly (interpret mode, f64, CPU). Reference:
nh_utils.F90 SIM1_solver:1277."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.ops.nh_core import sim1_solver
from gfdl_atmos_cubed_sphere_tpu.ops.pallas_nh import sim1_pallas
import gfdl_atmos_cubed_sphere_tpu.constants as con

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("shape", [(2, 16, 10, 12), (1, 31, 9, 7)])
def test_sim1_pallas_matches_scan(shape):
    T, K, Y, X = shape
    rng = np.random.default_rng(21)
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    dt = 8.0
    p_fac = 0.05

    dm = jnp.asarray(rng.uniform(200.0, 600.0, (T, K, Y, X)))
    pem = 100.0 + jnp.concatenate(
        [jnp.zeros((T, 1, Y, X)), jnp.cumsum(dm, axis=1)], axis=1)
    pm = (pem[:, 1:] - pem[:, :-1]) / jnp.log(pem[:, 1:] / pem[:, :-1])
    pt = jnp.asarray(rng.uniform(220.0, 300.0, (T, K, Y, X)))
    dz = -dm * con.RDGAS * pt / pm * (
        1.0 + 0.05 * rng.standard_normal((T, K, Y, X)))
    w = jnp.asarray(rng.standard_normal((T, K, Y, X)))
    ws = jnp.asarray(rng.standard_normal((T, Y, X)) * 0.1)

    pe_r, w_r, dz_r = sim1_solver(dt, dm, pm, pem, w, dz, pt, ws,
                                  gama, akap, p_fac)
    pe_k, w_k, dz_k = jax.jit(lambda: sim1_pallas(
        dt, dm, pm, pem, w, dz, pt, ws, gama, akap, p_fac,
        interpret=True))()
    np.testing.assert_allclose(np.asarray(pe_k), np.asarray(pe_r),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r),
                               rtol=1e-12, atol=1e-11)
    np.testing.assert_allclose(np.asarray(dz_k), np.asarray(dz_r),
                               rtol=1e-12, atol=1e-11)
