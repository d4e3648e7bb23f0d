"""Diff the vectorized SIM1 solver (ops/nh_core.sim1_solver) against the
loop-literal Fortran transcription (nh_oracle.sim1_solver_ref). f64,
1e-12 relative. Reference: /root/reference/model/nh_utils.F90:1277."""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.ops.nh_core import sim1_solver
import gfdl_atmos_cubed_sphere_tpu.constants as con
from .nh_oracle import sim1_solver_ref

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("km", [10, 32])
def test_sim1_vs_oracle(km):
    rng = np.random.default_rng(11 + km)
    ni = 6
    dt = 8.0
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    rgas = con.RDGAS
    p_fac = 0.05

    # physically-plausible columns: increasing pressure, negative dz
    pem = np.zeros((ni, km + 1))
    pem[:, 0] = 100.0
    dm2 = rng.uniform(200.0, 600.0, (ni, km)) / con.GRAV * con.GRAV
    dm2 = rng.uniform(200.0, 600.0, (ni, km))
    for k in range(km):
        pem[:, k + 1] = pem[:, k] + dm2[:, k]
    pm2 = (pem[:, 1:] - pem[:, :-1]) / np.log(pem[:, 1:] / pem[:, :-1])
    pt2 = rng.uniform(220.0, 300.0, (ni, km))
    # dz near hydrostatic balance with noise
    dz2 = -dm2 * rgas * pt2 / pm2 * (1.0 + 0.05 * rng.standard_normal(
        (ni, km)))
    w2 = rng.standard_normal((ni, km))
    ws = rng.standard_normal(ni) * 0.1

    pe_ref, w_ref, dz_ref = sim1_solver_ref(
        dt, rgas, gama, akap, dm2, pm2, pem, w2, dz2, pt2, ws, p_fac)

    # vectorized solver: fields [K, ny, nx] with columns along nx
    tok = lambda a: jnp.asarray(a.T[:, None, :])          # [km(+1), 1, ni]
    pe_v, w_v, dz_v = sim1_solver(
        dt, tok(dm2), tok(pm2), tok(pem), tok(w2), tok(dz2), tok(pt2),
        jnp.asarray(ws[None, :]), gama, akap, p_fac)
    back = lambda a: np.asarray(a)[:, 0, :].T
    np.testing.assert_allclose(back(pe_v), pe_ref, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(back(w_v), w_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(back(dz_v), dz_ref, rtol=1e-12, atol=1e-12)
