"""mix_dp delp-floor fixer + Ray_fast inline Rayleigh friction
(reference dyn_core.F90:2119 / :2485)."""

import numpy as np
import jax.numpy as jnp

from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import (
    mix_dp, ray_fast, ray_fast_profile)


def _mix_dp_numpy(delp, pt, w, dpmin):
    """Literal sequential port of dyn_core.F90 mix_dp:2159-2194."""
    delp, pt, w = delp.copy(), pt.copy(), w.copy()
    T, K, Y, X = delp.shape
    for t in range(T):
        for j in range(Y):
            for i in range(X):
                for k in range(K - 1):
                    if not delp[t, k, j, i] >= dpmin[k]:
                        dp = dpmin[k] - delp[t, k, j, i]
                        pt[t, k, j, i] = (pt[t, k, j, i] * delp[t, k, j, i]
                                          + pt[t, k + 1, j, i] * dp) / dpmin[k]
                        w[t, k, j, i] = (w[t, k, j, i] * delp[t, k, j, i]
                                         + w[t, k + 1, j, i] * dp) / dpmin[k]
                        delp[t, k, j, i] = dpmin[k]
                        delp[t, k + 1, j, i] -= dp
                km = K - 1
                if not delp[t, km, j, i] >= dpmin[km]:
                    dp = dpmin[km] - delp[t, km, j, i]
                    pt[t, km, j, i] = (pt[t, km, j, i] * delp[t, km, j, i]
                                       + pt[t, km - 1, j, i] * dp) / dpmin[km]
                    w[t, km, j, i] = (w[t, km, j, i] * delp[t, km, j, i]
                                      + w[t, km - 1, j, i] * dp) / dpmin[km]
                    delp[t, km, j, i] = dpmin[km]
                    delp[t, km - 1, j, i] -= dp
    return delp, pt, w


def test_mix_dp_matches_sequential_reference():
    rng = np.random.default_rng(0)
    T, K, Y, X = 2, 8, 3, 3
    dpmin = np.full(K, 1.0)
    delp = rng.uniform(50.0, 200.0, (T, K, Y, X))
    # plant deficits: interior thin layer, consecutive thin layers, thin bottom
    delp[0, 2, 0, 0] = 0.1
    delp[0, 3, 0, 0] = 0.2
    delp[1, K - 1, 1, 1] = 0.05
    delp[0, 0, 2, 2] = -0.5        # negative mass
    pt = rng.uniform(250.0, 320.0, (T, K, Y, X))
    w = rng.normal(0, 1, (T, K, Y, X))

    ref = _mix_dp_numpy(delp, pt, w, dpmin)
    got = mix_dp(jnp.asarray(delp), jnp.asarray(pt), jnp.asarray(w), dpmin,
                 hydrostatic=False)
    for a, b, name in zip(got, ref, "delp pt w".split()):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-12, atol=1e-12,
                                   err_msg=name)
    # column mass conserved, floor enforced
    np.testing.assert_allclose(np.asarray(got[0]).sum(1), delp.sum(1),
                               rtol=1e-12)
    assert (np.asarray(got[0]) >= dpmin.reshape(1, K, 1, 1) - 1e-12).all()


def test_mix_dp_hydro_noop_when_healthy():
    rng = np.random.default_rng(1)
    delp = rng.uniform(50.0, 200.0, (1, 6, 4, 4))
    pt = rng.uniform(250.0, 320.0, (1, 6, 4, 4))
    d2, p2, w2 = mix_dp(jnp.asarray(delp), jnp.asarray(pt), None,
                        np.full(6, 1.0), hydrostatic=True)
    np.testing.assert_array_equal(np.asarray(d2), delp)
    np.testing.assert_array_equal(np.asarray(p2), pt)
    assert w2 is None


def test_ray_fast_conserves_momentum_and_damps():
    # L32-ish hybrid coordinate with a pure-pressure top
    K = 32
    ak = np.zeros(K + 1)
    bk = np.zeros(K + 1)
    ak[: K // 2 + 1] = np.geomspace(100.0, 5.0e4, K // 2 + 1)
    ak[K // 2:] = np.linspace(5.0e4, 0.0, K - K // 2 + 1)
    bk[K // 2:] = np.linspace(0.0, 1.0, K - K // 2 + 1)
    ptop = ak[0]
    rf, dp_ref, dm, k_rf = ray_fast_profile(ak, bk, dt=60.0, tau=5.0,
                                            rf_cutoff=30.e2, ptop=ptop)
    assert (rf <= 1.0).all() and rf[0] < 1.0 and k_rf > 0 and dm > 0
    assert rf[-1] == 1.0                       # no damping near surface

    rng = np.random.default_rng(2)
    u = rng.normal(0, 30, (1, K, 4, 5))
    v = rng.normal(0, 30, (1, K, 5, 4))
    w = rng.normal(0, 5, (1, K, 4, 4))
    u2, v2, w2 = ray_fast(jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
                          rf, dp_ref, dm, k_rf, hydrostatic=False)
    # mass-weighted momentum conserved (damped momentum re-deposited on top)
    wgt = dp_ref.reshape(1, K, 1, 1)
    np.testing.assert_allclose((np.asarray(u2) * wgt).sum(1),
                               (u * wgt).sum(1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose((np.asarray(v2) * wgt).sum(1),
                               (v * wgt).sum(1), rtol=1e-5, atol=1e-6)
    # w damped above cutoff, untouched below
    np.testing.assert_allclose(np.asarray(w2[:, 0]), w[:, 0] * rf[0],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(w2[:, -1]), w[:, -1])


def test_nh_step_with_fill_dp_and_rf_fast():
    """dyn_core_nh compiles & stays finite with mix_dp + inline Rayleigh
    friction enabled (dyn_core.F90:820, :1058-1060)."""
    import jax
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_nh
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

    NPX, NPZ = 13, 10
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    dp0 = np.diff(ak) + np.diff(bk) * 1.0e5
    cfg = DynConfig(npx=NPX, npz=NPZ, dt=1200.0, n_split=4,
                    hydrostatic=False, fill_dp=True, rf_fast=True,
                    # the L10 test coordinate tops at 500 hPa: put the RF
                    # cutoff at 600 hPa so the damping actually engages
                    tau=5.0, rf_cutoff=600.e2)
    akj = jnp.asarray(ak, jnp.float64)
    bkj = jnp.asarray(bk, jnp.float64)
    st = [jnp.asarray(ic[k], jnp.float64)
          for k in ("delp", "pt", "u", "v", "w", "delz")]

    @jax.jit
    def step(delp, pt, u, v, w, delz):
        r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg, akj, bkj,
                           ptop, dp0)
        return r.delp, r.pt, r.u, r.v, r.w, r.delz

    area = jnp.asarray(g.geom.interior("area")[:, None])
    mass0 = float((st[0] * area).sum())
    for _ in range(3):
        st = list(step(*st))
    for a in st:
        assert not bool(jnp.isnan(a).any())
    # mix_dp + Ray_fast both conserve global dry-air mass
    assert abs(float((st[0] * area).sum()) - mass0) / mass0 < 1e-8
