"""fv_fill fillers (fv_fill.F90), climate/ADA nudging + vortex breeding
(GFDL_tools/fv_climate_nudge.F90, fv_nudge.F90 breed_slp_inline), and the
Schar mountain doubly-periodic case (test_cases.F90 case 22)."""

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (build_grid_ops,
                                                        build_grid_ops_dp)
from gfdl_atmos_cubed_sphere_tpu.ops.fv_fill import fill_gfs, fill2d
from gfdl_atmos_cubed_sphere_tpu.physics.nudging import (
    ClimateNudgeConfig, BreedConfig, climate_nudge, breed_slp_inline,
    time_interp_climatology)
from gfdl_atmos_cubed_sphere_tpu.init import doubly_periodic as dpmod

NPX = 13


def test_fill_gfs_conserves_and_fills():
    rng = np.random.default_rng(0)
    km = 12
    q = rng.uniform(-0.2, 1.0, (5, km))
    dp = rng.uniform(0.5, 2.0, (5, km))
    out = np.asarray(fill_gfs(jnp.asarray(q), jnp.asarray(dp)))
    np.testing.assert_allclose((out * dp).sum(-1), (q * dp).sum(-1),
                               rtol=1e-12)
    # all layers above the bottom are non-negative (bottom may keep residual)
    assert (out[:, 1:] >= -1e-14).all()


def test_fill_gfs_positive_untouched():
    q = jnp.asarray(np.full((3, 8), 0.3))
    dp = jnp.asarray(np.ones((3, 8)))
    np.testing.assert_allclose(np.asarray(fill_gfs(q, dp)), 0.3, rtol=1e-15)


def test_fill2d_conserves_and_damps_negatives():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    n = g.n
    rng = np.random.default_rng(1)
    q = rng.uniform(0.1, 1.0, (6, 2, n, n))
    q[:, :, n // 2, n // 2] = -0.5           # isolated negative
    delp = rng.uniform(0.9, 1.1, (6, 2, n, n))
    area = np.asarray(g.geom.interior("area"))[:, None]
    out = np.asarray(fill2d(jnp.asarray(q), jnp.asarray(delp), g))
    m0 = (q * delp * area).sum()
    m1 = (out * delp * area).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-12)
    assert out[:, :, n // 2, n // 2].min() > q[:, :, n // 2, n // 2].min()


def test_climate_nudge_relaxes_and_conserves_shape():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    n = g.n
    K = 6
    state = {
        "pt": jnp.full((6, K, n, n), 250.0),
        "sphum": jnp.full((6, K, n, n), 1e-3),
        "u": jnp.zeros((6, K, n + 1, n)),
        "v": jnp.zeros((6, K, n, n + 1)),
        "delp": jnp.full((6, K, n, n), 100e2),
    }
    clim = {
        "pt": jnp.full((6, K, n, n), 260.0),
        "sphum": jnp.full((6, K, n, n), 2e-3),
        "u": jnp.full((6, K, n + 1, n), 5.0),
        "v": jnp.full((6, K, n, n + 1), -5.0),
    }
    pm = jnp.full((6, K, n, n), 500e2)
    cfg = ClimateNudgeConfig(u_tau=3600.0, v_tau=3600.0, t_tau=3600.0,
                             q_tau=3600.0, skip_top_q=2)
    out, tend = climate_nudge(600.0, state, clim, pm, cfg)
    # relaxation moves toward target by dt/tau implicitly
    expect = (250.0 + (600.0 / 3600.0) * 260.0) / (1.0 + 600.0 / 3600.0)
    np.testing.assert_allclose(np.asarray(out["pt"]), expect, rtol=1e-12)
    # top-2 layers of q untouched, the rest moved
    np.testing.assert_allclose(np.asarray(out["sphum"][:, :2]), 1e-3)
    assert float(out["sphum"][:, 2:].min()) > 1e-3
    assert float(out["u"].mean()) > 0 and float(out["v"].mean()) < 0
    assert "pt" in tend


def test_climate_nudge_ps_adjusts_delp():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    n = g.n
    K = 5
    ak = np.linspace(100.0, 0.0, K + 1)
    bk = np.linspace(0.0, 1.0, K + 1)
    delp = jnp.asarray(np.diff(ak) + np.diff(bk) * 1000e2)[None, :, None,
                                                           None]
    delp = jnp.broadcast_to(delp, (6, K, n, n))
    state = {"delp": delp}
    clim = {"ps": jnp.full((6, n, n), 1010e2)}
    pm = jnp.full((6, K, n, n), 500e2)
    cfg = ClimateNudgeConfig(ps_tau=3600.0)
    out, tend = climate_nudge(600.0, state, clim, pm, cfg, ak=ak, bk=bk)
    ps0 = ak[0] + np.asarray(delp.sum(1))
    ps1 = ak[0] + np.asarray(out["delp"].sum(1))
    # moved toward 1010 hPa implicitly
    r = 600.0 / 3600.0
    np.testing.assert_allclose(ps1, (ps0 + r * 1010e2) / (1 + r), rtol=1e-12)


def test_time_interp_climatology():
    clim = {"pt": (np.zeros(3), np.ones(3))}
    np.testing.assert_allclose(time_interp_climatology(clim, 0.25)["pt"],
                               0.25)


def test_breed_slp_deepens_storm_and_conserves_mass():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    n = g.n
    K = 8
    delp = jnp.full((6, K, n, n), 1000e2 / K)
    pt_bot = jnp.full((6, n, n), 300.0)
    phis = jnp.zeros((6, n, n))
    ak = np.linspace(100.0, 0.0, K + 1)
    # storm centered on tile 0 center, observed SLP well below the state's
    lat0 = float(np.asarray(g.geom.interior("aglat"))[0, n // 2, n // 2])
    lon0 = float(np.asarray(g.geom.interior("aglon"))[0, n // 2, n // 2])
    storms = np.array([[lon0, lat0, 96000.0]])
    area = np.asarray(g.geom.interior("area"))
    out = breed_slp_inline(600.0, delp, pt_bot, phis, storms, g, ak,
                           BreedConfig())
    out = np.asarray(out)
    ps0 = ak[0] + np.asarray(delp.sum(1))
    ps1 = ak[0] + out.sum(1)
    # deepened at the storm center
    assert ps1[0, n // 2, n // 2] < ps0[0, n // 2, n // 2]
    # total air mass restored
    np.testing.assert_allclose((out.sum(1) * area).sum(),
                               (np.asarray(delp.sum(1)) * area).sum(),
                               rtol=1e-10)
    # far tile barely affected beyond the uniform mass restore
    assert abs(ps1[3].mean() - ps0[3].mean()) < 50.0


def test_schar_mountain_hydrostatic_balance_and_step():
    K = 40
    g = build_grid_ops_dp(96, 1000.0, 1000.0, dtype=jnp.float64)
    ic, ak, bk = dpmod.schar_mountain_init(g, K)
    assert (ic["delp"] > 0).all() and (ic["delz"] < 0).all()
    assert 180.0 < ic["pt"].min() and ic["pt"].max() < 330.0
    # ridge is uniform in y and has the right peak height
    phis = ic["phis"][0, 0]
    np.testing.assert_allclose(phis, np.broadcast_to(phis[:1], phis.shape),
                               atol=1e-10)
    np.testing.assert_allclose(phis.max(), 2000.0 * 9.80665, rtol=0.05)
    # Brunt-Vaisala frequency of the column ~ N=0.01 in the interior
    far = 5
    delz = ic["delz"][0, :, far, far]            # k=0 top, negative
    edge = np.zeros(K + 1)
    for k in range(K - 1, -1, -1):               # integrate up from ground
        edge[k] = edge[k + 1] - delz[k]
    zmid = edge[1:] - 0.5 * delz
    pm = ak[:-1] + 0.5 * np.diff(ak) + (bk[:-1] + 0.5 * np.diff(bk)) * 1e5
    theta = ic["pt"][0, :, far, far] * (1e5 / pm) ** 0.2854
    sel = (zmid > 1000.0) & (zmid < 8000.0)
    dlnth_dz = np.gradient(np.log(theta[sel]), zmid[sel])
    n2 = 9.80665 * dlnth_dz
    np.testing.assert_allclose(n2, 1e-4, rtol=0.1)


def test_schar_mountain_nh_step():
    """d96 mtn_schar CI analog (shrunk): the Schar state drives the
    nonhydrostatic core stably and spins up mountain waves (w != 0)."""
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_nh

    n, K = 48, 40
    g = build_grid_ops_dp(n, 1000.0, 1000.0, dtype=jnp.float64)
    ic, ak, bk = dpmod.schar_mountain_init(g, K)
    g.phis_p = g.halo.pad_cell(jnp.asarray(ic["phis"], jnp.float64))
    cfg = DynConfig(npx=n + 1, npz=K, dt=6.0, n_split=12, hydrostatic=False,
                    d2_bg_k1=0.0, d2_bg_k2=0.0)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    ptop = float(ak[0])
    dp0 = np.asarray(ic["delp"])[0, :, 2, 2]

    def step(delp, pt, u, v, w, delz):
        r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg, akj, bkj,
                           ptop, dp0)
        return r.delp, r.pt, r.u, r.v, r.w, r.delz

    stepj = jax.jit(step)
    s = tuple(jnp.asarray(ic[k], jnp.float64)
              for k in ("delp", "pt", "u", "v", "w", "delz"))
    m0 = float(jnp.sum(s[0]))
    for _ in range(10):                 # 1 minute
        s = stepj(*s)
    delp, pt, u, v, w, delz = s
    assert not bool(jnp.isnan(w).any())
    np.testing.assert_allclose(float(jnp.sum(delp)), m0, rtol=1e-12)
    # shear flow over the ridge excites vertical motion near the mountain
    assert float(jnp.abs(w).max()) > 1e-3
    assert float(jnp.abs(w).max()) < 20.0
    assert (delp > 0).all() and (delz < 0).all()
