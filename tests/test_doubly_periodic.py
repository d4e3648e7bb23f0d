"""Doubly-periodic (grid_type 4) domain: periodic halo, planar metrics,
warm-bubble convection (the reference's d96 supercell/bubble CI family,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops_dp
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_nh
from gfdl_atmos_cubed_sphere_tpu.init.doubly_periodic import (
    weisman_klemp_sounding, supercell_init)

N, K = 32, 20


def test_periodic_halo_roundtrip():
    g = build_grid_ops_dp(8, 1.0e3, 1.0e3, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 3, 8, 8)))
    qp = g.halo.pad_cell(q)
    assert qp.shape == (1, 3, 14, 14)
    np.testing.assert_array_equal(qp[..., 3:-3, :3], q[..., :, -3:])
    np.testing.assert_array_equal(qp[..., :3, 3:-3], q[..., -3:, :])
    u = jnp.asarray(rng.normal(size=(1, 3, 9, 8)))
    v = jnp.asarray(rng.normal(size=(1, 3, 8, 9)))
    up, vp = g.halo.pad_dgrid(u, v)
    assert up.shape == (1, 3, 15, 14) and vp.shape == (1, 3, 14, 15)


def test_wk_sounding_physical():
    prof = weisman_klemp_sounding(40)
    assert prof["delp"].min() > 0.0
    assert 200.0 < prof["pt"].min() and prof["pt"].max() < 310.0
    # surface pressure reconstructed
    assert abs(prof["p_edge"][-1] - 1.0e5) < 1.0
    # monotone pressure
    assert np.all(np.diff(prof["p_edge"]) > 0)
    assert prof["sphum"].max() <= 0.014 + 1e-12


def test_warm_bubble_rises():
    import gfdl_atmos_cubed_sphere_tpu.constants as con
    g = build_grid_ops_dp(N, 2.0e3, 2.0e3, dtype=jnp.float64, deglat=0.0)
    ic = supercell_init(g, K, bubble_dtheta=3.0, shear_u=0.0)
    g.phis_p = g.halo.pad_cell(jnp.asarray(ic["phis"], jnp.float64))
    cfg = DynConfig(npx=N + 1, npz=K, dt=20.0, n_split=8, hydrostatic=False,
                    d2_bg_k1=0.0, d2_bg_k2=0.0, dddmp=0.0, d2_bg=0.0)
    dp0 = np.asarray(ic["delp"])[0, :, 0, 0]
    # sigma coordinate anchored at the sounding's actual column
    ptop = 1.0e5 - float(dp0.sum())
    pe0 = np.concatenate([[ptop], ptop + np.cumsum(dp0)])
    bk = (pe0 - pe0[0]) / (pe0[-1] - pe0[0])
    ak = pe0[0] * (1.0 - bk)
    akj = jnp.asarray(ak)
    bkj = jnp.asarray(bk)

    st = {k: jnp.asarray(ic[k], jnp.float64)
          for k in ("delp", "pt", "u", "v", "w", "delz")}

    def step(delp, pt, u, v, w, delz):
        r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg, akj, bkj,
                           ptop, dp0)
        return r.delp, r.pt, r.u, r.v, r.w, r.delz

    stepj = jax.jit(step)
    s = (st["delp"], st["pt"], st["u"], st["v"], st["w"], st["delz"])
    area = float(np.asarray(g.area[0, 0, 3, 3]))
    m0 = float(jnp.sum(s[0]))
    for _ in range(15):                  # 5 minutes
        s = stepj(*s)
    delp, pt, u, v, w, delz = s
    assert not bool(jnp.isnan(w).any())
    # buoyant bubble produces an updraft over the center
    assert float(w.max()) > 0.5, float(w.max())   # ~1 m/s at 5 min
    wc = w[0, :, N // 2 - 4:N // 2 + 4, N // 2 - 4:N // 2 + 4]
    assert float(wc.max()) == pytest.approx(float(w.max()), rel=0.2)
    # mass conserved on the periodic domain
    m1 = float(jnp.sum(delp))
    assert abs(m1 - m0) / m0 < 1e-10
