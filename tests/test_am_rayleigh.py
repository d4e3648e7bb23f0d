"""consv_am angular-momentum fixer + real-case Rayleigh friction
(fv_dynamics.F90:747-800 am fixer; Rayleigh_Friction:1126)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model import thermodynamics as thermo
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import rayleigh_friction
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

N, K = 12, 10


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, ak, bk, ptop)
    return g, ptop, ak, bk, ic


def _aam_mean(u, v, delp, g, ptop):
    aam, _, _ = thermo.compute_aam(u, v, delp, g, ptop)
    return float(thermo.g_mean(aam, g))


def test_am_fixer_restores_aam(setup):
    g, ptop, ak, bk, ic = setup
    u = jnp.asarray(ic["u"])
    v = jnp.asarray(ic["v"])
    delp = jnp.asarray(ic["delp"])
    aam0, _, _ = thermo.compute_aam(u, v, delp, g, ptop)
    m0 = float(thermo.g_mean(aam0, g))
    # perturb the zonal circulation -> global AAM drifts
    l2c_u = jnp.asarray(g.geom.interior("l2c_u"))
    u_bad = u + 5.0 * l2c_u[:, None]
    drift = _aam_mean(u_bad, v, delp, g, ptop) - m0
    assert abs(drift) > 1.0e6            # perturbation is visible
    u_fix, v_fix, u00 = thermo.am_fixer(u_bad, v, delp, aam0, g, ptop)
    m_fix = _aam_mean(u_fix, v_fix, delp, g, ptop)
    # fixer recovers the original global AAM (one-shot linear estimate,
    # same contract as the reference: residual << drift)
    assert abs(m_fix - m0) < 1.0e-2 * abs(drift)
    assert float(u00) < 0.0


def test_rayleigh_friction_damps_top_heats(setup):
    g, ptop, ak, bk, ic = setup
    cfg = DynConfig(npx=N + 1, npz=K, dt=600.0, tau=1.0, rf_cutoff=800.0e2)
    akn, bkn = np.asarray(ak), np.asarray(bk)
    pm = ((akn[1:] + akn[:-1]) + (bkn[1:] + bkn[:-1]) * 1.0e5) * 0.5
    u = jnp.asarray(ic["u"])
    v = jnp.asarray(ic["v"])
    pt = jnp.full(ic["delp"].shape, 250.0)
    u2, v2, _, pt2, _ = rayleigh_friction(u, v, None, pt, None, pm, cfg,
                                          ptop, g, hydrostatic=True)
    damped = pm < cfg.rf_cutoff
    assert damped.any() and not damped.all()
    ed = np.abs(np.asarray(u2) - np.asarray(u))
    # damped levels shrink the wind; below-cutoff levels untouched
    assert ed[:, damped].max() > 0.0
    np.testing.assert_array_equal(ed[:, ~damped], 0.0)
    amp = np.abs(np.asarray(u))
    assert (np.abs(np.asarray(u2)) <= amp + 1e-12).all()
    # kinetic energy loss appears as heat, only in damped levels
    dpt = np.asarray(pt2 - pt)
    assert dpt[:, damped].max() > 0.0
    np.testing.assert_array_equal(dpt[:, ~damped], 0.0)
    assert dpt.min() >= 0.0


def test_rayleigh_friction_nh_delz_scaling(setup):
    g, ptop, ak, bk, ic = setup
    cfg = DynConfig(npx=N + 1, npz=K, dt=600.0, tau=0.5, rf_cutoff=800.0e2)
    akn, bkn = np.asarray(ak), np.asarray(bk)
    pm = ((akn[1:] + akn[:-1]) + (bkn[1:] + bkn[:-1]) * 1.0e5) * 0.5
    u = jnp.asarray(ic["u"])
    v = jnp.asarray(ic["v"])
    shp = ic["delp"].shape
    pt = jnp.full(shp, 250.0)
    w = jnp.full(shp, 1.0)
    delz = jnp.full(shp, -300.0)
    u2, v2, w2, pt2, dz2 = rayleigh_friction(u, v, w, pt, delz, pm, cfg,
                                             ptop, g, hydrostatic=False)
    damped = pm < cfg.rf_cutoff
    # w damped toward zero in the sponge; delz rescaled with pt
    assert (np.asarray(w2)[:, damped] < 1.0).all()
    np.testing.assert_allclose(np.asarray(dz2 / delz),
                               np.asarray(pt2 / pt), rtol=1e-12)
