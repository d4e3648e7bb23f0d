"""Moist (virtual-temperature) path, total-energy fixer, Rayleigh sponge.

Mirrors fv_dynamics.F90:373-399 (zvir), fv_mapz.F90:644-772 (consv_te
fixer) and Rayleigh_Super:953 (ideal-case sponge).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu import constants as con
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model import thermodynamics as thermo
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
    fv_dynamics_hydro, rayleigh_super)
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

NPX, NPZ = 25, 10


@pytest.fixture(scope="module")
def moist_setup():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True, moist=True)
    prepare_phis(g, ic["phis"])
    return g, ic, ptop, ak, bk


def _run(g, ic, ptop, ak, bk, cfg, nsteps=4):
    akj = jnp.asarray(ak, jnp.float64)
    bkj = jnp.asarray(bk, jnp.float64)

    def step(delp, pt, u, v, qs):
        r = fv_dynamics_hydro(delp, pt, u, v, {"sphum": qs}, g, cfg,
                              akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v, r.q["sphum"]

    stepj = jax.jit(step)
    st = [jnp.asarray(ic[k], jnp.float64) for k in ("delp", "pt", "u", "v")]
    st.append(jnp.asarray(ic["sphum"], jnp.float64))
    for _ in range(nsteps):
        st = list(stepj(*st))
    return st


def test_moist_virtual_temperature_path(moist_setup):
    g, ic, ptop, ak, bk = moist_setup
    cfg = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=2, adiabatic=False)
    st = _run(g, ic, ptop, ak, bk, cfg)
    for a in st:
        assert not bool(jnp.isnan(a).any())
    # temperature stays physical, moisture bounded by its initial range
    assert 150.0 < float(st[1].min()) and float(st[1].max()) < 350.0
    assert float(st[4].min()) >= -1e-12
    assert float(st[4].max()) <= float(jnp.max(jnp.asarray(ic["sphum"]))) * 1.001


def test_energy_fixer_restores_te(moist_setup):
    """With consv_te = 1, the post-step total energy must match the entry
    energy much more closely than without the fixer."""
    g, ic, ptop, ak, bk = moist_setup

    def te_of(st, q):
        delp, pt, u, v = st[:4]
        pe = ptop + jnp.cumsum(delp, axis=1)
        pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
        peln = jnp.log(pe)
        tv = pt * (1.0 + thermo.ZVIR * q)
        te = thermo.total_energy_2d_hydro(u, v, tv, delp, peln, pe,
                                          g.phis_p[..., 3:-3, 3:-3], g)
        return float(thermo.g_mean(te, g))

    st0 = [jnp.asarray(ic[k], jnp.float64) for k in ("delp", "pt", "u", "v")]
    q0 = jnp.asarray(ic["sphum"], jnp.float64)
    te_in = te_of(st0, q0)

    cfg_fix = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=2,
                        adiabatic=False, consv_te=1.0, d_con=0.0)
    st_fix = _run(g, ic, ptop, ak, bk, cfg_fix, nsteps=8)
    te_fix = te_of(st_fix, st_fix[4])

    cfg_no = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=2,
                       adiabatic=False, consv_te=0.0)
    st_no = _run(g, ic, ptop, ak, bk, cfg_no, nsteps=8)
    te_no = te_of(st_no, st_no[4])

    err_fix = abs(te_fix - te_in) / abs(te_in)
    err_no = abs(te_no - te_in) / abs(te_in)
    assert err_fix < err_no * 0.2, (err_fix, err_no)
    assert err_fix < 1e-6


def test_rayleigh_super_profile():
    """rf damping only above the cutoff, relaxing toward the reference jet."""
    K = 10
    ks, ptop, ak, bk = set_eta(K)
    cfg = DynConfig(npx=NPX, npz=K, dt=600.0, n_split=2, tau=5.0,
                    rf_cutoff=50.0e2)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(6, K, 25, 24)))
    v = jnp.asarray(rng.normal(size=(6, K, 24, 25)))
    u0 = jnp.zeros_like(u)
    v0 = jnp.zeros_like(v)
    un, vn, _ = rayleigh_super(u, v, None, u0, v0, ak, bk, cfg, ptop)
    pf = ((ak[1:] + ak[:-1]) + (bk[1:] + bk[:-1]) * 1e5) * 0.5
    for k in range(K):
        damped = float(jnp.abs(un[:, k]).max()) < float(jnp.abs(u[:, k]).max())
        if pf[k] < cfg.rf_cutoff * 0.8:
            assert damped, k
        elif pf[k] > cfg.rf_cutoff:
            assert float(jnp.abs(un[:, k] - u[:, k]).max()) == 0.0
