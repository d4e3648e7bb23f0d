"""Reed-Jablonowski TC case (reference cases 55-57)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_hydro
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.tc_vortex import (
    tc_vortex, P00, DP_V, CEN_LAT)

N, K = 24, 20


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(K)
    return g, ak, bk, ptop


def test_tc_structure(setup):
    g, ak, bk, ptop = setup
    ic = tc_vortex(g.geom, K, ak, bk, ptop)
    # central depression of the right depth
    # (abs tol: at C24 the nearest cell center sits ~100 km off-center)
    assert float(np.min(ic["ps"])) == pytest.approx(P00 - DP_V, abs=100.0)
    assert float(np.max(ic["ps"])) == pytest.approx(P00, abs=1.0)
    # cyclonic low-level winds of RJ magnitude (~20 m/s max at z~1.5 km)
    vmax = max(np.abs(ic["u"]).max(), np.abs(ic["v"]).max())
    assert 10.0 < vmax < 40.0, vmax
    # warm moist tropical sounding
    assert 0.015 < ic["sphum"][0, -1].max() <= 0.022
    assert ic["pt"].min() > 180.0 and ic["pt"].max() < 310.0
    assert np.all(ic["delz"] < 0.0)
    # environment-only variant (case 56): no winds, flat ps
    env = tc_vortex(g.geom, K, ak, bk, ptop, vortex=False)
    assert float(np.abs(env["u"]).max()) == 0.0
    assert float(np.ptp(env["ps"])) < 1.0e-9
    # f-plane variant (case 57) returns the center Coriolis parameter
    fp = tc_vortex(g.geom, K, ak, bk, ptop, f_plane=True)
    assert fp["cor"] == pytest.approx(2 * g.geom.omega * np.sin(CEN_LAT))


def test_tc_stable_run(setup):
    """The balanced vortex survives 1 h of moist hydrostatic dynamics: no
    NaN, depression intact, winds bounded (test_cases.F90 case-55 intent)."""
    g, ak, bk, ptop = setup
    ic = tc_vortex(g.geom, K, ak, bk, ptop)
    prepare_phis(g, jnp.asarray(ic["phis"]))
    cfg = DynConfig(npx=N + 1, npz=K, dt=600.0, n_split=5, adiabatic=False)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)

    def step(delp, pt, u, v, qs):
        r = fv_dynamics_hydro(delp, pt, u, v, {"sphum": qs}, g, cfg,
                              akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v, r.q["sphum"]

    stepj = jax.jit(step)
    s = tuple(jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v", "sphum"))
    for _ in range(6):
        s = stepj(*s)
    delp, pt, u, v, qs = s
    assert not bool(jnp.isnan(pt).any())
    ps = ptop + np.asarray(delp).sum(axis=1)
    assert ps.min() < P00 - 0.5 * DP_V          # depression persists
    assert float(jnp.abs(u).max()) < 80.0
    assert float(qs.min()) >= 0.0
