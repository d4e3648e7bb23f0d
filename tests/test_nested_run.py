"""Concurrent nested-grid execution (driver/nested.py): the TPU-native pod
for the reference's multi-grid nesting (fv_control.F90:364-478 concurrent
pelists, fv_nesting.F90 setup_nested_grid_BCs:76, twoway_nesting:2219),
on the doubly-periodic plane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops_dp
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.boundary import PlanarNest
from gfdl_atmos_cubed_sphere_tpu.driver.nested import NestedPlanarRun
from gfdl_atmos_cubed_sphere_tpu.init.doubly_periodic import supercell_init

NPAR, K, R = 32, 12, 2
NN = 24                       # nest covers parent cells [10, 22)
OJ = OI = 10
DX = 4.0e3


def _setup(two_way):
    gp = build_grid_ops_dp(NPAR, DX, DX, dtype=jnp.float64, deglat=0.0)
    gn = build_grid_ops_dp(NN, DX / R, DX / R, dtype=jnp.float64,
                           deglat=0.0)
    ic = supercell_init(gp, K, bubble_dtheta=3.0, shear_u=0.0)
    gp.phis_p = gp.halo.pad_cell(jnp.zeros((1, NPAR, NPAR)))
    gn.phis_p = gn.halo.pad_cell(jnp.zeros((1, NN, NN)))
    dp0 = np.asarray(ic["delp"])[0, :, 0, 0]
    ptop = 1.0e5 - float(dp0.sum())
    pe0 = np.concatenate([[ptop], ptop + np.cumsum(dp0)])
    bk = (pe0 - pe0[0]) / (pe0[-1] - pe0[0])
    ak = pe0[0] * (1.0 - bk)
    dcfg = dict(npz=K, hydrostatic=False, d2_bg_k1=0.0, d2_bg_k2=0.0,
                dddmp=0.0, d2_bg=0.0)
    cfg_p = DynConfig(npx=NPAR + 1, dt=30.0, n_split=6, **dcfg)
    cfg_n = DynConfig(npx=NN + 1, dt=15.0, n_split=6, **dcfg)
    nest = PlanarNest(R, offset_j=OJ, offset_i=OI, n_nest=NN)
    run = NestedPlanarRun(gp, gn, cfg_p, cfg_n, nest, ak, bk, ptop, dp0,
                          two_way=two_way)
    pstate = {k: jnp.asarray(ic[k], jnp.float64)
              for k in ("delp", "pt", "u", "v", "w", "delz")}
    return run, pstate


def test_one_way_nest_tracks_parent_updraft():
    """The nest (bubble fully inside it) develops the same updraft as the
    parent sees at coarse resolution; lateral BC blending keeps it stable
    and NaN-free."""
    run, pstate = _setup(two_way=False)
    nstate = run.init_nest_from_parent(pstate)
    for _ in range(6):                      # 3 minutes
        pstate, nstate = run.step(pstate, nstate)
    for k, a in nstate.items():
        assert not bool(jnp.isnan(a).any()), k
    wp = float(pstate["w"].max())
    wn = float(nstate["w"].max())
    assert wp > 0.2                          # bubble updraft formed
    # nest resolves the same updraft (allow resolution difference)
    assert 0.5 * wp < wn < 3.0 * wp, (wp, wn)
    # updraft centered where the bubble is (parent center -> nest center)
    idx = jnp.unravel_index(jnp.argmax(nstate["w"][0]), nstate["w"][0].shape)
    cy, cx = int(idx[1]), int(idx[2])
    assert abs(cy - (16 - OJ) * R) <= 6 and abs(cx - (16 - OI) * R) <= 6


def test_two_way_feedback_keeps_parent_consistent():
    run, pstate = _setup(two_way=True)
    nstate = run.init_nest_from_parent(pstate)
    m0 = float(jnp.sum(pstate["delp"]))
    for _ in range(4):
        pstate, nstate = run.step(pstate, nstate)
    for k, a in pstate.items():
        assert not bool(jnp.isnan(a).any()), k
    # feedback perturbs parent mass only at interpolation/feedback level
    m1 = float(jnp.sum(pstate["delp"]))
    assert abs(m1 - m0) / m0 < 1e-3
    # parent w inside the nest footprint reflects the nest solution
    win = pstate["w"][0, :, OJ:OJ + NN // R, OI:OI + NN // R]
    assert float(win.max()) > 0.1
