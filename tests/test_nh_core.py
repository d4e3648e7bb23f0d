"""Nonhydrostatic core (ops/nh_core.py, model dyn_core_nh/fv_dynamics_nh).

Mirrors the reference CI's `nh` build checks (SURVEY.md §4): the SIM1
column solver preserves an exactly hydrostatically balanced state, and the
C96-style nonhydrostatic JW baroclinic wave runs stably and stays close to
the hydrostatic solution at large scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu import constants as con
from gfdl_atmos_cubed_sphere_tpu.ops import nh_core
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
    fv_dynamics_hydro, fv_dynamics_nh)
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

NPX, NPZ = 25, 10


def test_sim1_preserves_hydrostatic_balance():
    """A balanced column (nonhydro pressure perturbation == 0, w == 0) is a
    fixed point of SIM1 (nh_utils.F90 SIM1_solver)."""
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    K = 16
    rng = np.random.default_rng(3)
    B = (2, 3, 4)
    delp = jnp.asarray(rng.uniform(2e3, 8e3, B + (K,)).cumsum(-1) * 0 +
                       rng.uniform(2e3, 8e3, B + (K,)))
    delp = jnp.moveaxis(delp, -1, 1)            # -> [2, K, 3, 4]-ish
    delp = jnp.asarray(rng.uniform(2e3, 8e3, (2, K, 3, 4)))
    ptop = 100.0
    pem = ptop + jnp.concatenate(
        [jnp.zeros_like(delp[:, :1]), jnp.cumsum(delp, axis=1)], axis=1)
    pm2 = delp / (jnp.log(pem[:, 1:]) - jnp.log(pem[:, :-1]))
    # pick theta (normalized) arbitrarily; choose dz for exact balance:
    # (-dm/dz * R * pt)^(1/(1-kappa)) == pm  =>  dz = -dm*R*pt*pm^(kappa-1)
    pt = jnp.asarray(rng.uniform(5.0, 10.0, (2, K, 3, 4)))
    dm = delp / con.GRAV
    dz = -dm * con.RDGAS * pt * pm2 ** (akap - 1.0)
    w = jnp.zeros_like(delp)
    ws = jnp.zeros_like(delp[:, 0])

    pe2, w2, dz2 = nh_core.sim1_solver(30.0, dm, pm2, pem, w, dz, pt, ws,
                                       gama, akap, 0.05)
    assert float(jnp.abs(pe2).max()) / float(pem.max()) < 1e-12
    assert float(jnp.abs(w2).max()) < 1e-10
    assert float(jnp.abs((dz2 - dz) / dz).max()) < 1e-12


@pytest.fixture(scope="module")
def nh_setup():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    dp0 = np.diff(ak) + np.diff(bk) * 1.0e5
    return g, ic, ptop, ak, bk, dp0


def test_nh_baroclinic_stable_and_close_to_hydro(nh_setup):
    g, ic, ptop, ak, bk, dp0 = nh_setup
    cfg = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=4,
                    hydrostatic=False)
    akj = jnp.asarray(ak, jnp.float64)
    bkj = jnp.asarray(bk, jnp.float64)
    st = {k: jnp.asarray(ic[k], jnp.float64)
          for k in ("delp", "pt", "u", "v", "w", "delz")}

    def step_nh(delp, pt, u, v, w, delz):
        r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg, akj, bkj,
                           ptop, dp0)
        return r.delp, r.pt, r.u, r.v, r.w, r.delz

    def step_h(delp, pt, u, v):
        r = fv_dynamics_hydro(delp, pt, u, v, None, g, cfg, akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v

    nh = (st["delp"], st["pt"], st["u"], st["v"], st["w"], st["delz"])
    hy = (st["delp"], st["pt"], st["u"], st["v"])
    jn = jax.jit(step_nh)
    jh = jax.jit(step_h)
    for _ in range(6):
        nh = jn(*nh)
        hy = jh(*hy)

    for a in nh:
        assert not bool(jnp.isnan(a).any())
    # w stays physically small for this quasi-hydrostatic flow
    assert float(jnp.abs(nh[4]).max()) < 5.0
    # delz stays negative (monotone heights held)
    assert float(nh[5].max()) < 0.0
    # large-scale agreement with the hydrostatic solution
    du = float(jnp.abs(nh[2] - hy[2]).max())
    assert du < 2.0, f"NH/hydro u drift too large: {du}"
    dpt = float(jnp.abs(nh[1] - hy[1]).max())
    assert dpt < 2.0, f"NH/hydro pt drift too large: {dpt}"


def _balanced_column(K=32, T0=260.0):
    """Smooth hydrostatically balanced column on the L{K} eta levels."""
    akap = con.KAPPA
    ks, ptop, ak, bk = set_eta(K)
    ps = 1.0e5
    pe = ak + bk * ps                       # [K+1]
    delp = jnp.asarray(np.diff(pe))[None, :, None, None] * jnp.ones((2, K, 3, 4))
    pem = ptop + jnp.concatenate(
        [jnp.zeros_like(delp[:, :1]), jnp.cumsum(delp, axis=1)], axis=1)
    pm2 = delp / (jnp.log(pem[:, 1:]) - jnp.log(pem[:, :-1]))
    # isothermal: pt such that the gas-law cell pressure equals pm2
    pt = jnp.full_like(delp, T0)
    dm = delp / con.GRAV
    dz = -dm * con.RDGAS * pt * pm2 ** (akap - 1.0)
    w = jnp.zeros_like(delp)
    ws = jnp.zeros_like(delp[:, 0])
    return dm, pm2, pem, w, dz, pt, ws


def test_sim3_near_balance():
    """SIM3p0/SIM3 (full-pressure profile reconstruction) hold a smooth
    balanced column to small w (the edge-profile fit is a different
    discretization than the hydrostatic sum, so not an exact fixed point
    like SIM1 -- nh_utils.F90 SIM3_solver:984)."""
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    dm, pm2, pem, w, dz, pt, ws = _balanced_column()
    for alpha in (1.0, 0.75):
        pe2, w2, dz2 = nh_core.sim3_solver(30.0, dm, pem, w, dz, pt, ws,
                                           gama, akap, 0.05, alpha=alpha)
        assert not bool(jnp.isnan(w2).any())
        # SIM3's full-pressure cubic profile fit is a different discrete
        # balance than the log-mean hydrostatic one, so (unlike SIM1) the
        # column is not an exact fixed point: the thin top layers accelerate
        # by O(10 m/s) and the misfit decays downward. Assert boundedness
        # and smallness away from the top (measured: 0.44 max at k>=12).
        assert float(jnp.abs(w2).max()) < 50.0
        assert float(jnp.abs(w2[:, 12:]).max()) < 1.0
        assert float(jnp.abs((dz2[:, 12:] - dz[:, 12:]) / dz[:, 12:]).max()) < 2e-3
        # perturbation pressure stays a tiny fraction of the surface pressure
        assert float(jnp.abs(pe2[:, 12:]).max()) / float(pem.max()) < 1e-3


def test_imp_diff_w_constant_and_smoothing():
    """imp_diff_w (nh_utils.F90:688): exact on constants matching the
    surface BC; otherwise smooths (reduces vertical variance)."""
    rng = np.random.default_rng(7)
    K = 24
    dz = jnp.asarray(-rng.uniform(200.0, 800.0, (2, K, 3, 4)))
    c = 1.7
    w_const = jnp.full((2, K, 3, 4), c)
    ws = jnp.full((2, 3, 4), c)
    out = nh_core.imp_diff_w(50.0, dz, ws, w_const)
    np.testing.assert_allclose(np.asarray(out), c, rtol=1e-12)

    w = jnp.asarray(rng.normal(0.0, 1.0, (2, K, 3, 4)))
    out = nh_core.imp_diff_w(200.0, dz, jnp.zeros((2, 3, 4)), w)
    v0 = float(jnp.var(w, axis=1).mean())
    v1 = float(jnp.var(out, axis=1).mean())
    assert v1 < v0


def test_riem3_dispatch_sim3_runs_nh_core(nh_setup):
    """Full NH step with a_imp=-1 (SIM3p0) and a_imp=-0.75 (SIM3) stays
    stable and near the SIM1 solution on the quasi-hydrostatic JW wave
    (nh_core.F90 dispatch :169-185)."""
    g, ic, ptop, ak, bk, dp0 = nh_setup
    akj = jnp.asarray(ak, jnp.float64)
    bkj = jnp.asarray(bk, jnp.float64)
    st = tuple(jnp.asarray(ic[k], jnp.float64)
               for k in ("delp", "pt", "u", "v", "w", "delz"))

    outs = {}
    for a_imp in (1.0, -1.0, -0.75):
        cfg = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=4,
                        hydrostatic=False, a_imp=a_imp, d2bg_zq=0.01)

        def step(delp, pt, u, v, w, delz, cfg=cfg):
            r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg,
                               akj, bkj, ptop, dp0)
            return r.delp, r.pt, r.u, r.v, r.w, r.delz

        s = st
        jstep = jax.jit(step)
        for _ in range(4):
            s = jstep(*s)
        for a in s:
            assert not bool(jnp.isnan(a).any())
        outs[a_imp] = s

    for a_imp in (-1.0, -0.75):
        dw = float(jnp.abs(outs[a_imp][4] - outs[1.0][4]).max())
        du = float(jnp.abs(outs[a_imp][2] - outs[1.0][2]).max())
        assert dw < 1.0, f"a_imp={a_imp}: w drift {dw}"
        assert du < 1.0, f"a_imp={a_imp}: u drift {du}"


def test_rim_2d_balanced_fixed_point():
    """RIM_2D (nh_utils.F90:751): a balanced column (gas-law pressure ==
    layer-mean pressure, w == 0) has zero Riemann invariants, so it is an
    exact fixed point for any ms, including the 1<ms<8 thick-top pre-pass."""
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    dm, pm2, pem, w, dz, pt, ws = _balanced_column()
    for ms in (1, 4, 8):
        pe2, w2, dz2 = nh_core.rim_2d_solver(ms, 30.0, dm, pm2, w, dz, pt,
                                             ws, gama, akap)
        assert float(jnp.abs(pe2).max()) / float(pem.max()) < 1e-12, ms
        assert float(jnp.abs(w2).max()) < 1e-10, ms
        assert float(jnp.abs((dz2 - dz) / dz).max()) < 1e-12, ms


def test_rim_2d_momentum_budget_and_sim1_agreement():
    """Perturbed column: (a) ms=1 explicit update conserves the column
    momentum budget exactly (sum dm*dw == bdt * bottom pressure increment,
    telescoping of the interface impulses pbar with pbar(1)=0); (b) on a
    vertically well-resolved perturbation the explicit increments agree
    with SIM1 to a few percent (the schemes differ at leading order only
    through their interface-pressure reconstructions, which converge for
    smooth columns)."""
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    dm, pm2, pem, w, dz, pt, ws = _balanced_column()
    kk = np.arange(dz.shape[1])
    w = w + jnp.asarray(0.2 * np.sin(2 * np.pi * kk / 24.0)
                        )[None, :, None, None] * jnp.ones_like(w)
    dzp = dz * (1.0 + 0.002 * jnp.asarray(
        np.cos(2 * np.pi * kk / 24.0))[None, :, None, None])

    bdt = 20.0
    pe2, w2, dz2 = nh_core.rim_2d_solver(1, bdt, dm, pm2, w, dzp, pt, ws,
                                         gama, akap)
    lhs = np.asarray(jnp.sum(dm * (w2 - w), axis=1))
    rhs = np.asarray(bdt * pe2[:, -1])
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-8)

    bdt = 0.5
    pe2, w2, dz2 = nh_core.rim_2d_solver(1, bdt, dm, pm2, w, dzp, pt, ws,
                                         gama, akap)
    pe2s, w2s, dz2s = nh_core.sim1_solver(bdt, dm, pm2, pem, w, dzp, pt,
                                          ws, gama, akap, 0.05)
    dw_r = float(jnp.abs(w2 - w2s).max())
    dw_s = float(jnp.abs(w2s - w).max())
    assert dw_r < 0.05 * dw_s, (dw_r, dw_s)
    np.testing.assert_allclose(np.asarray(dz2), np.asarray(dz2s),
                               rtol=1e-2)


def test_rim_2d_c_core_and_dispatch():
    """c_core=True leaves w untouched (Riem_Solver_C usage,
    nh_utils.F90:454); riem_solver3 dispatches |a_imp|<=0.5 to RIM_2D with
    ms substeps and returns finite fields."""
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    dm, pm2, pem, w, dz, pt, ws = _balanced_column()
    w = w + 0.1
    pe2, w2, dz2 = nh_core.rim_2d_solver(3, 30.0, dm, pm2, w, dz, pt, ws,
                                         gama, akap, c_core=True)
    assert w2 is w

    K = dz.shape[1]
    delp = dm * con.GRAV
    zs = jnp.zeros_like(w[:, 0])
    incr = jnp.cumsum(dz[:, ::-1], axis=1)[:, ::-1]
    zh = jnp.concatenate([zs[:, None] - incr, zs[:, None]], axis=1)
    r = nh_core.riem_solver3(30.0, delp, pt, w, zh, zs, ws, akap,
                             float(pem[0, 0, 0, 0]), 0.05, a_imp=0.4, ms=2)
    for a in (r.w, r.delz, r.ppe, r.pk3):
        assert not bool(jnp.isnan(a).any())


def test_use_logp_variant(nh_setup):
    """use_logp=True (fv_arrays.F90 use_logp; dyn_core.F90 pk3 <- peln
    branch): the NH pressure gradient differentiates log-p interfaces
    instead of p**kappa. The two variants must both be stable and agree
    closely on a smooth baroclinic state (same continuous equations,
    different discretization) while being genuinely different paths."""
    g, ic, ptop, ak, bk, dp0 = nh_setup
    akj = jnp.asarray(ak, jnp.float64)
    bkj = jnp.asarray(bk, jnp.float64)
    st = tuple(jnp.asarray(ic[k], jnp.float64)
               for k in ("delp", "pt", "u", "v", "w", "delz"))

    outs = {}
    for use_logp in (False, True):
        cfg = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=2,
                        hydrostatic=False, use_logp=use_logp)

        def step(delp, pt, u, v, w, delz):
            r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg,
                               akj, bkj, ptop, dp0)
            return r.delp, r.pt, r.u, r.v, r.w, r.delz

        out = jax.jit(step)(*st)
        for a in out:
            assert not bool(jnp.isnan(a).any())
        outs[use_logp] = out

    du = float(jnp.abs(outs[True][2] - outs[False][2]).max())
    u_scale = float(jnp.abs(outs[False][2]).max())
    assert du > 0.0, "use_logp had no effect on the NH p-grad"
    assert du < 0.05 * u_scale, (du, u_scale)
