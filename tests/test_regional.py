"""Regional (limited-area) mode: zero-gradient pads + Davies lateral BC
relaxation (fv_regional_bc.F90 analog — SURVEY.md component #20).

Verification strategy: run a doubly-periodic parent domain, carve a
limited-area subdomain out of it, drive the regional run with BC
snapshots taken from the parent, and require the regional interior to
track the parent solution (the BC machinery is exact when the BC data
come from the truth)."""

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops_dp
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_nh
from gfdl_atmos_cubed_sphere_tpu.model.fv_regional_bc import (
    RegionalBCConfig, RegionalBCSchedule, blend_weight_2d, carve_subdomain,
    extract_bc_snapshot, make_blend_masks, set_regional_BCs)
from gfdl_atmos_cubed_sphere_tpu.driver.regional import (
    RegionalRun, build_grid_ops_regional)
from gfdl_atmos_cubed_sphere_tpu.init.doubly_periodic import supercell_init

NP, NR, K = 32, 16, 12


def test_regional_halo_shapes():
    g = build_grid_ops_regional(8, 1e3, 1e3, dtype=jnp.float64)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 8, 8)))
    qp = g.halo.pad_cell(q)
    assert qp.shape == (1, 3, 14, 14)
    # zero-gradient: ghost rows replicate the outermost interior row
    np.testing.assert_array_equal(qp[..., 0, 3:-3], q[..., 0, :])
    np.testing.assert_array_equal(qp[..., 3:-3, -1], q[..., :, -1])
    u = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 9, 8)))
    v = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 8, 9)))
    up, vp = g.halo.pad_dgrid(u, v)
    assert up.shape == (1, 3, 15, 14) and vp.shape == (1, 3, 14, 15)
    c = jnp.asarray(np.random.default_rng(3).normal(size=(1, 3, 9, 9)))
    assert g.halo.pad_corner(c).shape == (1, 3, 15, 15)


def test_blend_weights():
    w = np.asarray(blend_weight_2d((10, 10), 3, ("c", "c")))
    assert w.max() <= 1.0 and w.min() == 0.0
    assert w[0, 5] > w[1, 5] > w[2, 5]   # decays inward
    assert w[5, 5] == 0.0                # interior untouched
    ww = np.asarray(blend_weight_2d((11, 10), 3, ("w", "c")))
    assert ww[0, 5] == 1.0               # wall point pinned to BC


def test_set_regional_bcs_exactness():
    """With BC == state the blend is a no-op; frac interpolates linearly."""
    masks = make_blend_masks(RegionalBCConfig(n=8, nrows_blend=3),
                             dtype=np.float64)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 2, 8, 8)))
    st = {"delp": q}
    same = set_regional_BCs(st, {"delp": q}, {"delp": q}, 0.3, masks)
    np.testing.assert_allclose(np.asarray(same["delp"]), np.asarray(q))
    b0 = {"delp": q * 0.0}
    b1 = {"delp": q * 2.0}
    mid = set_regional_BCs(st, b0, b1, 0.5, masks)
    # at frac=0.5 target == q, so blend is identity again
    np.testing.assert_allclose(np.asarray(mid["delp"]), np.asarray(q),
                               rtol=1e-12)


def test_regional_tracks_parent():
    gp = build_grid_ops_dp(NP, 2.0e3, 2.0e3, dtype=jnp.float64)
    ic = supercell_init(gp, K, bubble_dtheta=3.0, shear_u=5.0)
    gp.phis_p = gp.halo.pad_cell(jnp.asarray(ic["phis"], jnp.float64))
    dp0 = np.asarray(ic["delp"])[0, :, 0, 0]
    ptop = 1.0e5 - float(dp0.sum())
    pe0 = np.concatenate([[ptop], ptop + np.cumsum(dp0)])
    bk = (pe0 - pe0[0]) / (pe0[-1] - pe0[0])
    ak = pe0[0] * (1.0 - bk)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    dt = 16.0
    cfgp = DynConfig(npx=NP + 1, npz=K, dt=dt, n_split=8, hydrostatic=False)

    def pstep(st):
        r = fv_dynamics_nh(st["delp"], st["pt"], st["u"], st["v"], st["w"],
                           st["delz"], None, gp, cfgp, akj, bkj, ptop, dp0)
        return {k: getattr(r, k) for k in
                ("delp", "pt", "u", "v", "w", "delz")}

    pstepj = jax.jit(pstep)
    st = {k: jnp.asarray(ic[k], jnp.float64)
          for k in ("delp", "pt", "u", "v", "w", "delz")}

    # parent trajectory + BC snapshots every parent step
    nsteps = 4
    j0 = i0 = (NP - NR) // 2
    snaps = [extract_bc_snapshot(carve_subdomain(st, j0, i0, NR))]
    parent_traj = [st]
    for _ in range(nsteps):
        st = pstepj(st)
        parent_traj.append(st)
        snaps.append(extract_bc_snapshot(carve_subdomain(st, j0, i0, NR)))

    # regional run over the carved subdomain, BCs from the parent
    gr = build_grid_ops_regional(NR, 2.0e3, 2.0e3, dtype=jnp.float64)
    phis_r = carve_subdomain({"phis": jnp.asarray(ic["phis"], jnp.float64)},
                             j0, i0, NR)["phis"]
    gr.phis_p = gr.halo.pad_cell(phis_r)
    cfgr = DynConfig(npx=NR + 1, npz=K, dt=dt, n_split=8, hydrostatic=False)
    sched = RegionalBCSchedule(
        RegionalBCConfig(n=NR, nrows_blend=4, bc_update_interval=dt), snaps)
    run = RegionalRun(gr, cfgr, sched, ak, bk, ptop, dp0, nrows_blend=4)

    rst = carve_subdomain(parent_traj[0], j0, i0, NR)
    rst, t = run.advance(rst, 0.0, nsteps)

    truth = carve_subdomain(parent_traj[-1], j0, i0, NR)
    # deep-interior agreement (blend zone + a couple of influence rows off)
    c = slice(6, NR - 6)
    for name, scale in (("pt", 300.0), ("w", 1.0), ("delp", 1e4)):
        d = float(jnp.abs(rst[name][..., c, c] - truth[name][..., c, c]).max())
        assert d / scale < 2e-3, (name, d)
        assert not bool(jnp.isnan(rst[name]).any()), name
