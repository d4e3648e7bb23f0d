"""Full-step shard_map parity (hydro/NH/SW/hybrid) — split from
test_shard_halo.py so each file fits a 10-minute CI budget (round-3
VERDICT item 7). Compile-dominated: ~2 min per test on a 4-CPU host."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.parallel.shard_halo import (
    ShardHalo, shard_step, tile_mesh, localize_g)

N = 12
H = 3


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 6:
        pytest.skip("needs >= 6 devices")
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    return g, tile_mesh()


def test_hydro_step_parity(setup):
    """Full 3-D hydrostatic fv_dynamics steps (JW wave, with a tracer) run
    tile-parallel inside shard_map and match the single-array mode."""
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
        fv_dynamics_hydro)
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    g, mesh = setup
    K = 10
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, ak, bk, ptop, moist=True)
    prepare_phis(g, jnp.asarray(ic["phis"]))
    cfg = DynConfig(npx=N + 1, npz=K, dt=900.0, n_split=4, adiabatic=False,
                    q_split=2)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)

    def dyn(gl, delp, pt, u, v, qs):
        r = fv_dynamics_hydro(delp, pt, u, v, {"sphum": qs}, gl, cfg,
                              akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v, r.q["sphum"]

    step_s = jax.jit(shard_step(g, dyn, mesh=mesh))
    step_r = jax.jit(lambda *s: dyn(g, *s))
    s0 = tuple(jnp.asarray(ic[k])
               for k in ("delp", "pt", "u", "v", "sphum"))
    ss, sr = s0, s0
    for _ in range(3):
        ss = step_s(*ss)
        sr = step_r(*sr)
    for a, b, name in zip(ss, sr, ("delp", "pt", "u", "v", "q")):
        scale = float(jnp.abs(b).max())
        diff = float(jnp.abs(a - b).max())
        assert diff <= 1e-11 * max(scale, 1.0), (name, diff, scale)
    assert not bool(jnp.isnan(ss[1]).any())


def test_nh_step_parity(setup):
    """Nonhydrostatic fv_dynamics (SIM1 Riemann solver, update_dz, dual
    pressure gradient) tile-parallel vs single-array, adaptive tracer
    subcycling (pmax path)."""
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_nh
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    g, mesh = setup
    K = 10
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, ak, bk, ptop, moist=True)
    prepare_phis(g, jnp.asarray(ic["phis"]))
    cfg = DynConfig(npx=N + 1, npz=K, dt=600.0, n_split=4, adiabatic=False,
                    hydrostatic=False, q_split=0)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    dp0 = np.asarray(ic["delp"])[0, :, 0, 0]

    def dyn(gl, delp, pt, u, v, w, delz, qs):
        r = fv_dynamics_nh(delp, pt, u, v, w, delz, {"sphum": qs}, gl, cfg,
                           akj, bkj, ptop, dp0)
        return r.delp, r.pt, r.u, r.v, r.w, r.delz, r.q["sphum"]

    step_s = jax.jit(shard_step(g, dyn, mesh=mesh))
    step_r = jax.jit(lambda *s: dyn(g, *s))
    s0 = tuple(jnp.asarray(ic[k])
               for k in ("delp", "pt", "u", "v", "w", "delz", "sphum"))
    ss, sr = s0, s0
    for _ in range(2):
        ss = step_s(*ss)
        sr = step_r(*sr)
    for a, b, name in zip(ss, sr,
                          ("delp", "pt", "u", "v", "w", "delz", "q")):
        scale = float(jnp.abs(b).max())
        diff = float(jnp.abs(a - b).max())
        assert diff <= 1e-10 * max(scale, 1.0), (name, diff, scale)
    assert not bool(jnp.isnan(ss[4]).any())


def test_sw_step_parity(setup):
    """A full shallow-water case-2 day, entire step inside shard_map (scan
    acoustic loop — safe under shard_map unlike GSPMD), must match the
    single-array mode to roundoff."""
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import (
        SWConfig, make_sw_step, prepare_phis)
    from gfdl_atmos_cubed_sphere_tpu.init import sw_cases
    g, mesh = setup
    ic = sw_cases.case2(g.geom)
    prepare_phis(g, ic["phis"])
    cfg = SWConfig(npx=N + 1, dt=1800.0, n_split=4)

    step_ref = jax.jit(make_sw_step(g, cfg))

    def fn(gl, d, u, v):
        return make_sw_step(gl, cfg)(d, u, v, None, None)

    step_shard = jax.jit(shard_step(g, fn, mesh=mesh))

    d, u, v = map(jnp.asarray, (ic["delp"], ic["u"], ic["v"]))
    dr, ur, vr = d, u, v
    ds, us, vs = d, u, v
    for _ in range(8):
        dr, ur, vr = step_ref(dr, ur, vr, None, None)
        ds, us, vs = step_shard(ds, us, vs)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(dr),
                               rtol=0.0, atol=1e-9 * 3.0e4)
    np.testing.assert_allclose(np.asarray(us), np.asarray(ur),
                               rtol=0.0, atol=1e-7)
    assert not bool(jnp.isnan(ds).any())


def test_hybrid_tile_yx_mesh_matches_single_device():
    """Manual-tile + auto-(y,x) hybrid decomposition (shard_halo.shard_step
    on a hybrid_mesh): the reference's intra-tile layout decomposition
    (fv_mp_mod.F90:386-413). Cross-tile rotated halos ride ppermute; XLA's
    SPMD partitioner splits each tile's interior over x. Must match the
    single-device step to f64 roundoff."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_hydro
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    from gfdl_atmos_cubed_sphere_tpu.parallel.shard_halo import (
        shard_step, hybrid_mesh)

    if len(jax.devices()) < 12:
        pytest.skip("needs 12 devices")

    npx, npz = 13, 10
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop)
    prepare_phis(g, ic["phis"])
    cfg = DynConfig(npx=npx, npz=npz, dt=120.0, n_split=2, use_scan=False)
    akj = jnp.asarray(ak, jnp.float64)
    bkj = jnp.asarray(bk, jnp.float64)

    def dyn(gl, delp, pt, u, v):
        r = fv_dynamics_hydro(delp, pt, u, v, None, gl, cfg, akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v

    args = tuple(jnp.asarray(ic[k], jnp.float64)
                 for k in ("delp", "pt", "u", "v"))
    ref = jax.jit(lambda *a: dyn(g, *a))(*args)
    step = jax.jit(shard_step(g, dyn, mesh=hybrid_mesh(ly=1, lx=2)))
    out = step(*args)
    for r, o, name in zip(ref, out, ("delp", "pt", "u", "v")):
        d = float(jnp.abs(r - o).max())
        rel = d / max(1.0, float(jnp.abs(r).max()))
        assert rel < 1e-12, (name, d, rel)
