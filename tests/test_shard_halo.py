"""shard_map + ppermute halo backend vs the single-array gather halo."""

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


def _run_halo_op(g, mesh, fn, *args):
    return shard_step(g, fn, mesh=mesh)(*args)


def test_pad_cell_corner_parity(setup):
    g, mesh = setup
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(6, 4, N, N)))
    ref = g.halo.pad_cell(q)
    out = _run_halo_op(g, mesh, lambda gl, x: gl.halo.pad_cell(x), q)
    _, _, _, valid = g.geom.topology.cell_halo_spec(H)
    m = jnp.asarray(valid)[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(m, out, 0.0)),
                                  np.asarray(jnp.where(m, ref, 0.0)))

    qc = jnp.asarray(rng.normal(size=(6, 2, N + 1, N + 1)))
    refc = g.halo.pad_corner(qc)
    outc = _run_halo_op(g, mesh, lambda gl, x: gl.halo.pad_corner(x), qc)
    _, _, _, validc = g.geom.topology.corner_halo_spec(H)
    mc = jnp.asarray(validc)[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(mc, outc, 0.0)),
                                  np.asarray(jnp.where(mc, refc, 0.0)))


def test_pad_vector_parity(setup):
    g, mesh = setup
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(6, 3, N + 1, N)))
    v = jnp.asarray(rng.normal(size=(6, 3, N, N + 1)))
    ref_u, ref_v = g.halo.pad_dgrid(u, v)
    out_u, out_v = _run_halo_op(
        g, mesh, lambda gl, a, b: gl.halo.pad_dgrid(a, b), u, v)
    specs = g.geom.topology.vector_halo_spec(H, "D")
    mu = jnp.asarray(specs["u"]["valid"])[:, None]
    mv = jnp.asarray(specs["v"]["valid"])[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(mu, out_u, 0.0)),
                                  np.asarray(jnp.where(mu, ref_u, 0.0)))
    np.testing.assert_array_equal(np.asarray(jnp.where(mv, out_v, 0.0)),
                                  np.asarray(jnp.where(mv, ref_v, 0.0)))

    uc = jnp.asarray(rng.normal(size=(6, 3, N, N + 1)))
    vc = jnp.asarray(rng.normal(size=(6, 3, N + 1, N)))
    ref_uc, ref_vc = g.halo.pad_cgrid(uc, vc)
    out_uc, out_vc = _run_halo_op(
        g, mesh, lambda gl, a, b: gl.halo.pad_cgrid(a, b), uc, vc)
    specs = g.geom.topology.vector_halo_spec(H, "C")
    muc = jnp.asarray(specs["u"]["valid"])[:, None]
    mvc = jnp.asarray(specs["v"]["valid"])[:, None]
    np.testing.assert_array_equal(np.asarray(jnp.where(muc, out_uc, 0.0)),
                                  np.asarray(jnp.where(muc, ref_uc, 0.0)))
    np.testing.assert_array_equal(np.asarray(jnp.where(mvc, out_vc, 0.0)),
                                  np.asarray(jnp.where(mvc, ref_vc, 0.0)))


def test_reconcile_parity(setup):
    g, mesh = setup
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(6, 3, N + 1, N)))
    v = jnp.asarray(rng.normal(size=(6, 3, N, N + 1)))
    ref_u, ref_v = g.halo.reconcile_dgrid(u, v)
    out_u, out_v = _run_halo_op(
        g, mesh, lambda gl, a, b: gl.halo.reconcile_dgrid(a, b), u, v)
    np.testing.assert_array_equal(np.asarray(out_u), np.asarray(ref_u))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))


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
