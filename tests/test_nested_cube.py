"""Gnomonic cube nesting phase 1 (driver/nested_cube.py, grid/patch.py).

Reference behaviors pinned: aligned-nest grid generation by in-cell
spherical interpolation (fv_grid_tools.F90 setup_aligned_nest:1630),
parent->nest BC interpolation (fv_nesting.F90 setup_nested_grid_BCs:76,
boundary.F90 nested_grid_BC), bounded-domain regular stencils
(sw_core.F90 d2a2c_vect bounded branches :3065+)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.grid.metrics import build_grid_geometry
from gfdl_atmos_cubed_sphere_tpu.grid.patch import (aligned_nest_corners,
                                                    build_patch_geometry)
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (build_grid_ops,
                                                        build_grid_ops_patch)
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.driver.nested_cube import (CubeNest,
                                                            nested_step_hydro)
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

# integration tier (formerly 'fast'): interpret-mode kernel
# equivalence / multi-step runs, too slow for the <90 s tier

H = 3


def test_patch_metrics_match_parent_region():
    """An R=1 patch cut from the parent face must reproduce the parent's
    interior metric terms (the slerp hits the parent corners exactly)."""
    pg = build_grid_geometry(33)        # C32
    crn = aligned_nest_corners(pg, 2, 1, 10, 10, 13, 13)
    geom = build_patch_geometry(crn)
    for nm in ("area", "dxa", "dx", "dyc", "sin_sg", "cosa_s", "f0"):
        a_p = np.asarray(pg.arrays[nm][2])
        a_n = np.asarray(geom.arrays[nm][0])
        sl = a_p[3 + 10 - 3: 3 + 10 - 3 + a_n.shape[0],
                 3 + 10 - 3: 3 + 10 - 3 + a_n.shape[1]]
        np.testing.assert_allclose(a_n, sl, rtol=5e-11, atol=1e-13,
                                   err_msg=nm)


def test_frames_exact_at_refinement_one():
    """R=1 frames are index-aligned: the interpolated BC frame must equal
    the parent's padded subarray exactly (bilinear at integer offsets)."""
    g = build_grid_ops(25, dtype=jnp.float64)     # C24
    nest = CubeNest(g, tile=1, refinement=1, ioffset=8, joffset=8,
                    n_nest=8, dtype=jnp.float64)
    npz = 3
    rng = np.random.default_rng(0)
    delp = jnp.asarray(rng.uniform(900, 1100, (6, npz, 24, 24)))
    pt = jnp.asarray(rng.uniform(250, 300, (6, npz, 24, 24)))
    u = jnp.asarray(rng.standard_normal((6, npz, 25, 24)))
    v = jnp.asarray(rng.standard_normal((6, npz, 24, 25)))
    fr = nest.frames_from_parent(g, delp, pt, u, v, 100.0, 0.2857)
    dpp = g.halo.pad_cell(delp)[1]
    np.testing.assert_allclose(np.asarray(fr["delp"][0]),
                               np.asarray(dpp[:, 8:8 + 14, 8:8 + 14]),
                               rtol=1e-13)
    upp = g.halo.pad_dgrid(u, v)[0][1]
    np.testing.assert_allclose(np.asarray(fr["u"][0]),
                               np.asarray(upp[:, 8:8 + 15, 8:8 + 14]),
                               rtol=1e-13)


def test_nested_jw_runs_stable():
    """C24 parent + R=2 nest (n=16 over an 8x8 region), JW baroclinic
    wave: two concurrent big steps stay finite and the nest's interior
    stays close to the parent solution it refines."""
    npx, npz = 25, 16
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    prepare_phis(g, ic["phis"])
    cfg_p = DynConfig(npx=npx, npz=npz, dt=600.0, n_split=4)
    cfg_n = DynConfig(npx=17, npz=npz, dt=600.0, n_split=8)
    nest = CubeNest(g, tile=2, refinement=2, ioffset=8, joffset=8,
                    n_nest=16, dtype=jnp.float64)
    st_p = tuple(jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v"))
    ns = nest.init_state_from_parent(g, *st_p)
    st_n = (ns.delp, ns.pt, ns.u, ns.v)
    akj = jnp.asarray(ak)
    bkj = jnp.asarray(bk)
    step = jax.jit(nested_step_hydro(g, nest, cfg_p, cfg_n, akj, bkj, ptop))
    for _ in range(2):
        st_p, st_n = step(st_p, st_n)
    for a in (*st_p, *st_n):
        assert np.isfinite(np.asarray(a)).all()
    # nest interior vs the parent solution interpolated onto it
    fr = nest.frames_from_parent(g, *st_p, ptop, 0.2857)
    tn = np.asarray(st_n[1][0])                   # nest T [K, 16, 16]
    tp = np.asarray(fr["t_abs"][0][:, H:-H, H:-H])
    rel = np.abs(tn - tp) / np.abs(tp)
    assert rel.max() < 0.05, rel.max()


def test_nested_twoway_feedback_finite():
    npx, npz = 25, 16
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    prepare_phis(g, ic["phis"])
    cfg_p = DynConfig(npx=npx, npz=npz, dt=600.0, n_split=4)
    cfg_n = DynConfig(npx=17, npz=npz, dt=600.0, n_split=8)
    nest = CubeNest(g, tile=2, refinement=2, ioffset=8, joffset=8,
                    n_nest=16, dtype=jnp.float64)
    st_p = tuple(jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v"))
    ns = nest.init_state_from_parent(g, *st_p)
    st_n = (ns.delp, ns.pt, ns.u, ns.v)
    step = jax.jit(nested_step_hydro(g, nest, cfg_p, cfg_n,
                                     jnp.asarray(ak), jnp.asarray(bk), ptop,
                                     two_way=True, two_way_blend=0.5))
    st_p, st_n = step(st_p, st_n)
    for a in (*st_p, *st_n):
        assert np.isfinite(np.asarray(a)).all()


def test_nested_nh_twoway_moist():
    """Phase 2: nonhydrostatic moist nest with full NH BC set (w + height
    interfaces, nh_utils.F90 nest_halo_nh:1764) and two-way feedback of
    scalars (area-averaged) AND D-grid winds (wall-averaged,
    update_twowaynest). Two big steps stay finite, the nest tracks the
    parent, and the parent footprint actually receives wind feedback."""
    from gfdl_atmos_cubed_sphere_tpu.driver.nested_cube import nested_step_nh
    npx, npz = 25, 10
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True, moist=True)
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    prepare_phis(g, ic["phis"])
    cfg_p = DynConfig(npx=npx, npz=npz, dt=600.0, n_split=4,
                      hydrostatic=False, adiabatic=False)
    cfg_n = DynConfig(npx=17, npz=npz, dt=600.0, n_split=8,
                      hydrostatic=False, adiabatic=False)
    nest = CubeNest(g, tile=2, refinement=2, ioffset=8, joffset=8,
                    n_nest=16, dtype=jnp.float64)
    q = {"sphum": jnp.asarray(ic["sphum"])}
    st_p = tuple(jnp.asarray(ic[k])
                 for k in ("delp", "pt", "u", "v", "w", "delz")) + (q,)
    ns = nest.init_state_from_parent_nh(g, *st_p[:6], q=q)
    st_n = (ns.delp, ns.pt, ns.u, ns.v, ns.w, ns.delz, ns.q)
    dp0 = np.diff(np.asarray(ak)) + np.diff(np.asarray(bk)) * 1.0e5
    step = jax.jit(nested_step_nh(
        g, nest, cfg_p, cfg_n, jnp.asarray(ak), jnp.asarray(bk), ptop, dp0,
        ic["phis"], two_way=True, two_way_blend=0.5))

    # one-step reference WITHOUT feedback to prove the winds changed
    step0 = jax.jit(nested_step_nh(
        g, nest, cfg_p, cfg_n, jnp.asarray(ak), jnp.asarray(bk), ptop, dp0,
        ic["phis"], two_way=False))
    p0, _ = step0(st_p, st_n)
    p1, n1 = step(st_p, st_n)
    for a in (*p1[:6], *n1[:6]):
        assert np.isfinite(np.asarray(a)).all()
    # feedback modified the parent winds inside the footprint only
    du = np.abs(np.asarray(p1[2]) - np.asarray(p0[2]))
    assert du[2, :, 9:16, 8:16].max() > 0.0
    outside = du.copy()
    outside[2, :, 8:17, 8:17] = 0.0
    assert outside.max() == 0.0
    # second step remains stable
    p2, n2 = step(p1, n1)
    assert np.isfinite(np.asarray(p2[1])).all()
    assert np.isfinite(np.asarray(n2[4])).all()
    # nest temperature tracks the parent solution
    fr = nest.frames_from_parent(g, p2[0], p2[1], p2[2], p2[3], ptop,
                                 0.2857)
    tn = np.asarray(n2[1][0])
    tp = np.asarray(fr["t_abs"][0][:, H:-H, H:-H])
    assert (np.abs(tn - tp) / np.abs(tp)).max() < 0.05


def test_telescoped_two_level_nest():
    """Telescoping nests (SURVEY row 19 'no telescoping' gap): parent
    C24 -> nest1 (R=2 on tile 2) -> nest2 (R=2 inside nest1, effective
    R=4 vs the parent). All three run concurrently in one jitted step;
    both nests stay finite and track the parent solution on their
    footprints."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.driver.nested_cube import (
        CubeNest, telescoped_step_hydro)
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

    npx, npz = 25, 10
    dt = 600.0
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)

    nest1 = CubeNest(g, tile=2, refinement=2, ioffset=6, joffset=6,
                     n_nest=24, dtype=jnp.float64)
    nest2 = CubeNest(nest1.g, tile=0, refinement=2, ioffset=6, joffset=6,
                     n_nest=24, dtype=jnp.float64)

    cfg_p = DynConfig(npx=npx, npz=npz, dt=dt, n_split=4)
    cfg_1 = DynConfig(npx=25, npz=npz, dt=dt / 2, n_split=4)
    cfg_2 = DynConfig(npx=25, npz=npz, dt=dt / 4, n_split=4)
    step = telescoped_step_hydro(g, nest1, nest2, cfg_p, cfg_1, cfg_2,
                                 akj, bkj, ptop)

    ps = tuple(jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v"))
    s1 = nest1.init_state_from_parent(g, *ps)
    ns1 = (s1.delp, s1.pt, s1.u, s1.v)
    # nest2 cold start from nest1 through a clamp halo (interior only)
    from types import SimpleNamespace
    from gfdl_atmos_cubed_sphere_tpu.parallel.nest_halo import NestBCHalo
    gp2 = SimpleNamespace(**vars(nest1.g))
    gp2.halo = NestBCHalo(nest1.n, 3, None)
    s2 = nest2.init_state_from_parent(gp2, *ns1)
    ns2 = (s2.delp, s2.pt, s2.u, s2.v)

    jstep = jax.jit(step)
    for _ in range(3):
        ps, ns1, ns2 = jstep(ps, ns1, ns2)
    for st in (ps, ns1, ns2):
        for a in st:
            assert np.isfinite(np.asarray(a)).all()
    # nest2 tracks nest1 on its footprint (sub-cycled dt, same flow)
    # compare temperature coarse-grained 2x onto nest1 cells
    t2 = np.asarray(ns2[1][0])
    t2c = 0.25 * (t2[:, ::2, ::2] + t2[:, 1::2, ::2]
                  + t2[:, ::2, 1::2] + t2[:, 1::2, 1::2])
    t1 = np.asarray(ns1[1][0][:, 6:6 + 12, 6:6 + 12])
    rel = np.abs(t2c - t1) / np.abs(t1)
    assert rel.max() < 0.05, rel.max()
