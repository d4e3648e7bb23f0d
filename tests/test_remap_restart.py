"""npz_rst restart vertical remap (io/restart.py remap_restart;
reference fv_io.F90 rst_remap:860)."""

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.io.restart import remap_restart

NPX = 13


def _ic(g, npz):
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
    return ic, ptop, ak, bk


def test_identity_coordinate_roundtrip():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ic, ptop, ak, bk = _ic(g, 32)
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v")}
    q = {"sphum": jnp.asarray(0.005 * ic["delp"] / ic["delp"].max())}
    out, q2 = remap_restart(st, q, ak, bk, ak, bk, g)
    for k in st:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(st[k]),
                                   rtol=5e-13, atol=1e-10, err_msg=k)
    np.testing.assert_allclose(np.asarray(q2["sphum"]),
                               np.asarray(q["sphum"]), rtol=5e-12, atol=1e-16)


def test_higher_top_target_extrapolates():
    """Target coordinate top (L24, ptop=1 Pa) above the restart top (L32,
    ptop=100 Pa): uncovered layers take the top source value (mappm
    above-ptop extrapolation), never zero."""
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ic, ptop_r, ak_r, bk_r = _ic(g, 32)
    ks, ptop, ak, bk = set_eta(24)
    assert ak[0] < ak_r[0]
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v")}
    q = {"sphum": jnp.asarray(np.full_like(ic["delp"], 1e-3))}
    out, q2 = remap_restart(st, q, ak_r, bk_r, ak, bk, g)
    lo, hi = float(st["pt"].min()), float(st["pt"].max())
    assert np.asarray(out["pt"]).min() >= lo - 1e-8
    assert np.asarray(out["pt"]).max() <= hi + 1e-8
    np.testing.assert_allclose(np.asarray(q2["sphum"]), 1e-3, rtol=1e-9)


def test_cross_resolution_remap_and_run():
    """L32 restart onto the L10 run coordinate: conservation + physical
    bounds, then the remapped state steps stably."""
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ic, ptop_r, ak_r, bk_r = _ic(g, 32)
    ks, ptop, ak, bk = set_eta(10)
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v", "w",
                                          "delz")}
    q = {"sphum": jnp.asarray(np.full_like(ic["delp"], 1e-3))}
    out, q2 = remap_restart(st, q, ak_r, bk_r, ak, bk, g,
                            hydrostatic=False)

    delp = np.asarray(out["delp"])
    assert (delp > 0).all()
    # column mass = restart ps minus the run-coordinate top pressure
    ps_r = ak_r[0] + np.asarray(st["delp"]).sum(1)
    np.testing.assert_allclose(delp.sum(1), ps_r - ak[0], rtol=1e-12)
    # monotone kord=4 remap cannot create new extrema
    assert np.asarray(out["pt"]).max() <= float(st["pt"].max()) + 1e-8
    assert np.asarray(out["pt"]).min() >= float(st["pt"].min()) - 1e-8
    assert np.abs(np.asarray(out["u"])).max() <= float(
        jnp.abs(st["u"]).max()) + 1e-8
    # uniform tracer stays uniform
    np.testing.assert_allclose(np.asarray(q2["sphum"]), 1e-3, rtol=1e-9)
    assert (np.asarray(out["delz"]) < 0).all()

    # the remapped state drives the hydrostatic core
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
        fv_dynamics_hydro)
    prepare_phis(g, ic["phis"])
    cfg = DynConfig(npx=NPX, npz=10, dt=1200.0, n_split=4)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)

    @jax.jit
    def step(delp, pt, u, v):
        r = fv_dynamics_hydro(delp, pt, u, v, None, g, cfg, akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v

    s = (out["delp"], out["pt"], out["u"], out["v"])
    for _ in range(2):
        s = step(*s)
    for a in s:
        assert not bool(jnp.isnan(a).any())


def test_make_nh_and_add_noise():
    """Startup options make_nh (fv_restart.F90:707: w=0, hydrostatic
    delz) and add_noise (:617: uniform thermal noise) — previously
    declared-unsupported config behaviors, now implemented."""
    import numpy as np
    import jax.numpy as jnp
    import gfdl_atmos_cubed_sphere_tpu.constants as con
    from gfdl_atmos_cubed_sphere_tpu.io.restart import (
        make_nh_state, add_thermal_noise)
    rng = np.random.default_rng(0)
    shp = (2, 8, 4, 4)
    pt = jnp.asarray(rng.uniform(230.0, 300.0, shp))
    delp = jnp.full(shp, 1.0e4)
    sph = jnp.full(shp, 5e-3)
    w, delz = make_nh_state(pt, delp, 100.0, sphum=sph)
    assert float(jnp.abs(w).max()) == 0.0
    assert np.all(np.asarray(delz) < 0.0)
    # hydrostatic consistency: -g*delz == Rd*Tv*dlnp
    pe = 100.0 + np.concatenate([np.zeros((2, 1, 4, 4)),
                                 np.cumsum(np.asarray(delp), 1)], 1)
    dlnp = np.log(pe[:, 1:]) - np.log(pe[:, :-1])
    tv = np.asarray(pt) * (1.0 + con.ZVIR * 5e-3)
    np.testing.assert_allclose(-con.GRAV * np.asarray(delz),
                               con.RDGAS * tv * dlnp, rtol=1e-6)

    pt2, rms = add_thermal_noise(pt, 0.5, seed=1)
    d = np.asarray(pt2 - pt)
    assert d.min() >= 0.0 and d.max() <= 0.5
    assert 0.0 < rms < 0.5
    assert np.abs(d).mean() > 0.1


def test_reset_eta_roundtrip():
    """reset_eta (fv_arrays.F90): rebuild the standard ak/bk on restart
    and remap; with identical source/target coordinates the state
    round-trips closely, and a perturbed source coordinate is restored
    to the standard tables."""
    import numpy as np
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    from gfdl_atmos_cubed_sphere_tpu.io.restart import reset_eta

    npx, npz = 13, 16
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, moist=True)
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v")}
    tr = {"sphum": jnp.asarray(ic["sphum"])}

    # perturbed source coordinate (as if the restart used odd levels)
    ak_p = np.asarray(ak) * 1.02
    st2, tr2, ak2, bk2, ptop2 = reset_eta(st, tr, ak_p, bk, g)
    np.testing.assert_allclose(ak2, np.asarray(ak), rtol=1e-12)
    np.testing.assert_allclose(bk2, np.asarray(bk), rtol=1e-12)
    assert st2["delp"].shape == st["delp"].shape
    for k in ("pt", "u", "v"):
        rel = (np.abs(np.asarray(st2[k]) - np.asarray(st[k]))
               / (np.abs(np.asarray(st[k])) + 1.0))
        assert rel.max() < 0.1, (k, rel.max())
    assert np.isfinite(np.asarray(tr2["sphum"])).all()
