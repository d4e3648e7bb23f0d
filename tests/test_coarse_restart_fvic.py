"""Coarse-grained restart files (coarse_grained_restart_files.F90) and
prior-FV-run lat-lon IC (external_ic.F90 get_fv_ic:2426)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.utils import coarse_graining as cg
from gfdl_atmos_cubed_sphere_tpu.io import restart
from gfdl_atmos_cubed_sphere_tpu.io.external_ic import get_external_ic

N, K = 12, 10


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, ak, bk, ptop)
    return g, ptop, ak, bk, ic


def test_coarse_grain_restart_conserves_mass(setup):
    g, ptop, ak, bk, ic = setup
    state = {"delp": jnp.asarray(ic["delp"]), "pt": jnp.asarray(ic["pt"]),
             "u": jnp.asarray(ic["u"]), "v": jnp.asarray(ic["v"]),
             "phis": jnp.asarray(ic["phis"])}
    q = {"sphum": jnp.asarray(ic["sphum"]) if "sphum" in ic
         else jnp.full_like(state["delp"], 3.0e-3)}
    for strat in ("model_level_area_weighted", "model_level_mass_weighted"):
        cs, cq = cg.coarse_grain_restart(state, q, g, 2, strategy=strat)
        f = 2
        assert cs["delp"].shape == (6, K, N // f, N // f)
        assert cs["u"].shape == (6, K, N // f + 1, N // f)
        assert cs["v"].shape == (6, K, N // f, N // f + 1)
        assert cq["sphum"].shape == cs["delp"].shape
        # air mass conserved by the area-weighted delp rule
        area = np.asarray(g.geom.interior("area"))[:, None]
        ca = cg.block_sum(jnp.asarray(area[:, 0]), f)[:, None]
        m_f = float((np.asarray(state["delp"]) * area).sum())
        m_c = float((np.asarray(cs["delp"]) * np.asarray(ca)).sum())
        assert m_c == pytest.approx(m_f, rel=1e-12)
        # constant fields stay constant under every weighting
        cpt, _ = cg.coarse_grain_restart(
            {"delp": state["delp"], "pt": jnp.full_like(state["pt"], 7.0),
             "u": state["u"], "v": state["v"]}, {}, g, f, strategy=strat)
        np.testing.assert_allclose(np.asarray(cpt["pt"]), 7.0, rtol=1e-13)


def test_save_coarse_state_roundtrip(tmp_path, setup):
    g, ptop, ak, bk, ic = setup
    state = {"delp": jnp.asarray(ic["delp"]), "pt": jnp.asarray(ic["pt"]),
             "u": jnp.asarray(ic["u"]), "v": jnp.asarray(ic["v"])}
    p = str(tmp_path / "coarse.npz")
    cs, cq = restart.save_coarse_state(p, state, {}, g, 3, ak=ak, bk=bk)
    st_back, _, _ = restart.load_state(p)
    np.testing.assert_array_equal(np.asarray(cs["pt"]), st_back["pt"])


def test_get_fv_ic_latlon_restart(setup):
    g, ptop, ak, bk, ic = setup
    # synthetic lat-lon "prior run" on its own hybrid coordinate
    NYs, NXs, Ks = 24, 48, 5
    lat = np.linspace(-np.pi / 2 + 0.03, np.pi / 2 - 0.03, NYs)
    lon = (0.5 + np.arange(NXs)) * 2 * np.pi / NXs
    ks_s, ptop_s, ak_s, bk_s = set_eta(Ks)
    t0 = 250.0 + 30.0 * np.cos(lat)[None, :, None] * np.ones((Ks, NYs, NXs))
    u0 = 20.0 * np.cos(lat)[None, :, None] * np.ones((Ks, NYs, NXs))
    dyn = dict(lon=lon, lat=lat, ak_src=ak_s, bk_src=bk_s,
               gz=np.zeros((NYs, NXs)),
               delp=np.diff(ak_s)[:, None, None]
               + np.diff(bk_s)[:, None, None] * 1.0e5
               * np.ones((Ks, NYs, NXs)),
               t=t0, u=u0, v=np.zeros_like(u0))
    tra = {"sphum": np.full((Ks, NYs, NXs), 4.0e-3),
           "o3mr": np.full((Ks, NYs, NXs), 1.0e-7)}
    st = get_external_ic("fv", dyn, g.geom, ak, bk, ptop, g=g, tra=tra)
    assert st["delp"].shape == (6, K, N, N)
    assert st["u"].shape == (6, K, N + 1, N)
    # surface pressure integrated from the source delp
    ps = ptop + np.asarray(st["delp"]).sum(axis=1)
    np.testing.assert_allclose(ps, 1.0e5, rtol=2e-3)
    # temperature remapped within physical bounds, pole-equator gradient kept
    pt = np.asarray(st["pt"])
    assert 240.0 < pt.min() < pt.max() < 285.0
    # constant tracers survive interpolation + remap exactly-ish
    np.testing.assert_allclose(np.asarray(st["sphum"]), 4.0e-3, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st["o3mr"]), 1.0e-7, rtol=1e-10)
