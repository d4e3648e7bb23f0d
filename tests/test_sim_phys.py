"""Idealized physics suite: gray radiation, surface drag, PBL diffusion."""

import jax.numpy as jnp
import numpy as np
import pytest

import gfdl_atmos_cubed_sphere_tpu.constants as con
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.physics.sim_phys import (
    SimPhysConfig, gray_radiation, bulk_surface_drag, ocean_roughness,
    pbl_height, implicit_diffusion, sim_phys, fv_nudge)

N, K = 12, 16


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, ak, bk, ptop, moist=True)
    delz = -con.RDGAS * np.asarray(ic["pt"]) / con.GRAV * np.log(
        1.0 + np.asarray(ic["delp"])
        / (ptop + np.cumsum(np.asarray(ic["delp"]), 1)
           - np.asarray(ic["delp"])))
    return g, ptop, ic, jnp.asarray(delz)


def test_gray_radiation_energetics(setup):
    g, ptop, ic, delz = setup
    cfg = SimPhysConfig()
    ta = jnp.asarray(ic["pt"])
    ts = ta[:, -1] + 1.0
    delp = jnp.asarray(ic["delp"])
    ps = ptop + delp.sum(axis=1)
    lat = jnp.asarray(g.geom.interior("aglat"))
    lon = jnp.asarray(g.geom.interior("aglon"))
    t_dt, d = gray_radiation(ta, ts, delp, delz, lat, lon, ps, ptop, cfg)
    assert np.isfinite(np.asarray(t_dt)).all()
    # LW cools the troposphere on average (~ -1 K/day magnitude)
    mean_cool = float(t_dt[:, K // 2:].mean()) * 86400.0
    assert -5.0 < mean_cool < 0.0, mean_cool
    # OLR magnitude physical
    assert 100.0 < float(d["olr"].mean()) < 400.0
    # column energy balance: net LW divergence equals olr - lwd + lwu_surf
    rho = -delp / (con.GRAV * delz)
    colsum = float(jnp.sum(t_dt * con.CP_AIR * rho * (-delz), axis=1)[0, 5, 5])
    expect = float((d["lwu"] - d["lwd"] - (d["olr"] - 0.0))[0, 5, 5])
    assert colsum == pytest.approx(expect, rel=1e-10)
    # sw at surface peaks at low latitude
    i_eq = np.unravel_index(np.argmin(np.abs(np.asarray(lat))), lat.shape)
    assert float(d["sw_surf"][i_eq]) > float(d["sw_surf"].min())


def test_surface_drag_and_roughness():
    cfg = SimPhysConfig()
    z0 = ocean_roughness(jnp.asarray(0.3), cfg)
    assert 1.0e-5 < float(z0) < 1.0e-3
    ua = jnp.asarray([[10.0]])
    cd_n, _, us = bulk_surface_drag(ua, 0.0 * ua, jnp.asarray([[288.0]]),
                                    jnp.asarray([[288.0]]),
                                    jnp.asarray([[30.0]]), cfg=cfg)
    assert 5.0e-4 < float(cd_n.squeeze()) < 5.0e-3      # neutral ocean cd ~ 1.5e-3
    # stable (ts << ta) suppresses drag; unstable enhances it
    cd_s, _, _ = bulk_surface_drag(ua, 0.0 * ua, jnp.asarray([[288.0]]),
                                   jnp.asarray([[278.0]]),
                                   jnp.asarray([[30.0]]), cfg=cfg)
    cd_u, _, _ = bulk_surface_drag(ua, 0.0 * ua, jnp.asarray([[288.0]]),
                                   jnp.asarray([[298.0]]),
                                   jnp.asarray([[30.0]]), cfg=cfg)
    assert float(cd_s.squeeze()) < float(cd_n.squeeze()) < float(cd_u.squeeze())
    # fixed-cd path
    cfgf = SimPhysConfig(cd_fixed=1.0e-3)
    cdf, _, _ = bulk_surface_drag(ua, 0.0 * ua, jnp.asarray([[288.0]]),
                                  jnp.asarray([[288.0]]),
                                  jnp.asarray([[30.0]]), cfg=cfgf)
    assert float(cdf.squeeze()) == 1.0e-3


def test_implicit_diffusion_conserves(setup):
    g, ptop, ic, delz = setup
    delp = jnp.asarray(ic["delp"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=delp.shape)) + 5.0
    nu_int = jnp.full_like(delp[:, :-1], 20.0)
    x2 = implicit_diffusion(x, nu_int, delz, delp, 600.0)
    # mass-weighted mean preserved (flux form, no-flux boundaries)
    m0 = float(jnp.sum(x * delp, axis=1)[0, 3, 3])
    m1 = float(jnp.sum(x2 * delp, axis=1)[0, 3, 3])
    assert m1 == pytest.approx(m0, rel=1e-10)
    # variance decreases
    assert float(jnp.var(x2[0, :, 3, 3])) < float(jnp.var(x[0, :, 3, 3]))


def test_sim_phys_step_and_nudge(setup):
    g, ptop, ic, delz = setup
    delp = jnp.asarray(ic["delp"])
    ta = jnp.asarray(ic["pt"])
    qv = jnp.asarray(ic["sphum"])
    ua = jnp.full_like(ta, 8.0)
    va = jnp.zeros_like(ta)
    ts = ta[:, -1] + 2.0
    u2, v2, t2, q2, diag = sim_phys(ua, va, ta, qv, delp, delz, ts, g,
                                    ptop, dt=600.0)
    assert not bool(jnp.isnan(t2).any())
    # surface drag decelerates the lowest layer
    assert float(u2[:, -1].mean()) < float(ua[:, -1].mean())
    # warm surface heats the lowest layer despite LW cooling
    assert float((t2 - ta)[:, -1].mean()) > -0.5
    assert float(diag["pblh"].max()) >= 0.0

    un, vn, tn = fv_nudge(u2, v2, t2, ua, va, ta, 600.0)
    assert float(jnp.abs(un - ua).max()) < float(jnp.abs(u2 - ua).max())
