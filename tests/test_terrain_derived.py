"""Terrain filters (#25), p_var (#24), derived diagnostics (#26)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu import constants as con
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.init_hydro import p_var, hydro_eq
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.utils import terrain
from gfdl_atmos_cubed_sphere_tpu.io import derived
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis

NPX, NPZ = 25, 10


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True, moist=True)
    prepare_phis(g, ic["phis"])
    return g, ic, ptop, ak, bk


def test_terrain_filter_smooths_and_conserves(setup):
    g, ic, ptop, ak, bk = setup
    phis = jnp.asarray(terrain.synthetic_terrain(g.geom, h0=3000.0, r0=0.25))
    filt = terrain.fv3_zs_filter(phis, g, n_del2_weak=8, n_del4=2)
    area = jnp.asarray(g.geom.interior("area"))[:, None]
    m0 = float(jnp.sum(phis * area))
    m1 = float(jnp.sum(filt * area))
    # diffusion conserves the area integral away from edges (small edge
    # effect from one-sided metric factors)
    assert abs(m1 - m0) / abs(m0) < 5e-3
    # peak reduced, field smoothed
    assert float(filt.max()) < float(phis.max())
    def rough(f):
        return float(jnp.abs(jnp.diff(f[:, 0], axis=-1)).mean())
    assert rough(filt) < rough(phis)


def test_p_var_and_hydro_eq(setup):
    g, ic, ptop, ak, bk = setup
    delp = jnp.asarray(ic["delp"])
    pt = jnp.asarray(ic["pt"])
    out = p_var(delp, pt, ptop, q={"sphum": jnp.asarray(ic["sphum"])},
                make_nh=True)
    assert float(jnp.abs(out["ps"] - (ptop + delp.sum(1))).max()) < 1e-8
    assert float(out["delz"].max()) < 0.0
    assert float(out["pkz"].min()) > 0.0
    # dry-mass adjustment drives the global dry ps to the target
    area = jnp.asarray(g.geom.interior("area"))
    out2 = p_var(delp, pt, ptop, q={"sphum": jnp.asarray(ic["sphum"])},
                 adjust_dry_mass=True, dry_mass=98290.0, area=area)
    qs = jnp.asarray(ic["sphum"])
    psd = ptop + jnp.sum(out2["delp"] * (1 - qs), axis=1)
    mean = float(jnp.sum(psd * area) / jnp.sum(area))
    assert abs(mean - 98290.0) < 50.0

    dl, ptl, psl = hydro_eq(NPZ, 1.0e5, jnp.zeros((6, g.n, g.n)),
                            ak, bk, ptop)
    assert float(jnp.abs(psl - 1e5).max()) < 1e-6


def test_vorticity_of_solid_body(setup):
    """Solid-body rotation has uniform relative vorticity 2*Omega_rot."""
    g, ic, ptop, ak, bk = setup
    from gfdl_atmos_cubed_sphere_tpu.init.sw_cases import case2
    sw = case2(g.geom)
    u = jnp.asarray(sw["u"])
    v = jnp.asarray(sw["v"])
    zeta = derived.relative_vorticity(u, v, g)
    lat = jnp.asarray(g.geom.interior("aglat"))[:, None]
    # case2: u = U cos(lat); zeta = 2 U sin(lat)/a
    UBAR = 2.0 * np.pi * con.RADIUS / (12.0 * 86400.0)
    expect = 2.0 * UBAR / con.RADIUS * jnp.sin(lat)
    err = float(jnp.abs(zeta - expect).max()) / float(jnp.abs(expect).max())
    assert err < 0.05, err


def test_pressure_interp_and_slp(setup):
    g, ic, ptop, ak, bk = setup
    delp = jnp.asarray(ic["delp"])
    pt = jnp.asarray(ic["pt"])
    t500 = derived.interp_to_pressure_levels(pt, delp, ptop, [7.0e4])
    inside = ~jnp.isnan(t500)
    assert bool(inside.any())
    assert 200.0 < float(jnp.nanmin(t500)) and float(jnp.nanmax(t500)) < 300.0
    ps = ptop + delp.sum(1)
    slp = derived.sea_level_pressure(ps, jnp.asarray(ic["phis"]), pt[:, -1])
    # JW phis is a signed geopotential anomaly: slp deviates from ps by a
    # few hPa at most and matches ps exactly where phis == 0
    assert float(jnp.abs(slp / ps - 1.0).max()) < 0.05
    assert not bool(jnp.isnan(slp).any())


def test_cape_positive_for_unstable_column():
    K = 20
    shp = (6, K, 4, 4)
    ptop = 100.0
    delp = jnp.full(shp, 1.0e5 / K)
    # very warm, moist surface under a cold aloft profile -> CAPE > 0
    prof = jnp.linspace(210.0, 302.0, K).reshape(1, K, 1, 1)
    pt = jnp.broadcast_to(prof, shp)
    qv = jnp.full(shp, 1e-4).at[:, -1].set(0.018)
    cape, cin = derived.cape_cin(pt, delp, qv, ptop)
    assert float(cape.min()) > 0.0
    assert float(cin.min()) >= 0.0


def test_updraft_helicity_partial_layers():
    from gfdl_atmos_cubed_sphere_tpu.io.derived import (layer_heights,
                                                        updraft_helicity)
    K, n = 8, 4
    delz = jnp.full((1, K, n, n), -1000.0)
    zm, zb = layer_heights(delz=delz)
    # column: layers span [0,8km]; UH over [2,5] km with vort*w = const c
    vort = jnp.full((1, K, n, n), 2e-3)
    w = jnp.full((1, K, n, n), 3.0)
    uh = updraft_helicity(vort, w, zm, -delz, z_bot=2.0e3, z_top=5.0e3)
    np.testing.assert_allclose(np.asarray(uh), 2e-3 * 3.0 * 3000.0,
                               rtol=1e-12)
    # half-layer overlap: [2.5, 4.5] km window
    uh2 = updraft_helicity(vort, w, zm, -delz, z_bot=2.5e3, z_top=4.5e3)
    np.testing.assert_allclose(np.asarray(uh2), 2e-3 * 3.0 * 2000.0,
                               rtol=1e-12)


def test_radar_reflectivity_monotone_in_rain():
    from gfdl_atmos_cubed_sphere_tpu.io.derived import (radar_reflectivity,
                                                        echo_top,
                                                        layer_heights)
    K, n = 6, 4
    delp = jnp.full((1, K, n, n), 100e2)
    pt = jnp.full((1, K, n, n), 270.0)
    delz = jnp.full((1, K, n, n), -500.0)
    q1 = {"rainwat": jnp.full((1, K, n, n), 1e-4)}
    q2 = {"rainwat": jnp.full((1, K, n, n), 2e-3),
          "snowwat": jnp.full((1, K, n, n), 1e-3)}
    dbz1, c1 = radar_reflectivity(delp, pt, q1, delz=delz)
    dbz2, c2 = radar_reflectivity(delp, pt, q2, delz=delz)
    assert float(c2[0, 0, 0]) > float(c1[0, 0, 0]) > 0.0
    # no hydrometeors -> floor
    dbz0, c0 = radar_reflectivity(delp, pt, {}, delz=delz)
    np.testing.assert_allclose(np.asarray(c0), -20.0)
    # echo top: all layers above threshold -> top-layer midpoint (2750 m)
    zm, _ = layer_heights(delz=delz)
    et = echo_top(dbz2, zm)
    np.testing.assert_allclose(np.asarray(et), 2750.0)
    et0 = echo_top(dbz0, zm)
    np.testing.assert_allclose(np.asarray(et0), -1.0)


def test_layer_heights_hydrostatic_matches_nh():
    from gfdl_atmos_cubed_sphere_tpu.io.derived import layer_heights
    import gfdl_atmos_cubed_sphere_tpu.constants as con
    K, n = 10, 3
    rng = np.random.default_rng(3)
    pt = jnp.asarray(rng.uniform(220.0, 290.0, (1, K, n, n)))
    pe = np.linspace(100e2, 1000e2, K + 1)
    peln = jnp.asarray(np.broadcast_to(
        np.log(pe)[None, :, None, None], (1, K + 1, n, n)))
    dz_h = con.RDGAS / con.GRAV * pt * (peln[:, 1:] - peln[:, :-1])
    zm_h, _ = layer_heights(pt=pt, peln=peln)
    zm_n, _ = layer_heights(delz=-dz_h)
    np.testing.assert_allclose(np.asarray(zm_h), np.asarray(zm_n),
                               rtol=1e-12)


def test_surfdrv_dem_binning(setup):
    """surfdrv (fv_surf_map.F90:92): a smooth analytic DEM binned to the
    cube reproduces the analytic field at cell centers; sgh captures
    added subgrid noise; oro follows the land mask."""
    g, ic, ptop, ak, bk = setup
    import gfdl_atmos_cubed_sphere_tpu.constants as con
    nlat, nlon = 181, 360
    lat = np.deg2rad(np.linspace(-90.0, 90.0, nlat))
    lon = np.deg2rad(np.arange(nlon) * 1.0)
    LON, LAT = np.meshgrid(lon, lat)
    zfun = lambda lo, la: 1000.0 * (1.0 + np.sin(la) * np.cos(2 * lo))
    rng = np.random.default_rng(0)
    noise = 50.0 * rng.standard_normal(LON.shape)
    dem = zfun(LON, LAT) + noise
    land = (dem > 1000.0).astype(float)

    out = terrain.surfdrv(g.geom, lon, lat, dem, g=g, land_mask=land,
                          filter_terrain=False)
    lon_c = g.geom.interior("aglon")
    lat_c = g.geom.interior("aglat")
    want = zfun(lon_c, lat_c)
    err = np.abs(out["zs"] - want)
    # C24 cells are ~3.7 deg; DEM varies over ~90 deg scales -> binned
    # means track the analytic surface to a few percent of its range
    assert np.median(err) < 60.0
    assert out["sgh"].min() >= 0.0
    assert 20.0 < np.median(out["sgh"][out["sgh"] > 0]) < 120.0
    assert out["oro"].min() >= 0.0 and out["oro"].max() <= 1.0
    # filtered phis runs and stays bounded
    out2 = terrain.surfdrv(g.geom, lon, lat, dem, g=g,
                           filter_terrain=True, n_del2_weak=4, n_del4=1)
    assert float(np.abs(np.asarray(out2["phis"])).max()) < 3000.0 * con.GRAV


def test_zero_ocean_flux_limiter():
    """zero_ocean (fv_surf_map.F90 del2_cubed_sphere:880-893): with the
    land-fraction mask, del-2 smoothing moves NO terrain mass across
    land/water boundaries — water cells stay at zero height and total
    land mass is conserved; without the mask the island leaks."""
    import numpy as np
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.utils.terrain import del2_terrain

    g = build_grid_ops(13, dtype=jnp.float64)
    n = 12
    zs = np.zeros((6, n, n))
    oro = np.zeros((6, n, n))
    # an island on tile 0 with sharp edges
    zs[0, 4:8, 4:8] = 1000.0
    oro[0, 3:9, 3:9] = 1.0
    cd = 0.15 * float(np.asarray(g.da_min))

    sm_open = np.asarray(del2_terrain(jnp.asarray(zs), g, cd, nmax=4))
    sm_mask = np.asarray(del2_terrain(jnp.asarray(zs), g, cd, nmax=4,
                                      oro=oro))
    # masked: water cells (oro==0) never receive terrain
    assert np.abs(sm_mask[oro == 0.0]).max() == 0.0
    # unmasked: diffusion leaks across the coast
    assert np.abs(sm_open[0, 2, 5]) > 0.0
    # both conserve total mass (area-weighted); masked conserves it
    # entirely within the land region
    area = np.asarray(g.geom.interior("area"))
    np.testing.assert_allclose(float((sm_mask * area).sum()),
                               float((zs * area).sum()), rtol=1e-12)
    # smoothing still happened inside the island
    assert sm_mask[0, 5, 5] < 1000.0
