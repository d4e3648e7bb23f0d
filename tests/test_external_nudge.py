"""External ICs (#22) and nudging / DA (#28)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.io import external_ic as eic
from gfdl_atmos_cubed_sphere_tpu.physics.nudging import (
    NudgeConfig, nwp_nudge, apply_da_increment, IAU)

NPX, NPZ = 25, 10


def _analysis(Ks=14, NY=73, NX=144):
    lon = np.linspace(0, 2 * np.pi, NX, endpoint=False)
    lat = np.linspace(-np.pi / 2 + 1e-4, np.pi / 2 - 1e-4, NY)
    LON, LAT = np.meshgrid(lon, lat)
    ak_src = np.linspace(100.0, 0.0, Ks + 1)
    bk_src = np.linspace(0.0, 1.0, Ks + 1) ** 1.5
    t = 250.0 + 40.0 * np.cos(LAT)[None] * np.linspace(0.2, 1.0, Ks)[:, None, None]
    u = 20.0 * np.cos(LAT)[None] * np.ones((Ks, NY, NX))
    v = np.zeros((Ks, NY, NX))
    ps = 1.0e5 - 500.0 * np.sin(LAT) ** 2
    return dict(lon=lon, lat=lat, ps=ps, phis=np.zeros_like(ps),
                t=t, u=u, v=v, sphum=1e-3 * np.ones_like(t),
                ak_src=ak_src, bk_src=bk_src)


def test_external_ic_pipeline():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ana = _analysis()
    st = eic.state_from_latlon_analysis(ana, g.geom, ak, bk, ptop)
    assert st["delp"].shape == (6, NPZ, g.n, g.n)
    # surface pressure reconstructed from delp matches interpolated ps
    ps_rec = ptop + np.asarray(st["delp"]).sum(axis=1)
    np.testing.assert_allclose(ps_rec, np.asarray(st["ps"][:, 0]), rtol=1e-10)
    # temperature in range, zonally-coherent
    assert 200.0 < float(st["pt"].min()) and float(st["pt"].max()) < 300.0
    # winds: zonal jet projects onto D grid with the right magnitude
    u, v = eic.d_winds_from_latlon(st["ua"], st["va"], g)
    assert 15.0 < float(jnp.abs(u).max()) < 25.0
    assert not bool(jnp.isnan(u).any())


def test_latlon_interp_exact_for_linear():
    # bilinear interp reproduces a bilinear function of (lon-ish, lat)
    lon = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    lat = np.linspace(-1.5, 1.5, 31)
    f = lat[:, None] * 2.0 + np.cos(lon)[None, :] * 0.0 + 3.0
    w = eic.latlon_bilinear_weights(lon, lat, np.array([1.0, 2.0]),
                                    np.array([0.3, -0.7]))
    out = np.asarray(eic.interp_to_cube(jnp.asarray(f), w))
    np.testing.assert_allclose(out, 2.0 * np.array([0.3, -0.7]) + 3.0,
                               rtol=1e-12)


def test_nudging_relaxes_toward_target():
    K, n = 6, 8
    pm = jnp.broadcast_to(
        jnp.linspace(50e2, 900e2, K)[None, :, None, None], (6, K, n, n))
    state = {"pt": jnp.full((6, K, n, n), 250.0),
             "u": jnp.zeros((6, K, n + 1, n))}
    target = {"pt": jnp.full((6, K, n, n), 260.0),
              "u": jnp.full((6, K, n + 1, n), 10.0)}
    cfg = NudgeConfig(tau_t=3600.0, tau_winds=3600.0)
    out = nwp_nudge(1800.0, state, target, pm, cfg)
    # lower levels moved toward target, top (above p_wvp) untouched
    assert float(out["pt"][:, -1].min()) > 252.0
    np.testing.assert_allclose(np.asarray(out["pt"][:, 0]), 250.0)
    assert float(out["u"][:, -1].max()) > 2.0
    # never overshoots
    assert float(out["pt"].max()) <= 260.0


def test_iau_spreads_increment():
    state = {"pt": jnp.zeros((2, 2))}
    inc = {"pt": jnp.full((2, 2), 6.0)}
    iau = IAU(inc, window=3600.0, dt=600.0)
    for _ in range(10):           # more steps than the window
        state = iau.step(state)
    np.testing.assert_allclose(np.asarray(state["pt"]), 6.0, rtol=1e-12)
    one = apply_da_increment({"pt": jnp.zeros((2, 2))}, inc)
    np.testing.assert_allclose(np.asarray(one["pt"]), 6.0)


def test_get_ncep_ic_virtual_t_and_names():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ana = _analysis()
    raw = {"PS": ana["ps"], "PHIS": ana["phis"], "T": ana["t"],
           "Q": ana["sphum"], "U": ana["u"], "V": ana["v"],
           "hyai": ana["ak_src"], "hybi": ana["bk_src"],
           "lon": ana["lon"], "lat": ana["lat"]}
    st = eic.get_ncep_ic(raw, g.geom, ak, bk, ptop, g=g)
    stv = eic.get_ncep_ic(raw, g.geom, ak, bk, ptop, g=g,
                          t_is_virtual=False)
    # virtual-T conversion cools by ~ zvir*q*T
    dT = np.asarray(stv["pt"]) - np.asarray(st["pt"])
    assert (dT > 0).all() and float(dT.max()) < 0.5
    assert "u" in st and st["u"].shape == (6, NPZ, g.n + 1, g.n)


def test_get_ecmwf_ic_condensates():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ana = _analysis()
    raw = {"sp": ana["ps"], "z": ana["phis"], "t": ana["t"],
           "q": ana["sphum"], "u": ana["u"], "v": ana["v"],
           "clwc": 1e-5 * np.ones_like(ana["t"]),
           "ciwc": 2e-6 * np.ones_like(ana["t"]),
           "hyai": 0, "ak_src": ana["ak_src"], "bk_src": ana["bk_src"],
           "longitude": ana["lon"], "latitude": ana["lat"]}
    st = eic.get_ecmwf_ic(raw, g.geom, ak, bk, ptop, g=g)
    assert "liq_wat" in st and "ice_wat" in st
    np.testing.assert_allclose(np.asarray(st["liq_wat"]), 1e-5, rtol=1e-6)


def test_get_nggps_ic_cube_native_delz():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    n = g.n
    Ks = 14
    ak_s = np.linspace(100.0, 0.0, Ks + 1)
    bk_s = np.linspace(0.0, 1.0, Ks + 1) ** 1.2
    ps = np.full((6, n, n), 1.0e5)
    t = np.full((6, Ks, n, n), 260.0)
    # isothermal heights consistent with hydrostatics
    import gfdl_atmos_cubed_sphere_tpu.constants as con
    pe = ak_s[:, None, None] + bk_s[:, None, None] * ps[0, :1]
    zh1 = (con.RDGAS * 260.0 / con.GRAV
           * np.log(pe[-1][None] / pe))                      # [Ks+1,1,n]
    zh = np.broadcast_to(zh1[None, :, :], (6, Ks + 1, n, n)).copy()
    data = dict(ps=ps, t=t, zh=zh, sphum=np.full((6, Ks, n, n), 1e-3),
                ak_src=ak_s, bk_src=bk_s)
    st = eic.get_external_ic("nggps", data, ak, bk, ptop)
    assert st["delp"].shape == (6, NPZ, n, n)
    assert (np.asarray(st["delz"]) < 0).all()
    # remapped isothermal delz ~ hydrostatic thickness on new levels
    pe2 = ak + bk * 1.0e5
    dz2 = -(con.RDGAS * 260.0 / con.GRAV) * np.diff(np.log(pe2))
    np.testing.assert_allclose(np.asarray(st["delz"])[0, :, 5, 5], dz2,
                               rtol=0.05)


def test_get_hrrr_ic_staggered_winds_and_w():
    """HRRR cube-native flavor (external_ic.F90 get_hrrr_ic:816): remaps
    D-grid staggered winds and w; with identical source/target coordinates
    constant fields pass through unchanged."""
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    n = g.n
    Ks = NPZ
    ps = np.full((6, n, n), 1.0e5)
    import gfdl_atmos_cubed_sphere_tpu.constants as con
    pe = ak[:, None, None] + bk[:, None, None] * ps[0, :1]
    zh1 = (con.RDGAS * 260.0 / con.GRAV
           * np.log(pe[-1][None] / pe))
    zh = np.broadcast_to(zh1[None, :, :], (6, Ks + 1, n, n)).copy()
    data = dict(ps=ps, t=np.full((6, Ks, n, n), 260.0), zh=zh,
                sphum=np.full((6, Ks, n, n), 1e-3),
                w=np.full((6, Ks, n, n), 0.3),
                ud=np.full((6, Ks, n + 1, n), 7.0),
                vd=np.full((6, Ks, n, n + 1), -4.0),
                ak_src=np.asarray(ak), bk_src=np.asarray(bk))
    st = eic.get_external_ic("hrrr", data, ak, bk, ptop)
    assert st["u"].shape == (6, NPZ, n + 1, n)
    assert st["v"].shape == (6, NPZ, n, n + 1)
    np.testing.assert_allclose(np.asarray(st["u"]), 7.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st["v"]), -4.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st["w"]), 0.3, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st["pt"]), 260.0, rtol=1e-12)


def test_ps_nudging_mass_and_bias():
    """ps_nudging (fv_nudge.F90:833): mass goes into the sigma layers
    (dbk-weighted), increments cap at 10 hPa, and the bias correction
    removes the global-mean without reversing local signs."""
    import numpy as np
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.physics import nudging as ng
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    K = 12
    ks, ptop, ak, bk = set_eta(K)
    rng = np.random.default_rng(0)
    shp = (6, K, 4, 4)
    dbk = np.diff(np.asarray(bk)).reshape(1, K, 1, 1)
    delp = jnp.asarray(dbk * 1.0e5 + 0 * rng.uniform(size=shp))
    ps0 = float(ak[0]) + np.asarray(jnp.sum(delp, axis=1))[0, 0, 0]
    # target: +3 hPa everywhere, with one +50 hPa outlier (capped)
    tgt = jnp.full((6, 4, 4), ps0 + 300.0)
    tgt = tgt.at[0, 0, 0].set(ps0 + 5000.0)
    area = jnp.ones((6, 4, 4))
    delp2, dps = ng.ps_nudging(600.0, ak, bk, tgt, delp, area=area,
                               tau=600.0, do_bias=False)
    ps2 = float(ak[0]) + jnp.sum(delp2, axis=1)
    # full relaxation in one tau: ps moves by the (capped) increment
    np.testing.assert_allclose(np.asarray(ps2)[1], ps0 + 300.0, rtol=1e-6)
    assert abs(float(ps2[0, 0, 0]) - (ps0 + 1000.0)) < 1.0   # 10 hPa cap
    # mass entered only where bk varies: top (pure-pressure) layers exact
    pure = np.asarray(np.diff(np.asarray(bk))) == 0.0
    if pure.any():
        np.testing.assert_allclose(np.asarray(delp2)[:, pure],
                                   np.asarray(delp)[:, pure])
    # bias correction drives the area mean toward zero, keeps signs
    inc = jnp.asarray(rng.normal(2.0, 1.0, (6, 4, 4)))   # biased +2
    out = ng.ps_bias_correction(inc, area)
    assert abs(float(jnp.sum(out) / out.size)) < abs(
        float(jnp.sum(inc) / inc.size))
    assert not bool(((inc > 0) & (out < 0)).any())


def test_obs_schedule_and_remap():
    import numpy as np
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.physics import nudging as ng
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    KS, K = 12, 10
    a0 = {"t": np.full((6, KS, 3, 3), 250.0)}
    a1 = {"t": np.full((6, KS, 3, 3), 260.0)}
    sch = ng.ObsSchedule([0.0, 3600.0], [a0, a1])
    mid = sch.target_at(1800.0)
    np.testing.assert_allclose(np.asarray(mid["t"]), 255.0)
    # remap a linear-in-logp profile onto model levels: stays bounded
    ks, ptop, ak, bk = set_eta(K)
    aks = np.linspace(50.0, 0.0, KS + 1)
    bks = np.linspace(0.0, 1.0, KS + 1)
    ps = np.full((6, 3, 3), 1.0e5)
    out = ng.remap_analysis_to_model(mid, aks, bks, ps, ak, bk,
                                     fields=("t",), winds=())
    t2 = np.asarray(out["t"])
    assert t2.shape == (6, K, 3, 3)
    assert 249.0 < t2.min() and t2.max() < 256.0


def test_climate_nudge_file_pipeline(tmp_path):
    """Round-4 VERDICT missing #6: the read_climate_nudge_data.F90 file
    pipeline — CAM-style climatology (P0/hyai/hybi/PHIS/PS/T/Q/U/V on a
    lat-lon grid), horizontal bilinear remap, terrain-adjusted ps
    (remap_ps), linear/log-p vertical remap, two-level time cache, and
    the get_factor vertical relaxation profile."""
    import numpy as np
    import jax.numpy as jnp
    from scipy.io import netcdf_file
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.io.climate_nudge_data import (
        ClimateNudgeDriver, ClimateNudgeConfig, get_factor, remap_ps)
    import gfdl_atmos_cubed_sphere_tpu.constants as con

    # ---- synthesize a CAM-style climatology file ----------------------
    nlon, nlat, nlev, ntime = 24, 13, 12, 3
    lon = np.linspace(0.0, 360.0 - 360.0 / nlon, nlon)
    lat = np.linspace(-88.0, 88.0, nlat)
    hyai = np.linspace(0.003, 0.0, nlev + 1)
    hybi = np.linspace(0.0, 1.0, nlev + 1) ** 1.4
    p0 = 1.0e5
    t3 = np.zeros((ntime, nlev, nlat, nlon))
    for ti in range(ntime):
        # zonal T structure + per-time offset (checks time interpolation)
        t3[ti] = (260.0 + 30.0 * np.cos(np.deg2rad(lat))[None, :, None]
                  + 2.0 * ti)
    q3 = np.full((ntime, nlev, nlat, nlon), 4.0e-3)
    u3 = np.tile(10.0 * np.cos(np.deg2rad(lat))[None, None, :, None],
                 (ntime, nlev, 1, nlon))
    v3 = np.zeros_like(u3)
    ps2 = np.full((ntime, nlat, nlon), 1.0e5)
    phis2 = np.zeros((nlat, nlon))

    path = str(tmp_path / "clim_nudge_01.nc")
    f = netcdf_file(path, "w")
    for nm, size in (("lon", nlon), ("lat", nlat), ("lev", nlev),
                     ("levp", nlev + 1), ("time", ntime)):
        f.createDimension(nm, size)
    def var(nm, dims, data):
        v = f.createVariable(nm, "d", dims)
        v[:] = data
    var("lon", ("lon",), lon)
    var("lat", ("lat",), lat)
    var("time", ("time",), np.array([0.0, 86400.0, 172800.0]))
    var("hyai", ("levp",), hyai)
    var("hybi", ("levp",), hybi)
    f.createDimension("scalar", 1)
    var("P0", ("scalar",), np.array([p0]))
    var("PHIS", ("lat", "lon"), phis2)
    var("PS", ("time", "lat", "lon"), ps2)
    var("T", ("time", "lev", "lat", "lon"), t3)
    var("Q", ("time", "lev", "lat", "lon"), q3)
    var("U", ("time", "lev", "lat", "lon"), u3)
    var("V", ("time", "lev", "lat", "lon"), v3)
    f.close()

    # ---- drive it on a C12L10 model grid ------------------------------
    npx, npz = 13, 10
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    phis_mod = np.zeros((6, 1, npx - 1, npx - 1))
    cfg = ClimateNudgeConfig(t_tau=21600.0, q_tau=21600.0, u_tau=21600.0,
                             v_tau=21600.0, skip_bot_t=3)
    drv = ClimateNudgeDriver(path, g.geom, ak, bk, phis_mod, cfg=cfg)

    tgt0 = drv.target_at(0.0)
    tgt_mid = drv.target_at(43200.0)          # halfway level 0 -> 1
    # the +2 K/day time structure shows up as +1 K at the half-day point
    d = np.nanmean(tgt_mid["t"] - tgt0["t"])
    assert 0.8 < d < 1.2, d
    # ps on flat terrain stays ~1e5 through remap_ps
    np.testing.assert_allclose(tgt0["ps"], 1.0e5, rtol=5e-3)
    # zonal structure survives: warmer at the equator
    lat_m = np.asarray(g.geom.interior("aglat"))
    t_low = np.asarray(tgt0["t"][:, -1])
    assert (t_low[np.abs(lat_m) < 0.3].mean()
            > t_low[np.abs(lat_m) > 1.0].mean() + 10.0)
    # two-level cache holds at most 2 entries
    drv.target_at(100000.0)
    assert len(drv._cache) <= 2

    # tendencies relax toward the target with the vertical factor
    t_model = np.asarray(tgt0["t"]) - 5.0
    q_model = np.asarray(tgt0["q"])
    tend = drv.tendencies(0.0, t_model, q_model,
                          state_u=np.zeros_like(t_model),
                          state_v=np.zeros_like(t_model))
    fac = get_factor(npz, skip_bot_t=3)
    np.testing.assert_allclose(
        tend["t_dt"][0, :, 0, 0],
        fac[:, 1] * 5.0 / 21600.0, rtol=1e-6)
    assert tend["t_dt"][0, -1].max() == 0.0          # skipped bottom
    assert "u_dt" in tend and "q_dt" in tend

    # remap_ps terrain adjustment: higher model terrain -> lower ps
    gz_dat = np.zeros((4,))
    km = 8
    pe = np.linspace(2.0e4, 1.0e5, km + 1)
    ph = np.tile(pe, (4, 1))
    pn = np.log(ph)
    tp = np.full((4, km), 280.0)
    phis_hi = np.array([0.0, 1000.0 * con.GRAV, 2000.0 * con.GRAV,
                        -500.0 * con.GRAV])
    ps = remap_ps(gz_dat, ph, pn, tp, phis_hi)
    assert ps[0] == pytest.approx(1.0e5, rel=1e-6)
    assert ps[1] < ps[0] and ps[2] < ps[1]
    assert ps[3] > ps[0]                      # below-ground extrapolation
