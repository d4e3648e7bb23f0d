"""External forcings (#34), output bundles (#26/#29), age-of-air."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.physics.forcing_externals import (
    ExternalSST, AeroClimatology, WForcingConfig, do_w_forcing, age_of_air)
from gfdl_atmos_cubed_sphere_tpu.io.output_bundles import (
    nggps_bundle, cmip_bundle, register_and_send, PLEV19)
from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import DiagManager

N, K = 12, 10


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, np.asarray(ak), np.asarray(bk), ptop)
    return g, ak, bk, ptop, ic


def test_external_sst_cube(setup):
    g = setup[0]
    nlat, nlon = 31, 60
    lats = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lons = np.linspace(0, 2 * np.pi, nlon, endpoint=False)
    # SST = 300 - 30*sin^2(lat): zonally symmetric, exactly representable
    sst = ExternalSST(lons, lats, 300.0 - 30.0 * np.sin(lats[:, None]) ** 2
                      * np.ones((1, nlon)))
    cube = sst.to_cube(g.geom)
    assert cube.shape == (6, N, N)
    lat_c = g.geom.interior("aglat")
    expect = 300.0 - 30.0 * np.sin(lat_c) ** 2
    np.testing.assert_allclose(np.asarray(cube), expect, atol=0.2)


def test_aero_climatology_remap(setup):
    g, ak, bk, ptop, ic = setup
    kc = 8
    p_edge_c = np.linspace(1000.0, 101000.0, kc + 1)
    pc = 0.5 * (p_edge_c[1:] + p_edge_c[:-1])
    # aerosol linear in log-p, constant in month/space -> exact interp
    prof = 1.0e-6 * np.log(pc / 100.0)
    f = np.broadcast_to(prof[None, :, None, None],
                        (12, kc, 19, 36)).copy()
    aero = AeroClimatology(np.linspace(0, 2 * np.pi, 36, endpoint=False),
                           np.linspace(-np.pi / 2, np.pi / 2, 19),
                           p_edge_c, {"so4": f})
    delp = jnp.asarray(ic["delp"])
    out = aero.to_model(g.geom, delp, ptop, month_frac=3.4)
    q = np.asarray(out["so4"])
    assert q.shape == delp.shape
    pe = ptop + np.cumsum(np.asarray(delp), axis=1)
    p_lay = pe - 0.5 * np.asarray(delp)
    inside = (p_lay > pc[0]) & (p_lay < pc[-1])
    expect = 1.0e-6 * np.log(p_lay / 100.0)
    np.testing.assert_allclose(q[inside], expect[inside], rtol=2e-3)
    # time interp between identical months is identity
    np.testing.assert_allclose(q[inside], expect[inside], rtol=2e-3)


def test_w_forcing_bubble_and_divergence():
    T, n, kz = 1, 16, 12
    delz = jnp.full((T, kz, n, n), -500.0)
    phis = jnp.zeros((T, n, n))
    w = jnp.zeros((T, kz, n, n))
    cfg = WForcingConfig(w_forcing_type=1, a=0.02, i0=8, j0=8, L=4.0e3,
                         R=4.0e3, H=1.5e3, D=1.5e3, dx_const=1.0e3)
    w1 = do_w_forcing(w, delz, phis, cfg, dt=10.0, time=0.0)
    assert float(w1.max()) > 0.0
    # max at the bubble center height (z=1500 m -> layer kz-3, 0-based)
    kmax = int(jnp.argmax(jnp.max(w1, axis=(0, 2, 3))))
    zc = -float(delz[0, 0, 0, 0]) * (kz - kmax - 0.5)
    assert abs(zc - 1500.0) <= 500.0
    # outside the x gate: zero
    assert float(jnp.abs(w1[..., 0]).max()) == 0.0

    cfg2 = WForcingConfig(w_forcing_type=101, divg=1.0e-5, tau=100.0)
    w2 = do_w_forcing(w, delz, phis, cfg2, dt=1.0e6, time=0.0)
    # long dt -> w converges to -divg * z_mid; subsidence increasing with z
    z_mid = 500.0 * (np.arange(kz)[::-1] + 0.5)
    np.testing.assert_allclose(np.asarray(w2[0, 2:, 0, 0]),
                               -1.0e-5 * z_mid[2:], rtol=1e-2)
    # sponge levels untouched
    assert float(jnp.abs(w2[0, :2]).max()) == 0.0
    # time gating
    cfg3 = WForcingConfig(w_forcing_type=1, start=0.0, end=100.0)
    assert float(jnp.abs(do_w_forcing(w, delz, phis, cfg3, 10.0,
                                      time=200.0)).max()) == 0.0


def test_age_of_air(setup):
    g, ak, bk, ptop, ic = setup
    delp = jnp.asarray(ic["delp"])
    pe_top = ptop + jnp.cumsum(delp, axis=1) - delp   # top-interface p
    q = jnp.full_like(delp, 7.0)
    q0 = age_of_air(q, pe_top, time=0.0)
    assert float(jnp.abs(q0).max()) == 0.0
    q1 = age_of_air(q, pe_top, time=86400.0)
    src = np.asarray(pe_top) >= 75000.0
    np.testing.assert_allclose(np.asarray(q1)[src], 5.0e-6 / 60.0 * 86400.0)
    np.testing.assert_allclose(np.asarray(q1)[~src], 7.0)


def test_omega_diagnostic(setup):
    """omga from the flux capacitors: finite, near-zero at the top,
    integrates the mass convergence."""
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import (
        fv_dynamics_hydro)
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    g, ak, bk, ptop, ic = setup
    prepare_phis(g, jnp.asarray(ic["phis"]))
    cfg = DynConfig(npx=N + 1, npz=K, dt=600.0, n_split=4)
    r = fv_dynamics_hydro(jnp.asarray(ic["delp"]), jnp.asarray(ic["pt"]),
                          jnp.asarray(ic["u"]), jnp.asarray(ic["v"]),
                          None, g, cfg, jnp.asarray(ak), jnp.asarray(bk),
                          ptop)
    om = np.asarray(r.omga)
    assert om.shape == ic["delp"].shape
    assert np.isfinite(om).all()
    assert np.abs(om).max() > 1.0e-6          # baroclinic wave is active
    # bottom-interface omega equals the full-column ps tendency
    dps = (np.asarray(r.delp).sum(axis=1)
           - np.asarray(ic["delp"]).sum(axis=1)) / 600.0
    np.testing.assert_allclose(om[:, -1], dps, atol=5e-7 * np.abs(dps).max()
                               + 1e-10, rtol=2e-2)


def test_adiabatic_init():
    """Forward-backward init damps the initial imbalance: the one-step ps
    tendency shrinks (atmosphere.F90 adiabatic_init:194)."""
    from gfdl_atmos_cubed_sphere_tpu.driver.solo import Atmosphere
    atm = Atmosphere(N + 1, K, dt=600.0, case="jw_unperturbed",
                     dtype="f64", cfg_overrides={"n_split": 4})
    base = dict(atm.state)

    def ps_tend(a):
        s0 = a.state["delp"].sum(axis=1)
        a.atmosphere(1)
        return float(jnp.abs(a.state["delp"].sum(axis=1) - s0).max())

    t_raw = ps_tend(atm)
    atm.state = dict(base)
    atm.adiabatic_init(na_init=2)
    assert not bool(jnp.isnan(atm.state["pt"]).any())
    t_init = ps_tend(atm)
    assert t_init < t_raw


def test_output_bundles(setup):
    g, ak, bk, ptop, ic = setup
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v")}
    st["phis"] = jnp.asarray(ic["phis"])
    q = {"sphum": jnp.full_like(st["delp"], 1.0e-3)}
    bundle = nggps_bundle(st, q, g, ptop)
    for name in ("ucomp", "vcomp", "temp", "delp", "pfull", "ps", "sphum"):
        assert name in bundle and bundle[name] is not None
    assert bundle["ps"].shape == (6, N, N)
    assert float(bundle["ps"].min()) > 5.0e4
    # pfull between the bounding interface pressures
    assert float(bundle["pfull"].max()) < float(bundle["ps"].max())

    cm = cmip_bundle(st, q, g, ptop, plevs=[85000.0, 70000.0])
    assert cm["ua"].shape == (6, 2, N, N)
    assert float(cm["ta"].min()) > 150.0 and float(cm["ta"].max()) < 350.0
    assert float(cm["psl"].min()) > 9.0e4
    assert len(PLEV19) == 19

    dm = DiagManager()
    register_and_send(dm, cm, prefix="cmip_")
    register_and_send(dm, cm, prefix="cmip_")
    assert dm.series("cmip_ua").shape[0] == 2


def test_fv_diag_sweep_registers_and_sends():
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (DiagManager,
                                                            fv_diag)
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

    g = build_grid_ops(13, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(10)
    ic = jw_baroclinic(g.geom, 10, ak, bk, ptop, perturb=True, moist=True)
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v", "w",
                                          "delz", "phis")}
    if st["phis"].ndim == 3:
        st["phis"] = st["phis"][:, None]
    q = {"sphum": jnp.asarray(ic["sphum"]),
         "rainwat": jnp.full_like(jnp.asarray(ic["sphum"]), 1e-5)}
    dm = DiagManager()
    out = fv_diag(dm, st, q, g, ak, bk, ptop, hydrostatic=False)
    for key in ("ucomp", "temp", "ps", "slp", "vort850", "u500", "cape",
                "max_reflectivity", "uh25", "tq"):
        assert key in out, key
    # sent into the registry with one snapshot each
    assert len(dm.series("slp")) == 1
    # slp is higher than ps wherever terrain is elevated
    import numpy as np
    phis = np.asarray(st["phis"][:, 0])
    sel = phis > 100.0
    if sel.any():
        assert (np.asarray(out["slp"])[sel] >
                np.asarray(out["ps"])[sel]).all()
    # second sweep appends
    fv_diag(dm, st, q, g, ak, bk, ptop, hydrostatic=False)
    assert len(dm.series("slp")) == 2


def test_fv_diag_breadth():
    """Round-4 diagnostics sweep: the registry carries >= 80 fields after
    one NH moist sweep (toward fv_diagnostics.F90's 266), and the new
    derived quantities are physically sane."""
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (DiagManager,
                                                            fv_diag)
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    import numpy as np

    g = build_grid_ops(13, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(10)
    ic = jw_baroclinic(g.geom, 10, ak, bk, ptop, perturb=True, moist=True)
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v", "w",
                                          "delz", "phis")}
    if st["phis"].ndim == 3:
        st["phis"] = st["phis"][:, None]
    shp = jnp.asarray(ic["sphum"]).shape
    q = {"sphum": jnp.asarray(ic["sphum"]),
         "liq_wat": jnp.full(shp, 2e-5), "rainwat": jnp.full(shp, 1e-5),
         "ice_wat": jnp.full(shp, 1e-5), "snowwat": jnp.full(shp, 1e-5),
         "graupel": jnp.full(shp, 1e-6)}
    dm = DiagManager()
    out = fv_diag(dm, st, q, g, ak, bk, ptop, hydrostatic=False)
    assert len(dm._fields) >= 80, len(dm._fields)
    for key in ("theta", "theta_e", "rh", "divg", "hght", "tm", "shear06",
                "srh03", "ustm", "wind100m", "intql", "lw", "iw", "ctt",
                "echo_top", "wmaxup", "s200", "zsurf", "us", "qn"):
        assert key in out, key
    # theta >= T everywhere (p < p00 aloft dominates)
    th = np.asarray(out["theta"]) - np.asarray(out["temp"])
    assert th[:, :-1].min() > -30.0
    # theta_e >= theta (latent term is positive)
    assert (np.asarray(out["theta_e"]) >= np.asarray(out["theta"]) - 1e-9).all()
    # rh positive, bounded by ~200% in a balanced IC
    assert np.asarray(out["rh"]).min() >= 0.0
    # hght decreases with k (increases upward), top above bottom
    hg = np.asarray(out["hght"])
    assert (hg[:, 0] > hg[:, -1]).all()
    # integrated water paths positive, lw = ql+qr columns
    np.testing.assert_allclose(np.asarray(out["lw"]),
                               np.asarray(out["intql"] + out["intqr"]))
    # storm motion is a bounded perturbation of the mean wind
    assert np.abs(np.asarray(out["ustm"])).max() < 150.0
    # cloud-top height above ground, below model top
    assert np.asarray(out["ctz"]).max() <= hg.max()
