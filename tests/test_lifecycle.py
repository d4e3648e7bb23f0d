"""Lifecycle: checkpoint/restart, fv_core.res export, diagnostics, HS
forcing, solo driver API (components #21, #26, #30, #31)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gfdl_atmos_cubed_sphere_tpu.io import restart as rst
from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (
    DiagManager, prt_maxmin, range_check, nan_check, zonal_mean)
from gfdl_atmos_cubed_sphere_tpu.utils.timing import Timers


def _fake_state(K=4, n=8):
    rng = np.random.default_rng(0)
    return {
        "u": rng.normal(size=(6, K, n + 1, n)),
        "v": rng.normal(size=(6, K, n, n + 1)),
        "pt": 250.0 + rng.normal(size=(6, K, n, n)),
        "delp": 1e4 + rng.normal(size=(6, K, n, n)),
        "w": rng.normal(size=(6, K, n, n)),
        "delz": -100.0 + rng.normal(size=(6, K, n, n)),
        "phis": rng.normal(size=(6, 1, n, n)),
    }


def test_checkpoint_roundtrip(tmp_path):
    state = _fake_state()
    tr = {"sphum": np.abs(np.random.default_rng(1).normal(size=(6, 4, 8, 8)))}
    ak = np.linspace(100.0, 0.0, 5)
    bk = np.linspace(0.0, 1.0, 5)
    path = str(tmp_path / "ck.npz")
    rst.save_state(path, state, ak=ak, bk=bk, tracers=tr, step=7,
                   time_seconds=123.0)
    s2, t2, man = rst.load_state(path)
    assert man["step"] == 7 and man["time_seconds"] == 123.0
    for k, v in state.items():
        np.testing.assert_array_equal(s2[k], v)
    np.testing.assert_array_equal(t2["sphum"], tr["sphum"])


def test_checkpoint_detects_corruption(tmp_path):
    state = _fake_state()
    path = str(tmp_path / "ck.npz")
    rst.save_state(path, state)
    s2, _, man = rst.load_state(path)
    # tamper: rewrite with wrong checksum in manifest
    import json
    man["checksums"]["u"] = "deadbeefdeadbeef"
    payload = {k: np.asarray(v) for k, v in s2.items()}
    payload["__manifest__"] = np.frombuffer(json.dumps(man).encode(),
                                            dtype=np.uint8)
    np.savez(path[:-4] + "_bad.npz", **payload)
    with pytest.raises(ValueError):
        rst.load_state(path[:-4] + "_bad.npz")


def test_fv_core_res_netcdf_roundtrip(tmp_path):
    state = _fake_state()
    ak = np.linspace(100.0, 0.0, 5)
    bk = np.linspace(0.0, 1.0, 5)
    path = str(tmp_path / "fv_core.res.nc")
    rst.export_fv_core_res(path, state, ak, bk,
                           tracers={"sphum": np.abs(state["pt"]) * 1e-5})
    s2, ak2, bk2, tr2 = rst.import_fv_core_res(path)
    np.testing.assert_allclose(ak2, ak)
    np.testing.assert_allclose(s2["u"], state["u"])
    np.testing.assert_allclose(s2["pt"], state["pt"])
    np.testing.assert_allclose(s2["delz"], state["delz"])
    assert "sphum" in tr2


def test_diag_manager(tmp_path):
    dm = DiagManager()
    dm.register("ps", "surface pressure", "Pa")
    for i in range(3):
        dm.send("ps", np.full((6, 4, 4), 1e5 + i))
    assert dm.series("ps").shape == (3, 6, 4, 4)
    dm.write_netcdf(str(tmp_path / "history.nc"))
    from scipy.io import netcdf_file
    with netcdf_file(str(tmp_path / "history.nc")) as f:
        assert f.variables["ps"].shape == (3, 6, 4, 4)


def test_audits():
    state = _fake_state()
    ok, lo, hi = range_check("pt", jnp.asarray(state["pt"]))
    assert ok
    ok, _, _ = range_check("pt", jnp.asarray(state["pt"]) + 300.0)
    assert not ok
    assert nan_check({"a": jnp.asarray([1.0, np.nan]),
                      "b": jnp.asarray([1.0])}) == ["a"]
    prt_maxmin("pt", jnp.asarray(state["pt"]), out=lambda s: None)


def test_timers():
    t = Timers(sync=False)
    with t("A"):
        with t("B"):
            pass
    d = t.asdict()
    assert "A" in d and "A/B" in d
    t.report(out=lambda s: None)


def test_solo_driver_hs_smoke():
    from gfdl_atmos_cubed_sphere_tpu.driver.solo import Atmosphere
    atm = Atmosphere(13, 10, 600.0, physics="hs", dtype="f64")
    atm.atmosphere(2)
    assert atm.audit(out=lambda s: None)
    assert atm.step_count == 2


def test_zonal_mean_shape():
    lat = np.random.default_rng(0).uniform(-np.pi / 2, np.pi / 2, (6, 8, 8))
    f = np.ones((6, 3, 8, 8))
    centers, zm = zonal_mean(f, lat, bins=16)
    assert zm.shape == (3, 16)
    assert np.allclose(zm[zm != 0], 1.0)


def test_shield_driver_split_api():
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.driver.shield import ShieldAtmosphere
    atm = ShieldAtmosphere(13, 10, 600.0, dtype="f64")
    atm.atmosphere_dynamics(1)
    sin = atm.atmos_phys_driver_statein()
    assert sin["prsl"].shape == (6, 10, 12, 12)
    assert float(sin["prsi"][:, -1].min()) > 9.0e4
    t_dt = jnp.full_like(atm.state["pt"], 1.0 / 86400.0)
    t_before = float(atm.state["pt"].mean())
    atm.atmosphere_state_update(t_dt=t_dt)
    assert float(atm.state["pt"].mean()) > t_before
    tb, ps = atm.get_bottom_mass()
    assert tb.shape == (6, 12, 12)
    nx, nz = atm.atmosphere_resolution()
    assert (nx, nz) == (12, 10)

    # round-4 query surface (atmosphere.F90:706-1922)
    cd = atm.atmosphere_control_data()
    assert cd["kt"] == 10 and cd["ntiles"] == 6
    lon, lat = atm.atmosphere_grid_bdry()
    assert lon.shape == (6, 13, 13)
    ak, bk = atm.atmosphere_etalvls()
    akf, bkf = atm.atmosphere_etalvls(flip=True)
    assert ak[0] == akf[-1]
    hgt = atm.atmosphere_hgt()
    assert hgt.shape == (6, 10, 12, 12)
    assert float(hgt[:, 0].min()) > float(hgt[:, -1].max())  # top above sfc
    padded = atm.atmosphere_scalar_field_halo(atm.state["pt"])
    assert padded.shape[-1] == 12 + 6
    dm, out = atm.atmosphere_nggps_diag()
    assert len(dm._fields) >= 40
    qd = atm.atmos_phys_qdt_diag({"sphum": atm.state["pt"] * 0},
                                 {"sphum": atm.state["pt"] * 0 + 1.0},
                                 100.0)
    assert abs(float(qd["sphum"].mean()) - 0.01) < 1e-12
    assert atm.atmosphere_coarsening_strategy() == "area"
    dom = atm.atmosphere_domain()
    assert dom["ntiles"] == 6 and not dom["bounded_domain"]


def test_native_fvio_restart_roundtrip(tmp_path):
    """C++ async-writer restart container (.fvio) roundtrips with
    checksums (io/native_io.py + io/restart.py)."""
    import numpy as np
    import pytest
    from gfdl_atmos_cubed_sphere_tpu.io import restart as rst
    from gfdl_atmos_cubed_sphere_tpu.io.native_io import native_available
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    state = {"delp": rng.random((6, 4, 8, 8), np.float32),
             "pt": rng.random((6, 4, 8, 8))}
    q = {"sphum": rng.random((6, 4, 8, 8), np.float32)}
    path = str(tmp_path / "ck.fvio")
    rst.save_state(path, state, tracers=q, step=42, time_seconds=123.0)
    s2, q2, man = rst.load_state(path)
    assert man["step"] == 42 and man["time_seconds"] == 123.0
    np.testing.assert_array_equal(s2["delp"], state["delp"])
    np.testing.assert_array_equal(q2["sphum"], q["sphum"])
    # corruption is detected by the CRC or sha256 layer
    import struct
    raw = bytearray(open(path, "rb").read())
    raw[200] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        rst.load_state(path)


def test_gfdl_driver_input_blocks():
    """AM4-style facade (driver/GFDL/atmosphere.F90:1473/:1532)."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.driver.gfdl import GFDLAtmosphere

    atm = GFDLAtmosphere(13, 10, 600.0, case="jw", dtype="f64")
    atm.atmosphere_dynamics()
    b = atm.atmos_physics_driver_inputs()
    K = 10
    assert b["p_half"].shape[1] == K + 1
    assert b["p_full"].shape[1] == K
    # monotone interface pressures, heights decrease upward index
    ph = np.asarray(b["p_half"])
    assert np.all(np.diff(ph, axis=1) > 0)
    zh = np.asarray(b["z_half"])
    assert np.all(zh[:, 0] >= zh[:, -1])
    assert float(zh[:, -1].max()) == 0.0     # surface-relative heights
    r = atm.atmos_radiation_driver_inputs()
    assert set(r) == {"p_half", "p_full", "t", "qgrs", "z_half",
                      "z_full", "phis"}


def test_no_dycore_physics_only():
    """no_dycore (fv_arrays.F90): the solo driver runs physics with the
    dynamics skipped — without physics the state is bitwise unchanged;
    with Held-Suarez the state evolves only through the forcing."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.driver.solo import Atmosphere
    atm = Atmosphere(13, 10, 600.0, physics="none",
                     cfg_overrides=dict(no_dycore=True, n_split=2))
    s0 = {k: np.asarray(v) for k, v in atm.state.items()}
    atm.atmosphere()                       # one step
    for k, v0 in s0.items():
        np.testing.assert_array_equal(np.asarray(atm.state[k]), v0)

    atm2 = Atmosphere(13, 10, 600.0, physics="hs",
                      cfg_overrides=dict(no_dycore=True, n_split=2))
    u0 = np.asarray(atm2.state["u"])
    atm2.atmosphere()
    assert np.abs(np.asarray(atm2.state["u"]) - u0).max() > 0.0
