"""Tracer registry (tracer_manager analog) and time manager (calendar)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.utils.tracer_registry import (
    TracerRegistry, default_registry)
from gfdl_atmos_cubed_sphere_tpu.utils.time_manager import (
    Alarm, JULIAN, NOLEAP, THIRTY_DAY, Time, get_date, get_time, set_date,
    set_time)


pytestmark = pytest.mark.fast


def test_default_registry_canonical():
    r = default_registry(nwat=6)
    assert r.nwat == 6
    assert r.names[:6] == ("sphum", "liq_wat", "ice_wat", "rainwat",
                           "snowwat", "graupel")
    assert r.get_tracer_index("sphum") == 1          # 1-based, Fortran style
    assert r.get_tracer_index("nope") == 0
    assert not r["cld_amt"].adjust_mass
    assert r["cld_amt"].kord == 9                    # fv_dynamics.F90:571


def test_registry_profiles_and_init():
    r = default_registry(nwat=2, extras=("o3mr",))
    shape = (6, 10, 4, 4)
    q = r.init_tracers(shape, dtype=jnp.float64,
                       sphum=jnp.full(shape, 1e-3))
    assert set(q) == {"sphum", "liq_wat", "cld_amt", "o3mr"}
    assert float(q["sphum"][0, 0, 0, 0]) == 1e-3
    prof = r.set_tracer_profile("sphum", shape)
    # log-linear ramp: monotone increasing downward
    col = np.asarray(prof)[0, :, 0, 0]
    assert np.all(np.diff(col) > 0)
    assert abs(col[-1] - 3e-6) / 3e-6 < 1e-5


def test_time_arithmetic_exact():
    t = set_time(seconds=86399, days=1) + set_time(seconds=2)
    assert (t.days, t.seconds) == (2, 1)
    assert get_time(t - set_time(seconds=1)) == (0, 2)
    dt = set_time(seconds=450)
    one_day = 192 * dt
    assert one_day.total_seconds() == 86400
    assert set_time(1) < set_time(2)


def test_calendar_roundtrip():
    for cal in (JULIAN, NOLEAP, THIRTY_DAY):
        t = set_date(2000, 2, 28, 12, 30, 15, calendar=cal)
        assert get_date(t, calendar=cal) == (2000, 2, 28, 12, 30, 15)
    # leap day exists in JULIAN, not NOLEAP
    t = set_date(2000, 2, 29, calendar=JULIAN)
    assert get_date(t, calendar=JULIAN)[:3] == (2000, 2, 29)
    t365 = set_date(2001, 1, 1, calendar=NOLEAP) - set_date(
        2000, 1, 1, calendar=NOLEAP)
    assert t365.days == 365
    t366 = set_date(2001, 1, 1, calendar=JULIAN) - set_date(
        2000, 1, 1, calendar=JULIAN)
    assert t366.days == 366
    t360 = set_date(2001, 1, 1, calendar=THIRTY_DAY) - set_date(
        2000, 1, 1, calendar=THIRTY_DAY)
    assert t360.days == 360


def test_alarm():
    a = Alarm(set_time(seconds=3600))
    assert not a.is_ringing(set_time(seconds=3599))
    assert a.is_ringing(set_time(seconds=3600))
    a.reset(set_time(seconds=3600))
    assert not a.is_ringing(set_time(seconds=7199))
    assert a.is_ringing(set_time(seconds=7200))


def test_diag_time_interval_averaging():
    """diag_manager time_avg semantics: avg_interval=N sends -> one
    averaged record; flush_avg emits partial tails."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import DiagManager
    dm = DiagManager()
    dm.register("t_avg", avg_interval=3)
    dm.register("t_inst")
    dm.register("oro", static=True)
    for v in (1.0, 2.0, 3.0, 10.0):
        dm.send("t_avg", np.full((2, 2), v))
        dm.send("t_inst", np.full((2, 2), v))
        dm.send("oro", np.full((2, 2), 7.0))
    s = dm.series("t_avg")
    assert s.shape[0] == 1 and np.allclose(s[0], 2.0)   # (1+2+3)/3
    dm.flush_avg()
    s = dm.series("t_avg")
    assert s.shape[0] == 2 and np.allclose(s[1], 10.0)
    assert dm.series("t_inst").shape[0] == 4
    assert dm.series("oro").shape[0] == 1


def test_jit_internal_audit():
    import jax, jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (
        audit_state, audit_ok)

    @jax.jit
    def step(t, delp):
        aud = audit_state({"pt": t, "delp": delp})
        return audit_ok(aud)

    ok = step(jnp.full((4, 4), 250.0), jnp.full((4, 4), 500.0))
    assert bool(ok)
    bad = step(jnp.full((4, 4), 5.0), jnp.full((4, 4), 500.0))  # pt < 104K
    assert not bool(bad)


def test_coarse_diag_mirror():
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (
        DiagManager, coarse_diag)
    dm = DiagManager()
    f = np.arange(64.0).reshape(8, 8)
    coarse_diag(dm, {"ps": f}, 2, strategy="mean")
    s = dm.series("crs_ps")
    assert s.shape == (1, 4, 4)
    assert np.isclose(s[0, 0, 0], f[:2, :2].mean())


def _diag_setup(npz=20):
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    g = build_grid_ops(13, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, moist=True)
    prepare_phis(g, ic["phis"])
    st = {k: jnp.asarray(ic[k])
          for k in ("delp", "pt", "u", "v", "w", "delz", "phis")}
    q = {"sphum": jnp.asarray(ic["sphum"])}
    for nm in ("liq_wat", "rainwat", "ice_wat", "snowwat", "graupel"):
        q[nm] = jnp.full(q["sphum"].shape, 1e-6)
    return g, st, q, ak, bk, ptop


def test_fv_diag_registry_breadth():
    """Round-4 VERDICT item 5: the fv_diag sweep registers >= 150 fields
    (reference registry: 266 register_diag_field outputs,
    fv_diagnostics.F90:154+), including the plev suites, flux products,
    isentropic PV, hurricane categories, and CMIP rh singles."""
    import jax.numpy as jnp
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (
        DiagManager, fv_diag)
    g, st, q, ak, bk, ptop = _diag_setup()
    dm = DiagManager()
    out = fv_diag(dm, st, q, g, ak, bk, ptop, hydrostatic=False)
    assert len(dm._fields) >= 150, len(dm._fields)
    for name in ("u_plev", "h_plev", "omg_plev", "rh_plev", "z500",
                 "u850", "t200", "uq", "vt_vi", "ww", "pv350K", "pv550K",
                 "cat15", "f45", "BRN", "srh25", "pfnh", "ppnh", "tb",
                 "pmask", "rh500_cmip", "aam", "x850"):
        assert name in dm._fields, name
    # plev suite has the full standard-level axis
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import STD_PLEVS
    assert out["u_plev"].shape[1] == len(STD_PLEVS)
    # z500 is physically sensible (5-6 km)
    z5 = out["z500"]
    ok = ~jnp.isnan(z5)
    assert float(jnp.nanmean(z5)) > 4000.0 and float(jnp.nanmean(z5)) < 7000.0
    assert bool(ok.any())


def test_diag_table_selection():
    """diag_table ingestion (FMS diag_manager table format): parsing
    title/base date/file/field lines, and the selection restricting the
    DiagManager registry exactly like register_diag_field id=-1 does."""
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import (
        DiagManager, fv_diag, parse_diag_table)
    text = '''test_case
2026 08 21 0 0 0
"atmos_daily", 24, "hours", 1, "days", "time"
"atmos_hourly", 1, "hours", 1, "days", "time"
"dynamics", "ucomp", "ucomp", "atmos_daily", "all", .false., "none", 2
"dynamics", "slp", "slp_out", "atmos_hourly", "all", .true., "none", 2
"dynamics", "cape", "cape", "atmos_daily", "all", .false., "none", 2
'''
    tbl = parse_diag_table(text)
    assert tbl["title"] == "test_case"
    assert tbl["base_date"] == (2026, 8, 21, 0, 0, 0)
    assert set(tbl["files"]) == {"atmos_daily", "atmos_hourly"}
    assert tbl["files"]["atmos_daily"]["freq"] == 24
    assert tbl["selected"] == {"ucomp", "slp", "cape"}
    assert tbl["fields"][1]["output_name"] == "slp_out"

    g, st, q, ak, bk, ptop = _diag_setup()
    dm = DiagManager(selection=tbl["selected"])
    fv_diag(dm, st, q, g, ak, bk, ptop, hydrostatic=False)
    assert set(dm._fields) == {"ucomp", "slp", "cape"}
    assert dm.series("slp") is not None
    # unselected names are rejected at registration and send
    assert dm.register("vort") is None
    assert dm.send("vort", st["pt"]) is False
