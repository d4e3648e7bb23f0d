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
