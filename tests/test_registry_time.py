"""Tracer registry (tracer_manager analog) and time manager (calendar)."""

import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.utils.tracer_registry import (
    TracerRegistry, default_registry)
from gfdl_atmos_cubed_sphere_tpu.utils.time_manager import (
    Alarm, JULIAN, NOLEAP, THIRTY_DAY, Time, get_date, get_time, set_date,
    set_time)


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
