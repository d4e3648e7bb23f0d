"""Time-dependent case forcings (component #23 tail).

Host-side transcriptions of /root/reference/tools/test_cases.F90:
  get_case9_B:4089, case9_forcing1:4119, case9_forcing2:4155 — the
  time-ramped topographic forcing of the Bates-Li polar-vortex SW case;
  case51_forcing:4174 (wind_field=1) — the DCMIP 1-1 prescribed
  deformational winds + prescribed-omega pressure update driving the 3-D
  tracer-advection case.
"""

import numpy as np

from .. import constants as con
from .sw_cases import _project_dgrid, _interior, _k1

H = 3
DAY = 86400.0


def get_case9_B(geom):
    """Forcing shape function B (get_case9_B:4089): northern-hemisphere
    wavenumber-1 ridge, zero in the south. Returns the padded cell
    field [T, NC, NC]."""
    lam = geom.arrays["aglon"]
    th = geom.arrays["aglat"]
    gh0 = 720.0 * con.GRAV
    with np.errstate(all="ignore"):
        yy = (np.cos(th) / np.sin(th)) ** 2
        B = np.where(np.sin(th) > 0.0,
                     gh0 * yy * np.exp(1.0 - yy) * np.sin(lam), 0.0)
    return np.nan_to_num(B)


class Case9Forcing:
    """Stateful A(t) ramp of the case-9 forcing (case9_forcing1/2):
    phis ramps up over 4 days, holds for 12, ramps down by day 20, with
    the step phis taken as the mean of the level at the previous call
    and the current one (the AofT(1)/AofT(2) rotation)."""

    def __init__(self, geom):
        self.B = get_case9_B(geom)
        self.geom = geom
        self.a_prev = 0.0
        self.a_now = 0.0

    @staticmethod
    def amplitude(t_seconds):
        tday = t_seconds / DAY
        if tday >= 20.0:
            a = 0.5 * (1.0 - np.cos(0.25 * np.pi * (tday - 20.0)))
            if tday == 24.0:
                a = 1.0
        elif tday <= 4.0:
            a = 0.5 * (1.0 - np.cos(0.25 * np.pi * tday))
        elif tday <= 16.0:
            a = 1.0
        else:
            a = 0.5 * (1.0 + np.cos(0.25 * np.pi * (tday - 16.0)))
        return float(a)

    def forcing1(self, t_seconds):
        """Pre-step phis: mean of the previous and current amplitude
        (case9_forcing1). Returns the padded phis frame [T, 1, NC, NC]."""
        self.a_now = self.amplitude(t_seconds)
        amean = 0.5 * (self.a_prev + self.a_now)
        return _k1(amean * self.B)

    def forcing2(self):
        """Post-step phis at the current amplitude + AofT rotation
        (case9_forcing2)."""
        phis = _k1(self.a_now * self.B)
        self.a_prev = self.a_now
        return phis


# --- case 51 (DCMIP 1-1) prescribed forcing -------------------------------

PERIOD = 12.0 * DAY


def case51_dgrid_winds(geom, time):
    """Time-dependent deformational D-grid winds (case51_forcing
    wind_field=1, test_cases.F90:4364-4420): the DCMIP 1-1 analytic form
    with solid-body translation, projected on the wall unit vectors.
    NOTE: the analytic lon offset and time modulation use the DCMIP
    definitions lon' = lon - 2 pi t / T and cos(pi t / T); the Fortran
    writes `period*(time...)` where `period` has been reassigned — the
    intended (documented) DCMIP form is used here. Returns padded
    (u [T, NW, NC], v [T, NC, NW])."""
    ubar = 10.0 * con.RADIUS / PERIOD
    utrans = 2.0 * np.pi * con.RADIUS / PERIOD

    def fn(lon, lat):
        lp = lon - 2.0 * np.pi * time / PERIOD
        u = (ubar * np.sin(lp) ** 2 * np.sin(2.0 * lat)
             * np.cos(np.pi * time / PERIOD) + utrans * np.cos(lat))
        v = ubar * np.sin(2.0 * lp) * np.cos(lat) \
            * np.cos(np.pi * time / PERIOD)
        return u, v

    return _project_dgrid(fn, geom)


def case51_forcing(delp, pe, geom, time, dt, ptop):
    """Prescribed-omega pressure update + new winds for the 3-D tracer
    advection case (case51_forcing:4174, wind_field=1): pe is advanced
    by the prescribed vertical velocity, delp rebuilt, and the D/C
    winds re-evaluated at the new time. delp [T, K, n, n] interior;
    pe [T, K+1, n, n] interior interfaces. Returns
    (delp_new, pe_new, u, v, uc, vc) with winds PADDED."""
    from .dcmip import case51_cgrid_winds
    lam = geom.interior("aglon")
    th = geom.interior("aglat")
    omega0 = 23000.0 * np.pi / PERIOD
    dt2 = 0.5 * dt
    ps = pe[:, -1:]
    s = np.minimum(1.0, 2.0 * np.sqrt(np.sin(
        np.clip((pe - ptop) / (ps - ptop), 0.0, 1.0) * np.pi)))
    tmid = time + dt2
    lp = lam[:, None] - 2.0 * np.pi * tmid / PERIOD
    pe_new = pe + dt * omega0 * np.sin(lp) * np.cos(th[:, None]) \
        * np.cos(np.pi * tmid / PERIOD) * np.sin(s * 0.5 * np.pi)
    # keep the boundaries fixed
    pe_new[:, 0] = pe[:, 0]
    pe_new[:, -1] = pe[:, -1]
    delp_new = pe_new[:, 1:] - pe_new[:, :-1]
    u, v = case51_dgrid_winds(geom, time + dt)
    uc, vc = case51_cgrid_winds(geom, time + dt)
    return delp_new, pe_new, u, v, uc, vc
