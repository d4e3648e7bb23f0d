"""SHiELD-style split driver API (component #32).

Re-implements the facade of /root/reference/driver/SHiELD/atmosphere.F90:
atmosphere_init:205 / atmosphere_dynamics:489 / atmosphere_state_update:1065
/ atmosphere_end, plus the physics-interface queries
(atmos_phys_driver_statein:1628, get_bottom_wind/mass, atmosphere_grid_*).
The host physics sees A-grid lat-lon winds and layer pressures; tendencies
come back on the A grid and are scattered by fv_update_phys.
"""

import numpy as np

from .. import constants as con
from .solo import Atmosphere as _SoloAtmosphere


class ShieldAtmosphere(_SoloAtmosphere):
    """Split-phase facade. Usage:
        atm = ShieldAtmosphere(npx, npz, dt)
        atm.atmosphere_dynamics()          # dycore only
        sin = atm.atmos_phys_driver_statein()
        ... host physics computes u_dt/v_dt/t_dt/q_dt ...
        atm.atmosphere_state_update(u_dt, v_dt, t_dt, q_dt)
    """

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("physics", "none")
        super().__init__(*args, **kwargs)

    # -- dynamics phase ----------------------------------------------------

    def atmosphere_dynamics(self, nsteps=1):
        """Run dynamics only (atmosphere_dynamics:489)."""
        return self.atmosphere(nsteps)

    # -- physics interface -------------------------------------------------

    def atmos_phys_driver_statein(self):
        """Pack the physics state-in bundle (statein:1628): layer/interface
        pressures, A-grid winds, temperature, tracers."""
        import jax.numpy as jnp
        from ..model.fv_update_phys import cubed_to_latlon
        delp = self.state["delp"]
        pe = self.ptop + jnp.cumsum(delp, axis=1)
        pe = jnp.concatenate([jnp.full_like(pe[:, :1], self.ptop), pe],
                             axis=1)
        peln = jnp.log(pe)
        p_lay = delp / (peln[:, 1:] - peln[:, :-1])
        ua, va = cubed_to_latlon(self.state["u"], self.state["v"], self.g)
        return dict(
            prsi=pe, prsl=p_lay, tgrs=self.state["pt"],
            ugrs=ua, vgrs=va,
            qgrs=dict(self.tracers or {}),
            phis=self.state["phis"],
        )

    def atmosphere_state_update(self, u_dt=None, v_dt=None, t_dt=None,
                                q_dt=None):
        """Apply host-physics tendencies (atmosphere_state_update:1065)."""
        import jax.numpy as jnp
        from ..model.fv_update_phys import fv_update_phys
        z = jnp.zeros_like(self.state["pt"])
        pt, u, v, q = fv_update_phys(
            self.cfg.dt, self.state["pt"], self.state["delp"],
            self.state["u"], self.state["v"], self.tracers,
            u_dt if u_dt is not None else z,
            v_dt if v_dt is not None else z,
            t_dt if t_dt is not None else z,
            q_dt, self.g)
        self.state.update(pt=pt, u=u, v=v)
        self.tracers = q or self.tracers
        return self.state

    # -- query routines ----------------------------------------------------

    def get_bottom_wind(self):
        """Lowest-layer A-grid winds (get_bottom_wind)."""
        from ..model.fv_update_phys import cubed_to_latlon
        ua, va = cubed_to_latlon(self.state["u"], self.state["v"], self.g)
        return ua[:, -1], va[:, -1]

    def get_bottom_mass(self):
        """Lowest-layer T, p and surface pressure (get_bottom_mass)."""
        import jax.numpy as jnp
        delp = self.state["delp"]
        ps = self.ptop + jnp.sum(delp, axis=1)
        return self.state["pt"][:, -1], ps

    def atmosphere_resolution(self):
        return self.cfg.npx - 1, self.cfg.npz

    def atmosphere_grid_ctr(self):
        """Cell-center lon/lat (atmosphere_grid_ctr)."""
        return (self.g.geom.interior("aglon"),
                self.g.geom.interior("aglat"))

    def atmosphere_pref(self):
        """Reference pressure profile from ak/bk at 1000 hPa."""
        return self.ak + self.bk * con.PSTD_MKS
