"""GFDL/AM4-style driver facade (component #33).

Re-implements the distinguishing surface of
/root/reference/driver/GFDL/atmosphere.F90 over the same core as the
SHiELD facade: the AM4 coupler calls `atmosphere` (combined step) and
pulls physics/radiation input bundles via
`atmos_physics_driver_inputs`:1473 and `atmos_radiation_driver_inputs`
:1532 (Physics_input_block / Radiation_input_block shapes). Everything
else (init, domain queries, restart) is shared with driver/shield.py.
"""

import jax.numpy as jnp

from .. import constants as con
from .shield import ShieldAtmosphere


class GFDLAtmosphere(ShieldAtmosphere):
    """AM4-coupler-facing facade (driver/GFDL/atmosphere.F90)."""

    def atmos_physics_driver_inputs(self):
        """Physics_input_block (atmosphere.F90:1473): layer pressures,
        interface pressures + their logs, temperature, tracers, A-grid
        winds, omega, heights of layers (from hydrostatic thickness)."""
        sin = self.atmos_phys_driver_statein()
        pe, p_lay = sin["prsi"], sin["prsl"]
        peln = jnp.log(pe)
        t = sin["tgrs"]
        sph = sin["qgrs"].get("sphum")
        tv = t * (1.0 + con.ZVIR * sph) if sph is not None else t
        dz = con.RDGAS * tv * (peln[:, 1:] - peln[:, :-1]) / con.GRAV
        z_half = jnp.concatenate(
            [jnp.flip(jnp.cumsum(jnp.flip(dz, axis=1), axis=1), axis=1),
             jnp.zeros_like(dz[:, :1])], axis=1)
        z_full = 0.5 * (z_half[:, 1:] + z_half[:, :-1])
        return dict(sin, p_half=pe, p_full=p_lay, ln_p_half=peln,
                    t=t, z_half=z_half, z_full=z_full,
                    omega=self.state.get("omga"))

    def atmos_radiation_driver_inputs(self):
        """Radiation_input_block (atmosphere.F90:1532): the physics bundle
        restricted to what radiation consumes (p, t, q, heights)."""
        b = self.atmos_physics_driver_inputs()
        return {k: b[k] for k in ("p_half", "p_full", "t", "qgrs",
                                  "z_half", "z_full", "phis")}
