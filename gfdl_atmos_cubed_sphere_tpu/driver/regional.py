"""Regional (limited-area) run driver (component #20).

The reference's regional mode runs the full dycore on one limited-area
tile with lateral BCs read from files every `bc_update_interval` and
applied each step (fv_regional_bc.F90 setup_regional_BC:259 /
regional_bc_data:1574 / set_regional_BCs called at fv_dynamics.F90:240).
This driver is the TPU-native pod: grid = planar limited-area metric pack
with zero-gradient pads (parallel/regional.py), BCs = two time levels of
side data Davies-relaxed inside the jitted step
(model/fv_regional_bc.py), snapshot rotation host-side.

Deviation from the reference: round-1 regional domains are planar
(f-plane constant metrics, the doubly-periodic pack minus periodicity);
gnomonic limited-area patches of the cube reuse the same halo/blend
machinery with the cube metric pack.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..model.dyn_core import DynConfig
from ..model.fv_dynamics import fv_dynamics_nh, fv_dynamics_hydro
from ..model.fv_regional_bc import (RegionalBCConfig, RegionalBCSchedule,
                                    make_blend_masks, set_regional_BCs)

STATE_NH = ("delp", "pt", "u", "v", "w", "delz")
STATE_HYDRO = ("delp", "pt", "u", "v")


def build_grid_ops_regional(n, dx_const, dy_const, dtype=jnp.float32,
                            deglat=0.0):
    """Limited-area metric pack: the cartesian pack (setup_cartesian,
    fv_grid_tools.F90:1160) with open lateral boundaries."""
    from ..model.grid_ops import build_grid_ops_dp, H
    from ..parallel.regional import RegionalHalo
    g = build_grid_ops_dp(n, dx_const, dy_const, dtype=dtype, deglat=deglat)
    g.halo = RegionalHalo(n, H)
    g.regional = True
    return g


class RegionalRun:
    """Limited-area run: jitted dycore step + Davies lateral relaxation
    from a host-managed BC schedule."""

    def __init__(self, g, cfg: DynConfig, sched: RegionalBCSchedule,
                 ak, bk, ptop, dp0=None, nrows_blend=5):
        self.g = g
        self.cfg = cfg
        self.sched = sched
        self.ak = jnp.asarray(ak)
        self.bk = jnp.asarray(bk)
        self.ptop = ptop
        self.dp0 = dp0
        self.keys = STATE_HYDRO if cfg.hydrostatic else STATE_NH
        bcc = RegionalBCConfig(n=g.n, nrows_blend=nrows_blend,
                               bc_update_interval=sched.cfg.bc_update_interval)
        self.masks = make_blend_masks(bcc, dtype=np.float64
                                      if g.dtype == jnp.float64
                                      else np.float32)

        keys = self.keys

        def step(state, bc0, bc1, frac_pre, frac_post):
            # relax toward BC(t) before the step (set_regional_BCs,
            # fv_dynamics.F90:240) ...
            state = set_regional_BCs(state, bc0, bc1, frac_pre, self.masks)
            if cfg.hydrostatic:
                r = fv_dynamics_hydro(state["delp"], state["pt"], state["u"],
                                      state["v"], None, g, cfg, self.ak,
                                      self.bk, ptop)
            else:
                r = fv_dynamics_nh(state["delp"], state["pt"], state["u"],
                                   state["v"], state["w"], state["delz"],
                                   None, g, cfg, self.ak, self.bk, ptop,
                                   dp0)
            out = {k: getattr(r, k) for k in keys}
            # ... and toward BC(t+dt) after (regional_boundary_update's
            # per-acoustic-step application, collapsed to the big step)
            return set_regional_BCs(out, bc0, bc1, frac_post, self.masks)

        self._step = jax.jit(step)

    def advance(self, state, t, nsteps=1):
        """Run `nsteps` big steps from model time t; returns (state, t)."""
        dt = self.cfg.dt
        dt_bc = self.sched.cfg.bc_update_interval
        for _ in range(nsteps):
            bc0, bc1, frac = self.sched.bracket(t)
            frac_post = min(frac + dt / dt_bc, 1.0)
            state = self._step(state, bc0, bc1, frac, frac_post)
            t += dt
        return state, t
