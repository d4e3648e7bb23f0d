"""Concurrent nested-grid execution on the doubly-periodic plane.

The reference runs nests as concurrently executing grids on disjoint
pelists (fv_control.F90:364-478), exchanging boundary conditions every big
step (fv_nesting.F90 setup_nested_grid_BCs:76) and optionally feeding the
nest solution back (twoway_nesting:2219). This module is the TPU-native
pod: parent and nest are two jitted fv_dynamics_nh instances stepped from
one Python orchestrator — on hardware they can live on disjoint mesh
slices; XLA overlaps their execution since the nest step depends on the
parent only through the (small) BC arrays.

BC scheme: the parent state at t and t+dt is interpolated to the nest
frame (bilinear, staggered-aware — boundary.F90 nested_grid_BC ind/wt),
time-interpolated across the nest's R substeps, and relaxed into
`nrows_blend` rows at the lateral walls after each substep
(fv_regional_bc.F90 nrows_blend). Deviation from the reference: the nest
model pads its halos periodically during a substep (no persistent
BC-filled ghost ring); the wrap leakage is confined to the blend zone,
which is overwritten toward BC data every substep.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..model.boundary import (PlanarNest, coarse_to_fine_stagger,
                              blend_interior, fine_to_coarse)
from ..model.dyn_core import DynConfig
from ..model.fv_dynamics import fv_dynamics_nh

CELL = ("delp", "pt", "w", "delz")


class NestedPlanarRun:
    """One-way (optionally two-way) nested run: parent doubly-periodic
    domain + one refined nest, concurrent per big step."""

    def __init__(self, parent_g, nest_g, cfg_parent: DynConfig,
                 cfg_nest: DynConfig, nest: PlanarNest, ak, bk, ptop,
                 dp0, two_way=False, nrows_blend=5, t_substeps=None):
        self.gp = parent_g
        self.gn = nest_g
        self.cp = cfg_parent
        self.cn = cfg_nest
        self.nest = nest
        self.ak = jnp.asarray(ak)
        self.bk = jnp.asarray(bk)
        self.ptop = ptop
        self.dp0 = dp0
        self.two_way = two_way
        self.nblend = nrows_blend
        # time refinement: default = spatial refinement
        self.tsub = t_substeps or nest.R
        assert abs(cfg_nest.dt * self.tsub - cfg_parent.dt) < 1e-9, \
            "nest dt * substeps must equal parent dt"

        def stepper(g, cfg):
            def step(delp, pt, u, v, w, delz):
                r = fv_dynamics_nh(delp, pt, u, v, w, delz, None, g, cfg,
                                   self.ak, self.bk, ptop, dp0)
                return r.delp, r.pt, r.u, r.v, r.w, r.delz
            return jax.jit(step)

        self._pstep = stepper(parent_g, cfg_parent)
        self._nstep = stepper(nest_g, cfg_nest)
        self._blend = jax.jit(self._blend_impl)
        self._bc = jax.jit(self._bc_impl)

    # -- BC interpolation (setup_nested_grid_BCs role) ---------------------
    def _bc_impl(self, pstate):
        ne = self.nest
        nn = ne.nn
        out = {}
        for k in CELL:
            out[k] = coarse_to_fine_stagger(
                pstate[k], ne.R, ne.oj, ne.oi, (nn, nn), (False, False))
        out["u"] = coarse_to_fine_stagger(
            pstate["u"], ne.R, ne.oj, ne.oi, (nn + 1, nn), (True, False))
        out["v"] = coarse_to_fine_stagger(
            pstate["v"], ne.R, ne.oj, ne.oi, (nn, nn + 1), (False, True))
        return out

    def _blend_impl(self, nstate, bc):
        out = dict(nstate)
        for k in CELL:
            out[k] = blend_interior(nstate[k], bc[k], self.nblend,
                                    (False, False))
        out["u"] = blend_interior(nstate["u"], bc["u"], self.nblend,
                                  (True, False))
        out["v"] = blend_interior(nstate["v"], bc["v"], self.nblend,
                                  (False, True))
        return out

    def init_nest_from_parent(self, pstate):
        """Cold-start the nest by interpolating the full parent state."""
        return self._bc(pstate)

    def step(self, pstate, nstate):
        """Advance both grids one parent big step."""
        keys = ("delp", "pt", "u", "v", "w", "delz")
        p_new = dict(zip(keys, self._pstep(*[pstate[k] for k in keys])))
        bc0 = self._bc(pstate)
        bc1 = self._bc(p_new)
        for m in range(self.tsub):
            nstate = dict(zip(keys, self._nstep(*[nstate[k]
                                                  for k in keys])))
            frac = (m + 1.0) / self.tsub
            bct = jax.tree_util.tree_map(
                lambda a, b: (1.0 - frac) * a + frac * b, bc0, bc1)
            nstate = self._blend(nstate, bct)
        if self.two_way:
            p_new = self.feedback(p_new, nstate)
        return p_new, nstate

    # -- two-way feedback (twoway_nesting:2219) ----------------------------
    def feedback(self, pstate, nstate, blend=1.0):
        out = dict(pstate)
        for k in CELL:
            out[k] = self.nest.feedback(pstate[k], nstate[k], blend=blend)
        return out
