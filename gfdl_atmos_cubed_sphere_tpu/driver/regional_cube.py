"""Regional (limited-area) mode on a real gnomonic patch with file BCs.

The reference regional mode (/root/reference/model/fv_regional_bc.F90)
integrates a limited-area gnomonic domain whose lateral boundaries are
driven by BC files: `setup_regional_BC`:259 builds per-side boundary
buffers, `regional_bc_data`:1574 reads a new time level every
`bc_update_interval`, the old t1 rotates to t0 (:1306), and each step
applies time-interpolated BCs with `nrows_blend` Davies blending rows.

TPU-native form: the patch is a bounded gnomonic grid
(grid/patch.py + grid_ops.build_grid_ops_patch); the lateral BCs are the
side strips of io/regional_bc.RegionalBCSeries, time-interpolated on the
host each big step, reassembled into NestBCHalo frames
(parallel/nest_halo.py), and swapped into one jitted step. Davies
relaxation of the outer `nrows_blend` interior rows follows the step
(model/boundary.blend_interior).

Phase scope: hydrostatic prognostics (delp, T, u, v); the C-grid ring
winds are derived from the interpolated D winds via the bounded d2a2c
(same deviation as driver/nested_cube.py, documented there).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as con
from ..model.boundary import blend_interior
from ..model.fv_dynamics import fv_dynamics_hydro
from ..io.regional_bc import RegionalBCSeries, strips_to_frame
from ..ops.sw_core import _d2a2c_vect_bounded
from ..parallel.nest_halo import NestBCHalo

H = 3


class RegionalCubeRun:
    """Limited-area run driven by a bc_*.nc series."""

    def __init__(self, patch_g, cfg, ak, bk, ptop, bc_dir, nrows_blend=4,
                 phis=None):
        self.g = patch_g
        self.cfg = cfg
        self.ak = jnp.asarray(ak, patch_g.dtype)
        self.bk = jnp.asarray(bk, patch_g.dtype)
        self.ptop = ptop
        self.series = RegionalBCSeries(bc_dir)
        self.nrows = nrows_blend
        self.width = self.series.width
        n = patch_g.n
        self.phis = (jnp.zeros((1, 1, n, n), patch_g.dtype)
                     if phis is None else jnp.asarray(phis, patch_g.dtype))
        self._jit_step = jax.jit(self._step_impl)

    # -- BC frames ---------------------------------------------------------

    def frames_at(self, t_seconds, state):
        """NestBCHalo frame dict from the file strips at time t: rim rows
        from the (time-interpolated) BC data, interior from the current
        state (only the rim is ever consumed by the pads)."""
        strips = self.series.strips_at(t_seconds)
        delp, pt, u, v = state
        fr_delp = strips_to_frame(strips["delp"], delp, self.width)
        fr_t = strips_to_frame(strips["pt"], pt, self.width)
        fr_u = strips_to_frame(strips["u"], u, self.width)
        fr_v = strips_to_frame(strips["v"], v, self.width)

        # T -> theta_v on the frame (same derivation as the interior,
        # fv_dynamics.F90:275-399; dry path)
        akap = con.KAPPA
        pe = self.ptop + jnp.cumsum(fr_delp, axis=1)
        pe = jnp.concatenate([jnp.full_like(pe[:, :1], self.ptop), pe],
                             axis=1)
        peln = jnp.log(pe)
        pk = jnp.exp(akap * peln)
        pkz = (pk[:, 1:] - pk[:, :-1]) / (akap * (peln[:, 1:]
                                                  - peln[:, :-1]))
        fr_ptv = fr_t / pkz
        _, _, fr_uc, fr_vc, _, _ = _d2a2c_vect_bounded(fr_u, fr_v, self.g)
        return (dict(delp=fr_delp, pt=fr_ptv, u=fr_u, v=fr_v,
                     uc=fr_uc, vc=fr_vc), fr_t)

    # -- stepping ----------------------------------------------------------

    def _step_impl(self, state, frames, t_frame):
        delp, pt, u, v = state
        gn = SimpleNamespace(**vars(self.g))
        gn.halo = NestBCHalo(self.g.n, H, frames)
        gn.phis_p = gn.halo.pad_cell(self.phis, name="phis")
        res = fv_dynamics_hydro(delp, pt, u, v, None, gn, self.cfg,
                                self.ak, self.bk, self.ptop)
        ci = slice(H, H + self.g.n)
        wi = slice(H, H + self.g.n + 1)
        d2 = blend_interior(res.delp, frames["delp"][..., ci, ci],
                            self.nrows)
        t2 = blend_interior(res.pt, t_frame[..., ci, ci], self.nrows)
        u2 = blend_interior(res.u, frames["u"][..., wi, ci], self.nrows,
                            wall=(True, False))
        v2 = blend_interior(res.v, frames["v"][..., ci, wi], self.nrows,
                            wall=(False, True))
        return (d2, t2, u2, v2)

    def step(self, state, t_seconds):
        """Advance one big dt; BCs valid at the END of the step (the
        reference extrapolates ahead the same way)."""
        frames, t_frame = self.frames_at(t_seconds + self.cfg.dt, state)
        return self._jit_step(state, frames, t_frame)

    def run(self, state, t0_seconds, nsteps):
        t = t0_seconds
        for _ in range(nsteps):
            state = self.step(state, t)
            t += self.cfg.dt
        return state, t
