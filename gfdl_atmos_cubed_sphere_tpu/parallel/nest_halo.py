"""Halo "exchange" for bounded gnomonic patches (nested / regional grids).

A bounded patch has no cube topology: its ghost ring carries lateral
boundary-condition data — parent-grid interpolation for nests
(/root/reference/model/boundary.F90 nested_grid_BC_* :46-80) or
file-driven lateral BCs for the regional mode
(/root/reference/model/fv_regional_bc.F90 regional_bc_data:1574). The
reference fills persistent ghost cells once per BC update; here there is
no ghost state, so each pad pastes the interior field into the matching
BC *frame* (a full padded array whose ring rows hold the BC values).

Frames are traced values supplied per step (the driver interpolates the
parent state / reads+time-interpolates BC files and rebuilds the halo
inside its jitted step). A field with no registered frame falls back to
edge-clamp extrapolation — acceptable only for derived quantities whose
ring values feed damping terms (e.g. divg), mirroring the reference's
extrapolated nest BCs.
"""

import jax.numpy as jnp


class NestBCHalo:
    """Same interface as HaloExchanger/PeriodicHalo; `frames` maps field
    name -> full padded BC frame:
      cell fields  [T, K, n+2h, n+2h]      ("delp", "pt", "w", "zh", "phis")
      "u" [T, K, n+1+2h, n+2h], "v" [T, K, n+2h, n+1+2h]   (D-grid walls)
      "uc" [T, K, n+2h, n+1+2h], "vc" [T, K, n+1+2h, n+2h] (C-grid walls)
      "divg" [T, K, n+1+2h, n+1+2h]                        (corner points)
    """

    def __init__(self, n, h, frames=None):
        self.n = n
        self.h = h
        self.frames = dict(frames or {})

    # -- helpers -----------------------------------------------------------

    def _paste(self, frame, q, ny, nx):
        h = self.h
        return frame.at[..., h:h + ny, h:h + nx].set(q)

    @staticmethod
    def _clamp(q, ext_y, ext_x):
        pad = [(0, 0)] * (q.ndim - 2) + [(ext_y, ext_y), (ext_x, ext_x)]
        return jnp.pad(q, pad, mode="edge")

    # -- scalars -----------------------------------------------------------

    def pad_cell(self, q, name=None):
        fr = self.frames.get(name)
        if fr is None:
            return self._clamp(q, self.h, self.h)
        return self._paste(fr, q, q.shape[-2], q.shape[-1])


    def pad_cells(self, fields, names=None):
        """Grouped-pack API (see parallel/shard_halo.py): default
        per-field fallback."""
        names = names or (None,) * len(tuple(fields))
        return tuple(self.pad_cell(q, name=nm)
                     for q, nm in zip(fields, names))

    def pad_corner(self, q, name=None):
        fr = self.frames.get(name)
        if fr is None:
            return self._clamp(q, self.h, self.h)
        return self._paste(fr, q, q.shape[-2], q.shape[-1])

    # -- vectors -----------------------------------------------------------

    def pad_dgrid(self, u, v, names=("u", "v")):
        fu = self.frames.get(names[0])
        fv = self.frames.get(names[1])
        u_p = (self._clamp(u, self.h, self.h) if fu is None
               else self._paste(fu, u, u.shape[-2], u.shape[-1]))
        v_p = (self._clamp(v, self.h, self.h) if fv is None
               else self._paste(fv, v, v.shape[-2], v.shape[-1]))
        return u_p, v_p

    def pad_cgrid(self, uc, vc, names=("uc", "vc")):
        fu = self.frames.get(names[0])
        fv = self.frames.get(names[1])
        uc_p = (self._clamp(uc, self.h, self.h) if fu is None
                else self._paste(fu, uc, uc.shape[-2], uc.shape[-1]))
        vc_p = (self._clamp(vc, self.h, self.h) if fv is None
                else self._paste(fv, vc, vc.shape[-2], vc.shape[-1]))
        return uc_p, vc_p

    def reconcile_dgrid(self, u, v):
        """No duplicated walls on a bounded patch."""
        return u, v
