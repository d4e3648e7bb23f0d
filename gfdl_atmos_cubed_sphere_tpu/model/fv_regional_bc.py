"""Regional (limited-area) lateral boundary conditions (component #20).

Re-implements the scheme of /root/reference/model/fv_regional_bc.F90:
two time levels of prescribed lateral-BC data (`setup_regional_BC`:259)
held in side buffers, time-interpolated each step (`set_regional_BCs`,
called from fv_dynamics.F90:240), rotated t1->t0 when a new BC snapshot
arrives (`regional_bc_data`:1574, rotation :1306), and relaxed into the
domain over `nrows_blend` rows (:250).

TPU-native formulation: BC data are stored as four side strips per field
(south/north/west/east pytrees — the analog of the reference's
`fv_domain_sides` BC_t0/BC_t1 buffers), the Davies relaxation is a
static-weight `w*bc + (1-w)*q` blend applied inside the jitted step, and
the ghost ring is produced by zero-gradient pads (parallel/regional.py)
from the blended rows — replacing the reference's per-variable mutable
ghost-cell scatter with pure functions.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

#: prognostic fields carrying lateral BCs (fv_regional_bc.F90 registers
#: delp/pt/w/delz plus D- and C-winds and tracers; C-winds are derived
#: here, not prescribed)
BC_CELL = ("delp", "pt", "w", "delz")
BC_UWALL = ("u",)     # y-wall staggered [.., n+1, n]
BC_VWALL = ("v",)     # x-wall staggered [.., n, n+1]


def _axis_weight(npts, nb, wall):
    """Davies relaxation weight along one axis: 1 at the outermost
    interior point, linear decay to 0 after nb rows
    (fv_regional_bc.F90 blend factor, nrows_blend :250)."""
    if wall:
        # wall points sit on integer coordinates 0..npts-1; point 0 IS the
        # physical boundary -> weight 1
        d = np.minimum(np.arange(npts), np.arange(npts)[::-1]).astype(float)
    else:
        # cell centers at 0.5 offsets; outermost center is half a cell in
        d = np.minimum(np.arange(npts) + 0.5,
                       (np.arange(npts) + 0.5)[::-1]) - 0.5
    w = np.clip(1.0 - d / max(nb, 1), 0.0, 1.0)
    return w


def blend_weight_2d(shape, nb, stagger=("c", "c"), dtype=np.float32):
    """[ny, nx] Davies weight field: w = combination of the two axis
    ramps such that points near any wall are relaxed (sequential-blend
    equivalent weight w = wy + wx - wy*wx)."""
    ny, nx = shape
    wy = _axis_weight(ny, nb, stagger[0] == "w")[:, None]
    wx = _axis_weight(nx, nb, stagger[1] == "w")[None, :]
    w = wy + wx - wy * wx
    return jnp.asarray(w, dtype)


@dataclass
class RegionalBCConfig:
    n: int                      # cells per side of the regional domain
    nrows_blend: int = 5        # fv_regional_bc.F90 nrows_blend (:250)
    bc_update_interval: float = 3600.0   # seconds between BC snapshots


def make_blend_masks(cfg: RegionalBCConfig, dtype=np.float32):
    """Static per-stagger weight fields for the jitted blend."""
    n, nb = cfg.n, cfg.nrows_blend
    return {
        "cell": blend_weight_2d((n, n), nb, ("c", "c"), dtype),
        "uwall": blend_weight_2d((n + 1, n), nb, ("w", "c"), dtype),
        "vwall": blend_weight_2d((n, n + 1), nb, ("c", "w"), dtype),
    }


def _mask_for(name):
    if name in BC_UWALL:
        return "uwall"
    if name in BC_VWALL:
        return "vwall"
    return "cell"


def set_regional_BCs(fields, bc_t0, bc_t1, frac, masks):
    """Time-interpolate the two BC levels and relax the blend rows
    (set_regional_BCs + regional_boundary_update, fv_regional_bc.F90;
    `frac` in [0,1] is the position between snapshots).

    fields/bc_t0/bc_t1: dicts name -> full-field arrays [T, K, y, x]
    (BC dicts may hold any subset of `fields`' keys). Returns the
    blended field dict."""
    out = dict(fields)
    for name, q in fields.items():
        b0 = bc_t0.get(name)
        if b0 is None or q is None:
            continue
        tgt = (1.0 - frac) * b0 + frac * bc_t1[name]
        w = masks[_mask_for(name)]
        out[name] = w * tgt + (1.0 - w) * q
    return out


def extract_bc_snapshot(fields, names=None):
    """Capture one BC time level from a (parent/global/analysis) state —
    the analog of reading one `regional_bc_data` file record. Stores full
    fields; for production domains swap in side strips (same blend math,
    weights are zero outside nrows_blend)."""
    names = names or (BC_CELL + BC_UWALL + BC_VWALL)
    return {k: fields[k] for k in names if fields.get(k) is not None}


def carve_subdomain(fields, j0, i0, n):
    """Cut a limited-area sub-state out of a larger planar parent state
    (cell anchor (j0, i0), n cells per side), honoring staggering:
    cell [ny, nx] -> [n, n]; u y-walls -> [n+1, n]; v x-walls -> [n, n+1].
    Used to build regional ICs and BC snapshots from a parent run
    (the get-data path of regional_bc_data when the BC file was itself
    written by a coarser run)."""
    out = {}
    for name, q in fields.items():
        if q is None:
            out[name] = None
            continue
        if name in BC_UWALL:
            out[name] = q[..., j0:j0 + n + 1, i0:i0 + n]
        elif name in BC_VWALL:
            out[name] = q[..., j0:j0 + n, i0:i0 + n + 1]
        else:
            out[name] = q[..., j0:j0 + n, i0:i0 + n]
    return out


class RegionalBCSchedule:
    """Host-side BC buffer manager: holds BC_t0/BC_t1 and rotates t1->t0
    when model time crosses `bc_update_interval` (fv_regional_bc.F90
    :1306 rotation + start_regional_cold_start scheduling)."""

    def __init__(self, cfg: RegionalBCConfig, snapshots, t0=0.0):
        """snapshots: list of BC dicts at times t0 + k*bc_update_interval."""
        self.cfg = cfg
        self.snapshots = list(snapshots)
        self.t_start = t0

    def bracket(self, t):
        """(bc_t0, bc_t1, frac) for model time t."""
        dt_bc = self.cfg.bc_update_interval
        x = (t - self.t_start) / dt_bc
        k = int(np.floor(x + 1e-9))
        k = max(0, min(k, len(self.snapshots) - 2))
        frac = min(max(x - k, 0.0), 1.0)
        return self.snapshots[k], self.snapshots[k + 1], frac
