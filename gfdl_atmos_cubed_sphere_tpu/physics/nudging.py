"""Analysis nudging + incremental analysis update (components #28, #22).

Re-implements the core mechanisms of /root/reference/tools/fv_nudge.F90
(fv_nwp_nudge:66 — Newtonian relaxation of winds/T/ps toward gridded
analyses with per-field timescales and a pressure-dependent weight),
tools/fv_treat_da_inc.F90 (read_da_inc:82 — one-shot analysis increment)
and tools/fv_iau_mod.F90 (IAU_initialize:121 — the same increment spread
evenly over a time window).
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NudgeConfig:
    """fv_nwp_nudge_nml subset (fv_nudge.F90:229)."""
    tau_winds: float = 21600.0     # relaxation timescales (s)
    tau_t: float = 86400.0
    tau_q: float = 86400.0
    tau_ps: float = 21600.0
    p_wvp: float = 100.0e2         # no nudging above this pressure
    p_full: float = 300.0e2        # full-strength below this


def _vertical_weight(pm, cfg: NudgeConfig):
    """Ramp 0 -> 1 between p_wvp and p_full (fv_nudge's kbot/strat masks)."""
    return jnp.clip((pm - cfg.p_wvp) / (cfg.p_full - cfg.p_wvp), 0.0, 1.0)


def nwp_nudge(dt, state, target, pm, cfg: NudgeConfig = NudgeConfig()):
    """Implicit Newtonian relaxation toward the analysis.

    state/target: dicts with any of u, v, pt, sphum (same shapes);
    pm: layer pressures [6,K,n,n] for the vertical weight.
    Returns updated state dict."""
    out = dict(state)
    w = _vertical_weight(pm, cfg)
    for name, tau in (("u", cfg.tau_winds), ("v", cfg.tau_winds),
                      ("pt", cfg.tau_t), ("sphum", cfg.tau_q)):
        if name in state and name in target:
            r = dt / tau
            if name == "u":      # spread the cell weight to y-walls
                wf = jnp.concatenate(
                    [w[:, :, :1], 0.5 * (w[:, :, :-1] + w[:, :, 1:]),
                     w[:, :, -1:]], axis=2)
            elif name == "v":    # x-walls
                wf = jnp.concatenate(
                    [w[..., :1], 0.5 * (w[..., :-1] + w[..., 1:]),
                     w[..., -1:]], axis=3)
            else:
                wf = w
            out[name] = (state[name] + r * wf * target[name]) / (1.0 + r * wf)
    return out


def apply_da_increment(state, increments, frac=1.0):
    """One-shot analysis increment (read_da_inc): state += frac * inc."""
    out = dict(state)
    for k, inc in increments.items():
        if k in out and out[k] is not None:
            out[k] = out[k] + frac * inc
    return out


class IAU:
    """Incremental analysis update (fv_iau_mod.F90): spread an increment
    evenly over `window` seconds of `dt`-steps."""

    def __init__(self, increments, window, dt):
        self.increments = increments
        self.nsteps = max(1, int(round(window / dt)))
        self.frac = 1.0 / self.nsteps
        self.applied = 0

    def step(self, state):
        if self.applied >= self.nsteps:
            return state
        self.applied += 1
        return apply_da_increment(state, self.increments, self.frac)
