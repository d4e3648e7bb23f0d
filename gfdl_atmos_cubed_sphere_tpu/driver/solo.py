"""Solo driver: the atmosphere_init / atmosphere / atmosphere_end facade.

Re-implements /root/reference/driver/solo/atmosphere.F90 (:64-65 public API,
atmosphere_init:97, atmosphere:395) + the Held-Suarez option of
driver/solo/fv_phys.F90:186 as a self-contained runner: grid build,
idealized init (JW baroclinic / Held-Suarez spin-up), jitted big-step with
optional HS forcing, state audits, checkpoint write/resume, and a CLI.

Usage:
  python -m gfdl_atmos_cubed_sphere_tpu.driver.solo --npx 49 --npz 32 \
      --days 10 --dt 1200 --physics hs
"""

import argparse
import time

import numpy as np

from .. import constants as con


class Atmosphere:
    """Lifecycle object (the fv_atmos_type + solo atmosphere_* API)."""

    def __init__(self, npx, npz, dt, case="jw", physics="none",
                 hydrostatic=True, dtype="f32", cfg_overrides=None,
                 restart=None):
        import jax.numpy as jnp
        from ..model.grid_ops import build_grid_ops
        from ..model.dyn_core import DynConfig
        from ..model.sw_dynamics import prepare_phis
        from ..grid.fv_eta import set_eta
        from ..init.baroclinic import jw_baroclinic
        from ..io import restart as rst
        from ..utils.timing import Timers

        self.dtype = jnp.float32 if dtype == "f32" else jnp.float64
        self.timers = Timers()
        with self.timers("INIT"):
            self.g = build_grid_ops(npx, dtype=self.dtype)
            ks, ptop, ak, bk = set_eta(npz)
            self.ptop = ptop
            self.ak = np.asarray(ak)
            self.bk = np.asarray(bk)
            self.dp0 = np.diff(self.ak) + np.diff(self.bk) * 1.0e5
            over = dict(cfg_overrides or {})
            over.setdefault("hydrostatic", hydrostatic)
            self.cfg = DynConfig(npx=npx, npz=npz, dt=dt, **over)
            self.physics = physics
            self.case = case
            self.time_seconds = 0.0
            self.step_count = 0

            if restart:
                state, tracers, manifest = rst.load_state(restart)
                self.state = {k: jnp.asarray(v, self.dtype)
                              for k, v in state.items()}
                self.tracers = {k: jnp.asarray(v, self.dtype)
                                for k, v in tracers.items()} or None
                self.time_seconds = manifest.get("time_seconds", 0.0)
                self.step_count = manifest.get("step", 0)
                prepare_phis(self.g, self.state["phis"])
            else:
                ic = jw_baroclinic(self.g.geom, npz, ak, bk, ptop,
                                   perturb=(case == "jw"))
                prepare_phis(self.g, ic["phis"])
                self.state = {k: jnp.asarray(ic[k], self.dtype)
                              for k in ("delp", "pt", "u", "v", "w", "delz")}
                self.state["phis"] = jnp.asarray(ic["phis"], self.dtype)
                self.tracers = None
            self.u0 = self.state["u"]
            self.v0 = self.state["v"]
            self._step = self._build_step()

    def _build_step(self, cfg=None, physics=None):
        import jax
        import jax.numpy as jnp
        from ..model.fv_dynamics import fv_dynamics_hydro, fv_dynamics_nh
        from ..physics.held_suarez import hs_forcing

        cfg = cfg if cfg is not None else self.cfg
        g = self.g
        akj = jnp.asarray(self.ak, self.dtype)
        bkj = jnp.asarray(self.bk, self.dtype)
        ptop = self.ptop
        dp0 = self.dp0
        physics = physics if physics is not None else self.physics

        def step(state, u0, v0):
            if getattr(cfg, "no_dycore", False):
                # physics-only mode (fv_arrays.F90 no_dycore; the
                # reference skips fv_dynamics entirely): state passes
                # through to the physics below unchanged
                new = dict(state)
            elif cfg.hydrostatic:
                r = fv_dynamics_hydro(state["delp"], state["pt"], state["u"],
                                      state["v"], None, g, cfg, akj, bkj,
                                      ptop, u0=u0, v0=v0)
                new = dict(state, delp=r.delp, pt=r.pt, u=r.u, v=r.v)
            else:
                r = fv_dynamics_nh(state["delp"], state["pt"], state["u"],
                                   state["v"], state["w"], state["delz"],
                                   None, g, cfg, akj, bkj, ptop, dp0,
                                   u0=u0, v0=v0)
                new = dict(state, delp=r.delp, pt=r.pt, u=r.u, v=r.v,
                           w=r.w, delz=r.delz)
            if physics == "hs":
                pt2, u2, v2 = hs_forcing(new["pt"], new["delp"], new["u"],
                                         new["v"], g, ptop, cfg.dt)
                new.update(pt=pt2, u=u2, v=v2)
            elif physics == "sim":
                # idealized gray-radiation + PBL suite (GFDL_sim_phys)
                from ..physics.sim_phys import sim_phys
                from ..model.fv_update_phys import (cubed_to_latlon,
                                                    fv_update_phys)
                import gfdl_atmos_cubed_sphere_tpu.constants as con
                ua, va = cubed_to_latlon(new["u"], new["v"], g)
                delz = new.get("delz")
                if delz is None:
                    pe = ptop + jnp.cumsum(new["delp"], axis=1)
                    pe0 = jnp.concatenate(
                        [jnp.full_like(pe[:, :1], ptop), pe], axis=1)
                    delz = (-con.RDGAS * new["pt"] / con.GRAV
                            * jnp.log(pe0[:, 1:] / pe0[:, :-1]))
                ts = new["pt"][:, -1] + 1.0     # fixed warm-ocean skin
                ua2, va2, ta2, _, _ = sim_phys(
                    ua, va, new["pt"], None, new["delp"], delz, ts, g,
                    ptop, cfg.dt)
                _, u2, v2, _ = fv_update_phys(
                    cfg.dt, new["pt"], new["delp"], new["u"], new["v"],
                    None, (ua2 - ua) / cfg.dt, (va2 - va) / cfg.dt,
                    jnp.zeros_like(ta2), None, g)
                new.update(pt=ta2, u=u2, v=v2)
            return new

        return jax.jit(step)

    def adiabatic_init(self, na_init=1, wt=1.5):
        """Forward-backward adiabatic initialization
        (driver/solo/atmosphere.F90 adiabatic_init:194): na_init cycles of
        {forward, backward, nudge-to-IC, backward, forward, nudge-to-IC}
        with physics off; the backward passes run the full dynamics with
        dt -> -dt, damping the unbalanced (fast) modes while the slow
        balanced flow round-trips."""
        import dataclasses
        cfgb = dataclasses.replace(self.cfg, dt=-self.cfg.dt)
        fwd = self._build_step(physics="none")
        bwd = self._build_step(cfg=cfgb, physics="none")
        xt = 1.0 / (1.0 + wt)
        keep = [k for k in ("u", "v", "pt", "delp") if k in self.state]
        s0 = {k: self.state[k] for k in keep}

        def nudge(s):
            return dict(s, **{k: xt * (s[k] + wt * s0[k]) for k in keep})

        s = self.state
        for _ in range(na_init):
            s = nudge(bwd(fwd(s, None, None), None, None))
            s = nudge(fwd(bwd(s, None, None), None, None))
        self.state = s
        return s

    # -- the public API (atmosphere_init is __init__) ----------------------

    def atmosphere(self, nsteps=1):
        """Advance nsteps big timesteps (solo atmosphere:395)."""
        for _ in range(nsteps):
            with self.timers("FV_DYNAMICS"):
                self.state = self._step(self.state, self.u0, self.v0)
            self.time_seconds += self.cfg.dt
            self.step_count += 1
        return self.state

    def audit(self, out=print):
        from ..io.diagnostics import prt_maxmin, nan_check
        bad = nan_check(self.state)
        if bad:
            out(f"NaN detected in: {bad}")
        ps = self.ptop + np.asarray(self.state["delp"]).sum(axis=1)
        out(f"step {self.step_count}  t={self.time_seconds / 86400.0:.3f} d")
        prt_maxmin("PS(hPa)", ps * 0.01, out=out)
        prt_maxmin("T", self.state["pt"], out=out)
        prt_maxmin("U", self.state["u"], out=out)
        return not bad

    def write_restart(self, path):
        from ..io import restart as rst
        with self.timers("RESTART_WRITE"):
            rst.save_state(path, {k: v for k, v in self.state.items()},
                           ak=self.ak, bk=self.bk, tracers=self.tracers,
                           step=self.step_count,
                           time_seconds=self.time_seconds)

    def atmosphere_end(self, out=print):
        self.timers.report(out)


def main(argv=None):
    p = argparse.ArgumentParser(description="FV3-TPU solo driver")
    p.add_argument("--npx", type=int, default=49)
    p.add_argument("--npz", type=int, default=32)
    p.add_argument("--dt", type=float, default=1200.0)
    p.add_argument("--days", type=float, default=1.0)
    p.add_argument("--case", default="jw", choices=["jw", "jw_unperturbed"])
    p.add_argument("--physics", default="none", choices=["none", "hs"])
    p.add_argument("--nonhydrostatic", action="store_true")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--restart-in", default=None)
    p.add_argument("--restart-out", default=None)
    p.add_argument("--audit-every", type=int, default=0)
    p.add_argument("--tau", type=float, default=0.0)
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu/tpu)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    over = {}
    if args.tau > 0:
        over["tau"] = args.tau
    atm = Atmosphere(args.npx, args.npz, args.dt, case=args.case,
                     physics=args.physics,
                     hydrostatic=not args.nonhydrostatic,
                     dtype="f64" if args.f64 else "f32",
                     cfg_overrides=over, restart=args.restart_in)
    nsteps = int(args.days * 86400.0 / args.dt)
    print(f"running {nsteps} steps of {args.dt}s at "
          f"C{args.npx - 1}L{args.npz} ({'hydro' if not args.nonhydrostatic else 'nonhydro'}, "
          f"physics={args.physics})")
    t0 = time.perf_counter()
    chunk = max(1, args.audit_every or nsteps)
    done = 0
    while done < nsteps:
        todo = min(chunk, nsteps - done)
        atm.atmosphere(todo)
        done += todo
        if not atm.audit():
            raise SystemExit("state audit failed (NaN)")
    wall = time.perf_counter() - t0
    gpts = 6 * (args.npx - 1) ** 2 * args.npz
    print(f"wall {wall:.2f}s  {nsteps * gpts / wall:.3e} gridpoint-levels/s")
    if args.restart_out:
        atm.write_restart(args.restart_out)
        print("restart written:", args.restart_out)
    atm.atmosphere_end()


if __name__ == "__main__":
    main()
