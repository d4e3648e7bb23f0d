"""On-chip probe for the d_sw Pallas mega-kernel: correctness vs the XLA
path at C96L32 f32 and wall-time at the C192L79 headline shape.

Run exclusive (no concurrent pytest): python devtools/dsw_probe.py [C]
"""
import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model import sw_dynamics as swd
from gfdl_atmos_cubed_sphere_tpu.init import sw_cases
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core
from gfdl_atmos_cubed_sphere_tpu.ops.pallas_dsw import d_sw_pallas
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import (DynConfig,
                                                        _sponge_level_params)


def build(npx, npz, dtype=jnp.float32):
    g = build_grid_ops(npx, dtype=dtype)
    ic = sw_cases.case2(g.geom)
    swd.prepare_phis(g, ic["phis"])
    halo = g.halo
    key = np.random.default_rng(7)

    def levs(x, scale=0.01):
        x = np.asarray(x)
        pert = 1.0 + scale * key.standard_normal(
            (x.shape[0], npz) + x.shape[2:])
        return jnp.asarray(x * pert, dtype)

    delp = levs(ic["delp"])
    u = levs(ic["u"])
    v = levs(ic["v"])
    pt = jnp.asarray(300.0 * (1.0 + 0.02 * key.standard_normal(delp.shape)),
                     dtype)
    delp_p = halo.pad_cell(delp)
    pt_p = halo.pad_cell(pt)
    u_p, v_p = halo.pad_dgrid(u, v)
    cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, 30.0,
                      hydrostatic=True, nord=1, sw_mode=False)
    uc, vc = swd._p_grad_c_sw(cs.uc, cs.vc, cs.delpc, g.phis_p, g, 30.0)
    from gfdl_atmos_cubed_sphere_tpu.ops.fill_corners import fi
    ctr = slice(swd.H, swd.H + g.n)
    wsl = slice(fi(1), fi(g.npx) + 1)
    uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr])
    divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl])
    args = (delp_p, pt_p, None, u_p, v_p, uc_p, vc_p, cs.ua, cs.va,
            divg_p, g)
    cfg = DynConfig(npx=npx, npz=npz, dt=450.0, n_split=6)
    pl_ = _sponge_level_params(cfg)
    kw = dict(dt=75.0, hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
              hord_dp=cfg.hord_dp, hord_tm=cfg.hord_tm,
              dddmp=cfg.dddmp, d4_bg=cfg.d4_bg, hydrostatic=True,
              lim_fac=1.0,
              **{k: pl_[k] for k in ("nord", "nord_v", "d2_bg", "d_con",
                                     "nord_mask", "damp_v", "damp_v2",
                                     "nord_v2")})
    return g, args, kw


def main():
    npx = int(_sys.argv[1]) if len(_sys.argv) > 1 else 97
    npz = int(_sys.argv[2]) if len(_sys.argv) > 2 else 32

    # correctness at C96L32
    g, args, kw = build(npx, npz)
    names = ("u", "v", "delp", "pt", "fx", "fy", "crx", "cry")

    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import (
        split_metrics, merge_metrics)
    garrs, grest = split_metrics(g)

    def run_xla(garrs):
        gg = merge_metrics(garrs, grest)
        a2 = list(args); a2[-1] = gg
        ds = sw_core.d_sw(*a2, **kw)
        return tuple(getattr(ds, nm) for nm in names)

    def run_pl(garrs):
        gg = merge_metrics(garrs, grest)
        a2 = list(args); a2[-1] = gg
        ds = d_sw_pallas(*a2, **kw)
        return tuple(getattr(ds, nm) for nm in names)

    mode = _sys.argv[3] if len(_sys.argv) > 3 else "both"
    print("inputs built", flush=True)
    todo = []
    if mode in ("both", "pl"):
        t1 = time.time()
        fp = jax.jit(run_pl)
        rp = jax.block_until_ready(fp(garrs))
        print(f"pallas compiled {time.time()-t1:.1f}s", flush=True)
        todo.append(("pallas", fp, rp))
    if mode in ("both", "xla"):
        t0 = time.time()
        fx = jax.jit(run_xla)
        rx = jax.block_until_ready(fx(garrs))
        print(f"xla compiled {time.time()-t0:.1f}s", flush=True)
        todo.insert(0, ("xla", fx, rx))
    if mode == "both":
        for nm, a, b in zip(names, rx, rp):
            a = np.asarray(a); b = np.asarray(b)
            d = np.abs(a - b)
            s = np.maximum(np.abs(a), 1e-30)
            print(f"{nm:6s} max_abs={d.max():.3e} max_rel={(d/s).max():.3e} "
                  f"bitexact={np.array_equal(a, b)}")

    # timing loop (serialized by output dependency)
    for label, fn, r0 in todo:
        reps = 30
        jax.block_until_ready(fn(garrs))
        t0 = time.time()
        for _ in range(reps):
            r = fn(garrs)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / reps * 1e3
        print(f"{label:7s} {dt:8.2f} ms/call  (C{npx-1}L{npz})")


if __name__ == "__main__":
    main()
