"""Probe which d_sw sub-patterns Mosaic accepts inside a Pallas TPU kernel.

Round 2 findings (C48 shapes, v5e):
  PASS lane/sublane strip concat at arbitrary offsets
  FAIL jnp flip ([..., ::-1]) -> `rev` unimplemented; use width-1 concat
  FAIL .at[r, c].set(scalar) -> `scatter`; use .at[r:r+1, c:c+1].set(2-D)
  (metrics must be kernel inputs, not captured constants)

Usage: python devtools/mosaic_probe.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core, tp_core

H = 3
npx = 49
n = npx - 1
P = n + 2 * H
NW = n + 1 + 2 * H

g = build_grid_ops(npx, dtype=jnp.float32)


def snap2d(name):
    a = getattr(g, name)
    a = np.asarray(a)
    while a.ndim > 2:
        a = a[0]
    return jnp.asarray(a, jnp.float32)


def probe(name, fn, *args):
    """fn(*2d_arrays) -> 2d array; all args passed as kernel inputs."""
    def kernel(*refs):
        ins = [r[:] for r in refs[:-1]]
        refs[-1][:] = fn(*ins)

    out = jax.eval_shape(fn, *args)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(f).lower(*args).compile()
        print(f"PASS  {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:150]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


ones = lambda *s: jnp.ones(s, jnp.float32)

# transpose of small block
probe("swapaxes 3x3", lambda q: jnp.concatenate(
    [jnp.swapaxes(q[:3, :3], -1, -2), q[3:, :3]], -2), ones(P, 3))

# transpose of [3, P] strip
probe("swapaxes 3xP strip", lambda q: jnp.swapaxes(q[:3, :], -1, -2),
      ones(P, P))

# flip via reverse-order width-1 concat
def flip3(q):
    b = q[:3, :3]
    rb = jnp.concatenate([b[:, 2:3], b[:, 1:2], b[:, 0:1]], -1)
    return jnp.concatenate([rb, q[:3, 3:]], -1)

probe("flip3 via concat", flip3, ones(P, P))

# 2-D DUS point set
def point_dus(ut):
    s = ut[:6, :]
    s = s.at[2:3, 5:6].set(s[1:2, 4:5] * 3.0)
    return jnp.concatenate([s, ut[6:, :]], -2)

probe("point 2-D DUS on strip", point_dus, ones(P, NW))

# scalar read then broadcast (corner-solve reads)
def point_read(ut, vt):
    val = ut[4, 5] * vt[3, 2] + ut[0, 0]
    s = ut[:6, :]
    s = s.at[2:3, 5:6].set(jnp.full((1, 1), 1.0, ut.dtype) * val)
    return jnp.concatenate([s, ut[6:, :]], -2)

probe("scalar read + DUS write", point_read, ones(P, NW), ones(NW, P))

# deln_damp_fluxes nord=0 (no copy_corners) with metrics as inputs
def _deln0(q, d6u, d6v, ra):
    gg = type("G", (), {})()
    gg.del6_u, gg.del6_v, gg.rarea = d6u, d6v, ra
    fx2, fy2 = tp_core.deln_damp_fluxes(q, 0, gg, prefac=0.1, edges=True)
    return fx2

probe("deln_damp_fluxes nord=0", _deln0, ones(P, P), ones(NW, P),
      ones(P, NW), ones(P, P))

# xtp_u with metrics as inputs
def _xtp(c, u, dx, rdx):
    return sw_core.xtp_u(c, u, dx, rdx, 6, edges=True)

probe("xtp_u hord=6", _xtp, ones(NW, NW), ones(NW, P), ones(NW, P),
      ones(NW, P))

def _ytp(c, v, dy, rdy):
    return sw_core.ytp_v(c, v, dy, rdy, 6, edges=True)

probe("ytp_v hord=6", _ytp, ones(NW, NW), ones(NW, P).T, ones(NW, P).T,
      ones(NW, P).T)

# corner solve with metrics as inputs
def _csolve(ut, vt, uc, vc, cu, cv):
    gg = type("G", (), {})()
    gg.cosa_u, gg.cosa_v = cu, cv
    u2, v2 = sw_core._dsw_corner_solve(ut, vt, uc, vc, gg, npx)
    return u2

probe("_dsw_corner_solve", _csolve, ones(P, NW), ones(NW, P), ones(P, NW),
      ones(NW, P), ones(P, NW), ones(NW, P))

# full fv_tp_2d (pre-swept corners passed in; XLA jnp path)
def _tp2d(q, qx, qy, crx, cry, xfx, yfx, area, dxa, dya):
    from gfdl_atmos_cubed_sphere_tpu.ops.pallas_tp import _tp2d_body
    ra_x = area[:, H:H + n] * 1.0
    ra_y = area[H:H + n, :] * 1.0
    fx_ou, fx2, fy_ou, fy2 = _tp2d_body(
        q, qx, qy, crx[:, H:H + n + 1], cry[H:H + n + 1, :],
        xfx[:, H:H + n + 1], yfx[H:H + n + 1, :], area, ra_x, ra_y,
        dxa, dya, 10, 1.0, False)
    return fx_ou

probe("tp2d body hord=10", _tp2d, ones(P, P), ones(P, P), ones(P, P),
      ones(P, NW), ones(NW, P), ones(P, NW), ones(NW, P), ones(P, P),
      ones(P, P), ones(P, P))

# ke_section select path with metric inputs
def _ke(u, v, uc, vc, ut, vt, cosa, rsina, dx, rdx, dy, rdy):
    return sw_core.ke_section(u, v, uc, vc, ut, vt, cosa, rsina,
                              dx, rdx, dy, rdy, 30.0, 6, 1.0,
                              npx, True, use_select=True)

probe("ke_section use_select", _ke, ones(NW, P), ones(P, NW), ones(P, NW),
      ones(NW, P), ones(P, NW), ones(NW, P), ones(NW, NW), ones(NW, NW),
      ones(NW, P), ones(NW, P), ones(P, NW), ones(P, NW))

def _ke_cat(u, v, uc, vc, ut, vt, cosa, rsina, dx, rdx, dy, rdy):
    return sw_core.ke_section(u, v, uc, vc, ut, vt, cosa, rsina,
                              dx, rdx, dy, rdy, 30.0, 6, 1.0,
                              npx, True, use_select=False)

probe("ke_section concat path", _ke_cat, ones(NW, P), ones(P, NW),
      ones(P, NW), ones(NW, P), ones(P, NW), ones(NW, P), ones(NW, NW),
      ones(NW, NW), ones(NW, P), ones(NW, P), ones(P, NW), ones(P, NW))

# d_sw ut/vt edge strip block with metric inputs
def _dsw_edges(uc, vc, cosa_u, rsin_u, cosa_v, rsin_v, ssg1, ssg3):
    from gfdl_atmos_cubed_sphere_tpu.ops.sw_core import _cl, _cr, _rl, _rr, fi
    f = fi
    dt = 30.0
    vsum = (_cl(vc)[..., :-1, :] + _cr(vc)[..., :-1, :]
            + _cl(vc)[..., 1:, :] + _cr(vc)[..., 1:, :])
    ut = (uc - 0.25 * cosa_u * vsum) * rsin_u
    E = f(npx)
    catx = lambda ps: jnp.concatenate(ps, -1)

    def ut_edge_col(iw):
        cw = uc[..., :, f(iw):f(iw) + 1]
        return jnp.where(cw * dt > 0.0,
                         cw / ssg3[..., :, f(iw - 1):f(iw - 1) + 1],
                         cw / ssg1[..., :, f(iw):f(iw) + 1])

    return catx([ut[..., :, :f(1)], ut_edge_col(1),
                 ut[..., :, f(1) + 1:E], ut_edge_col(npx),
                 ut[..., :, E + 1:]])

probe("d_sw ut edge strips", _dsw_edges, ones(P, NW), ones(NW, P),
      ones(P, NW), ones(P, NW), ones(NW, P), ones(NW, P), ones(P, NW),
      ones(P, NW))
