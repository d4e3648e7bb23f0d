"""Pallas TPU kernels for d_sw sections beyond fv_tp_2d.

ke_section_pallas runs the d_sw kinetic-energy stage (sw_core.F90:1063-1228
— vb/ub corner winds, their ytp_v/xtp_u PPM self-advection, corner KE fixes)
as one kernel per (tile, level-block) face with every operand VMEM-resident.
The kernel body reuses sw_core.ke_section verbatim (the strip-concat jnp
formulation compiles under Mosaic), so the numerics match the XLA path up to
f32 reassociation.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 3


def _make_ke_kernel(dt, hord_mt, lim_fac, npx):
    from .sw_core import ke_section

    def kernel(u_ref, v_ref, uc_ref, vc_ref, ut_ref, vt_ref, cosa_ref,
               rsina_ref, dx_ref, rdx_ref, dy_ref, rdy_ref, ke_ref):
        sq = lambda r: r[0]
        ke = ke_section(sq(u_ref), sq(v_ref), sq(uc_ref), sq(vc_ref),
                        sq(ut_ref), sq(vt_ref), sq(cosa_ref), sq(rsina_ref),
                        sq(dx_ref), sq(rdx_ref), sq(dy_ref), sq(rdy_ref),
                        dt, hord_mt, lim_fac, npx, True, use_select=True)
        ke_ref[0] = ke

    return kernel


def ke_section_pallas(u, v, uc, vc, ut, vt, cosa, rsina, dx, rdx, dy, rdy,
                      dt, hord_mt, lim_fac, npx):
    """u/vc/vt: [6, K, NW, NC]; v/uc/ut: [6, K, NC, NW]; metrics [6, 1, ., .].
    Returns ke [6, K, NW, NW]."""
    K = u.shape[1]
    NW = u.shape[-2]
    NC = u.shape[-1]

    def bcast(a):
        a = jnp.asarray(a, u.dtype)
        if a.ndim == 3:
            a = a[:, None]
        return a

    ins = [u, v, uc, vc, ut, vt, bcast(cosa), bcast(rsina), bcast(dx),
           bcast(rdx), bcast(dy), bcast(rdy)]

    kb = 1
    for cand in (4, 2, 1):
        if K % cand == 0:
            kb = cand
            break

    def spec_for(a):
        _, kk, yy, xx = a.shape
        if kk == 1:
            return pl.BlockSpec((1, 1, yy, xx), (lambda t, k: (t, 0, 0, 0)),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, kb, yy, xx), (lambda t, k: (t, k, 0, 0)),
                            memory_space=pltpu.VMEM)

    kernel = _make_ke_kernel(float(dt), int(hord_mt), float(lim_fac),
                             int(npx))
    return pl.pallas_call(
        kernel,
        grid=(6, K // kb),
        in_specs=[spec_for(a) for a in ins],
        out_specs=pl.BlockSpec((1, kb, NW, NW), lambda t, k: (t, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, K, NW, NW), u.dtype),
    )(*ins)
