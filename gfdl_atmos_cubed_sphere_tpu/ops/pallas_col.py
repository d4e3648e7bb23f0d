"""Pallas TPU column kernels: fused vertical-integration passes.

geopk (dyn_core.F90 geopk:2202) is executed 2x per acoustic iteration
(13x per big step): pe/peln/pk/gz/pkz from delp/pt. As XLA ops this is
~8 bandwidth passes (two cumsums, log, exp, divides) over [6,K,Y,X];
here one kernel per (tile, y-strip) holds the whole column in VMEM and
writes every output in a single HBM round trip. Vertical prefix sums use
log-step shifted adds (7 passes for K<=128) rather than a sequential
k loop — the k axis is the major dim of the block, so the shifts are
free-striding VMEM copies.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gfdl_atmos_cubed_sphere_tpu.constants as con

# Default OFF: the fused kernel is 1.5x faster than geopk in ISOLATION
# (3.0 vs 4.5 ms at C192L79) but made the full step 13% SLOWER (1.376 vs
# 1.213 s/step) — XLA fuses geopk's elementwise tail into its consumers
# (p_grad_c, one_grad_p terms), and the opaque custom-call forces all 5
# outputs plus their consumers through HBM. Mega-kernels only pay when
# they swallow the consumers too. Enable with GFDL_TPU_PALLAS_COL=1.
_PALLAS_COL = os.environ.get("GFDL_TPU_PALLAS_COL", "0") != "0"


def _cumsum_k(x):
    """Inclusive prefix sum along axis 0 via log-step shifted adds."""
    K = x.shape[0]
    s = 1
    while s < K:
        pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-s]], axis=0)
        s *= 2
    return x


def _rcumsum_k(x):
    """Reverse (suffix) prefix sum along axis 0."""
    K = x.shape[0]
    s = 1
    while s < K:
        pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([x[s:], pad], axis=0)
        s *= 2
    return x


def _geopk_kernel(akap, ptop, delp_ref, pt_ref, phis_ref,
                  pe_ref, peln_ref, pk_ref, gz_ref, pkz_ref):
    delp = delp_ref[0]                     # [K, by, X]
    pt = pt_ref[0]
    phis = phis_ref[0, 0]                  # [by, X]

    pe_b = ptop + _cumsum_k(delp)          # interfaces 1..K
    pe = jnp.concatenate(
        [jnp.full_like(pe_b[:1], ptop), pe_b], axis=0)   # [K+1, by, X]
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    dpk = pk[1:] - pk[:-1]
    incr = con.CP_AIR * pt * dpk
    gz_above = _rcumsum_k(incr)
    gz = jnp.concatenate([gz_above, jnp.zeros_like(gz_above[:1])],
                         axis=0) + phis[None]
    pkz = dpk / (akap * (peln[1:] - peln[:-1]))

    pe_ref[0] = pe
    peln_ref[0] = peln
    pk_ref[0] = pk
    gz_ref[0] = gz
    pkz_ref[0] = pkz


def geopk_pallas(delp_p, pt_p, phis_p, akap, ptop):
    """Fused geopk: same contract as model.dyn_core.geopk. delp_p/pt_p
    [6, K, Y, X]; phis_p [6, Y, X] or [6, 1, Y, X]."""
    T, K, Y, X = delp_p.shape
    if phis_p.ndim == 3:
        phis_p = phis_p[:, None]
    # Mosaic requires the second-minor block dim divisible by 8: pad the
    # y extent up and slice the outputs back (the slices fuse into the
    # consumers; the pad is 2 small concats vs ~8 full passes saved)
    Y0 = Y
    if Y % 8:
        Yp = (Y + 7) // 8 * 8
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:2] + (Yp - Y, X), a.dtype)], axis=2)
        delp_p = zpad(delp_p)
        pt_p = zpad(pt_p)
        phis_p = zpad(phis_p)
        Y = Yp
    by = 8

    V = pltpu.VMEM
    cell = pl.BlockSpec((1, K, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    face = pl.BlockSpec((1, K + 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    surf = pl.BlockSpec((1, 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    out_shape = [
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # pe
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # peln
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # pk
        jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),  # gz
        jax.ShapeDtypeStruct((T, K, Y, X), delp_p.dtype),      # pkz
    ]
    out_specs = [face, face, face, face, cell]
    kernel = functools.partial(_geopk_kernel, float(akap), float(ptop))
    outs = pl.pallas_call(
        kernel,
        grid=(T, Y // by),
        in_specs=[cell, cell, surf],
        out_specs=out_specs,
        out_shape=out_shape,
    )(delp_p, pt_p, phis_p)
    if Y != Y0:
        outs = tuple(o[:, :, :Y0] for o in outs)
    return outs


def use_pallas_col(a):
    if not (_PALLAS_COL and a.ndim == 4):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Round-4 pressure-stage kernels. The round-1 lesson (header): an isolated
# geopk kernel LOSES because the custom-call boundary un-fuses its consumers.
# These kernels swallow the consumer instead:
#   * pgradc_fused_pallas: geopk(C) + p_grad_c in ONE pass — reads delpc/ptc/
#     uc/vc, writes the updated C winds; pe/peln/pk/gz never touch HBM
#     (dyn_core.F90 geopk:2202 + p_grad_c:1635).
#   * pkgz_pallas: the D-stage variant that only materializes the two
#     outputs one_grad_p actually consumes (pk, gz), in one HBM round trip.
# Cross-row dependence of the vc update (wall j needs cell row j-1) is met
# by passing the cell fields twice: the block itself plus the previous
# y-strip, whose last row is integrated in-kernel (cumsum on [K,1,X] —
# negligible recompute instead of an unsupported overlapping BlockSpec).
# ---------------------------------------------------------------------------

_PALLAS_PG = os.environ.get("GFDL_TPU_PALLAS_PG", "1") != "0"


def use_pallas_pg(a, hydrostatic=True):
    if not (_PALLAS_PG and hydrostatic and a.ndim == 4):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pk_gz_cols(delp, pt, phis, akap, ptop):
    """Column integrals on a [K, r, X] block: returns pk, gz [K+1, r, X]."""
    pe_b = ptop + _cumsum_k(delp)
    pe = jnp.concatenate([jnp.full_like(pe_b[:1], ptop), pe_b], axis=0)
    pk = jnp.exp(akap * jnp.log(pe))
    incr = con.CP_AIR * pt * (pk[1:] - pk[:-1])
    gz_above = _rcumsum_k(incr)
    gz = jnp.concatenate([gz_above, jnp.zeros_like(gz_above[:1])],
                         axis=0) + phis
    return pk, gz


def _pgradc_kernel(akap, ptop, dt2, by, f1, fn_cell, fn_wall,
                   delp_ref, pt_ref, phis_ref, delpm_ref, ptm_ref, phism_ref,
                   uc_ref, vc_ref, rdxc_ref, rdyc_ref, uco_ref, vco_ref):
    """One (tile, y-strip) program: geopk(C) + p_grad_c.

    Block rows: cells r0..r0+by-1 (uc rows), walls r0..r0+by-1 (vc rows).
    delpm/ptm/phism: the PREVIOUS y-strip (index map y-1, clamped), whose
    last row supplies cell row r0-1 for the vc (y-difference) update.
    f1/fn_cell/fn_wall: padded-frame index bounds of the compute region
    (p_grad_c's cell_c / wall_c slices)."""
    delp = delp_ref[0]
    pt = pt_ref[0]
    phis = phis_ref[0, 0][None]
    pk, gz = _pk_gz_cols(delp, pt, phis, akap, ptop)
    # previous strip's last cell row
    dm = delpm_ref[0][:, -1:, :]
    pm = ptm_ref[0][:, -1:, :]
    # NB: `[None, -1:, :]` would lower to an (unsupported) gather — slice
    # first, then add the axis
    fm = phism_ref[0, 0][-1:, :][None]
    pk_m, gz_m = _pk_gz_cols(dm, pm, fm, akap, ptop)

    wk = pk[1:] - pk[:-1]
    gz1, gz2 = gz[:-1], gz[1:]
    pk1, pk2 = pk[:-1], pk[1:]

    r0 = pl.program_id(1) * by
    X = delp.shape[-1]
    iy = jax.lax.broadcasted_iota(jnp.int32, (by, 1), 0) + r0
    ixw = jax.lax.broadcasted_iota(jnp.int32, (1, X + 1), 1)

    # ---- uc: x-difference on walls (cells i-1, i in-block) ---------------
    termx = ((gz2[:, :, :-1] - gz1[:, :, 1:]) * (pk2[:, :, 1:] - pk1[:, :, :-1])
             + (gz1[:, :, :-1] - gz2[:, :, 1:]) * (pk2[:, :, :-1] - pk1[:, :, 1:]))
    du = dt2 * rdxc_ref[0, 0][:, 1:-1] * termx / (wk[:, :, :-1] + wk[:, :, 1:])
    du_full = jnp.concatenate(
        [jnp.zeros_like(du[:, :, :1]), du, jnp.zeros_like(du[:, :, :1])], -1)
    umask = ((iy >= f1) & (iy <= fn_cell)
             & (ixw >= f1) & (ixw <= fn_wall)).astype(delp.dtype)
    uco_ref[0] = uc_ref[0] + umask * du_full

    # ---- vc: y-difference on wall rows (cell rows j-1 from the shifted
    # concat of the previous strip's last row + own rows) ------------------
    gzs = jnp.concatenate([gz_m, gz], axis=1)       # rows r0-1 .. r0+by-1
    pks = jnp.concatenate([pk_m, pk], axis=1)
    wks = pks[1:] - pks[:-1]
    g1l, g2l = gzs[:-1, :-1], gzs[1:, :-1]          # cell row j-1
    g1r, g2r = gzs[:-1, 1:], gzs[1:, 1:]            # cell row j
    p1l, p2l = pks[:-1, :-1], pks[1:, :-1]
    p1r, p2r = pks[:-1, 1:], pks[1:, 1:]
    termy = ((g2l - g1r) * (p2r - p1l) + (g1l - g2r) * (p2l - p1r))
    dv = dt2 * rdyc_ref[0, 0] * termy / (wks[:, :-1] + wks[:, 1:])
    ixc = jax.lax.broadcasted_iota(jnp.int32, (1, X), 1)
    vmask = ((iy >= f1) & (iy <= fn_wall)
             & (ixc >= f1) & (ixc <= fn_cell)).astype(delp.dtype)
    vco_ref[0] = vc_ref[0] + vmask * dv


def pgradc_fused_pallas(delpc, ptc, phis_p, uc, vc, g, dt2, akap, ptop,
                        npx, interpret=False):
    """Fused hydrostatic geopk(C) + p_grad_c (dyn_core.F90:2202 + :1635):
    returns the pressure-gradient-updated (uc, vc). delpc/ptc [T,K,NC,NC]
    padded cells; uc [T,K,NC,NW]; vc [T,K,NW,NC]."""
    from ..ops.fill_corners import fi
    T, K, Y, X = delpc.shape
    if phis_p.ndim == 3:
        phis_p = phis_p[:, None]
    by = 8
    Yp = -(-(Y + 1) // by) * by          # room for the vc wall rows (Y+1)
    zp = lambda a, n_: jnp.concatenate(
        [a, jnp.zeros(a.shape[:2] + (n_ - a.shape[2],) + a.shape[3:],
                      a.dtype)], axis=2)
    delp_z = zp(delpc, Yp)
    pt_z = zp(ptc, Yp)
    phis_z = zp(phis_p, Yp)
    uc_z = zp(uc, Yp)
    vc_z = zp(vc, Yp)

    V = pltpu.VMEM
    cell = pl.BlockSpec((1, K, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    cellm = pl.BlockSpec((1, K, by, X),
                         (lambda t, y: (t, 0, jnp.maximum(y - 1, 0), 0)),
                         memory_space=V)
    surf = pl.BlockSpec((1, 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    surfm = pl.BlockSpec((1, 1, by, X),
                         (lambda t, y: (t, 0, jnp.maximum(y - 1, 0), 0)),
                         memory_space=V)
    ucb = pl.BlockSpec((1, K, by, X + 1), (lambda t, y: (t, 0, y, 0)),
                       memory_space=V)
    vcb = pl.BlockSpec((1, K, by, X), (lambda t, y: (t, 0, y, 0)),
                       memory_space=V)
    mx = pl.BlockSpec((1, 1, by, X + 1), (lambda t, y: (t, 0, y, 0)),
                      memory_space=V)
    my = pl.BlockSpec((1, 1, by, X), (lambda t, y: (t, 0, y, 0)),
                      memory_space=V)

    f = fi
    kernel = functools.partial(
        _pgradc_kernel, float(akap), float(ptop), float(dt2), by,
        f(1), f(npx - 1), f(npx))
    rdxc = zp(jnp.asarray(g.rdxc, delpc.dtype), Yp)
    rdyc = zp(jnp.asarray(g.rdyc, delpc.dtype), Yp)
    uco, vco = pl.pallas_call(
        kernel,
        grid=(T, Yp // by),
        in_specs=[cell, cell, surf, cellm, cellm, surfm, ucb, vcb, mx, my],
        out_specs=[ucb, vcb],
        out_shape=[jax.ShapeDtypeStruct((T, K, Yp, X + 1), delpc.dtype),
                   jax.ShapeDtypeStruct((T, K, Yp, X), delpc.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(delp_z, pt_z, phis_z, delp_z, pt_z, phis_z, uc_z, vc_z, rdxc, rdyc)
    return uco[:, :, :Y], vco[:, :, :Y + 1]


def _pkgz_kernel(akap, ptop, delp_ref, pt_ref, phis_ref, pk_ref, gz_ref):
    pk, gz = _pk_gz_cols(delp_ref[0], pt_ref[0], phis_ref[0, 0][None],
                         akap, ptop)
    pk_ref[0] = pk
    gz_ref[0] = gz


def pkgz_pallas(delp_p, pt_p, phis_p, akap, ptop, interpret=False):
    """D-stage slim geopk: only (pk, gz) — the two arrays one_grad_p
    consumes (dyn_core.F90:906 geopk -> :1909 one_grad_p) — in one HBM
    round trip per (tile, y-strip)."""
    T, K, Y, X = delp_p.shape
    if phis_p.ndim == 3:
        phis_p = phis_p[:, None]
    Y0 = Y
    if Y % 8:
        Yp = (Y + 7) // 8 * 8
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:2] + (Yp - Y, X), a.dtype)], axis=2)
        delp_p = zpad(delp_p)
        pt_p = zpad(pt_p)
        phis_p = zpad(phis_p)
        Y = Yp
    by = 8
    V = pltpu.VMEM
    cell = pl.BlockSpec((1, K, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    face = pl.BlockSpec((1, K + 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    surf = pl.BlockSpec((1, 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    kernel = functools.partial(_pkgz_kernel, float(akap), float(ptop))
    pk, gz = pl.pallas_call(
        kernel,
        grid=(T, Y // by),
        in_specs=[cell, cell, surf],
        out_specs=[face, face],
        out_shape=[jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype),
                   jax.ShapeDtypeStruct((T, K + 1, Y, X), delp_p.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(delp_p, pt_p, phis_p)
    if Y != Y0:
        pk, gz = pk[:, :, :Y0], gz[:, :, :Y0]
    return pk, gz
