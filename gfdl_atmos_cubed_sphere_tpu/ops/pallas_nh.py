"""Pallas TPU kernel for the SIM1 implicit Riemann solver.

The scan-based XLA formulation of the Thomas sweeps (ops/nh_core.py
sim1_solver) executes ~78 tiny per-level fusions per sweep; at C192L79 NH
the 24 riem-solver calls per step cost ~300 ms of dispatch-bound device
time (round-4 NH trace). Here one Pallas program holds a (tile, y-strip)
column block entirely in VMEM and runs the sweeps as hardware fori loops
over levels — one HBM round trip for the whole solve. Dynamic per-level
access uses pl.ds windows of size 1 (a traced integer index does not
lower on Mosaic).

Algorithm transcribed from /root/reference/model/nh_utils.F90
SIM1_solver:1277 (fully-implicit alpha = 1 path, the operational
a_imp > 0.999 default); equivalence vs ops/nh_core.sim1_solver pinned by
tests/test_pallas_nh.py (interpret, f64, 1e-12) and the loop-literal
oracle (tests/oracle/nh_oracle.py).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gfdl_atmos_cubed_sphere_tpu.constants as con

_PALLAS_SIM1 = os.environ.get("GFDL_TPU_PALLAS_SIM1", "1") != "0"


def use_sim1_pallas(a, alpha):
    if not (_PALLAS_SIM1 and alpha >= 0.999 and a.ndim == 4):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _sim1_kernel(dt, rgas, gama, kappa, p_fac,
                 dm_ref, pm_ref, pem_ref, w_ref, dz_ref, pt_ref, ws_ref,
                 pe2_ref, w2_ref, dzo_ref,
                 pp_ref, gam_ref, aa_ref, bb_ref, dd_ref, grat_ref):
    K = dm_ref.shape[1]
    dm = dm_ref[0]
    pm = pm_ref[0]
    w1 = w_ref[0]
    dz = dz_ref[0]
    pt = pt_ref[0]
    ws = ws_ref[0, 0]
    t1g = 2.0 * dt * dt
    rdt = 1.0 / dt
    capa1 = kappa - 1.0

    def S(ref, k):          # scratch [K(+1), by, X] -> [1, by, X] window
        return ref[pl.ds(k, 1)]

    def F(ref, k):          # field block (1, K, by, X) -> [1, by, X]
        return ref[0, pl.ds(k, 1)]

    pec = jnp.exp(gama * jnp.log(-dm / dz * rgas * pt)) - pm    # [K, by, X]
    grat = dm[:-1] / dm[1:]                                     # [K-1]
    grat_ref[...] = jnp.concatenate([grat, jnp.zeros_like(grat[:1])], 0)
    bb_ref[...] = jnp.concatenate(
        [2.0 * (1.0 + grat), 2.0 * jnp.ones_like(grat[:1])], 0)
    dd_ref[...] = jnp.concatenate(
        [3.0 * (pec[:-1] + grat * pec[1:]), 3.0 * pec[-1:]], 0)
    # pp forward sweep (pp_ref rows 0..K)
    pp_ref[0:1] = jnp.zeros_like(dm[:1])
    bet0 = bb_ref[0:1]
    pp_ref[1:2] = dd_ref[0:1] / bet0

    def fwd(k, bet):
        gam = S(grat_ref, k - 1) / bet
        bet = S(bb_ref, k) - gam
        pp_ref[pl.ds(k + 1, 1)] = (S(dd_ref, k) - S(pp_ref, k)) / bet
        gam_ref[pl.ds(k, 1)] = gam
        return bet

    jax.lax.fori_loop(1, K, fwd, bet0)

    def bwd(kk, _):
        k = K - 1 - kk                    # k = K-1 .. 1
        pp_ref[pl.ds(k, 1)] = (S(pp_ref, k)
                               - S(gam_ref, k) * S(pp_ref, k + 1))
        return 0

    jax.lax.fori_loop(0, K - 1, bwd, 0)

    # w solver
    pem_i = pem_ref[0]                                          # [K+1]
    aa_mid = (t1g * gama / (dz[:-1] + dz[1:])) * pem_i[1:-1]    # rows 1..K-1
    aa_ref[...] = jnp.concatenate([jnp.zeros_like(aa_mid[:1]), aa_mid], 0)
    bet = dm[:1] - aa_ref[1:2]
    w2_ref[0, 0:1] = (dm[:1] * w1[:1] + dt * pp_ref[1:2]) / bet

    def wfwd(k, bet):                     # k = 1 .. K-2
        aak = S(aa_ref, k)
        dmk = F(dm_ref, k)
        gam = aak / bet
        bet = dmk - (aak + S(aa_ref, k + 1) + aak * gam)
        w2_ref[0, pl.ds(k, 1)] = (
            dmk * F(w_ref, k) + dt * (S(pp_ref, k + 1) - S(pp_ref, k))
            - aak * F(w2_ref, k - 1)) / bet
        gam_ref[pl.ds(k, 1)] = gam
        return bet

    bet = jax.lax.fori_loop(1, K - 1, wfwd, bet)
    p1 = t1g * gama / dz[-1:] * pem_i[-1:]
    aaK = aa_ref[K - 1:K]
    gamK = aaK / bet
    betK = dm[-1:] - (aaK + p1 + aaK * gamK)
    gam_ref[K - 1:K] = gamK
    w2_ref[0, K - 1:K] = (dm[-1:] * w1[-1:]
                          + dt * (pp_ref[K:K + 1] - pp_ref[K - 1:K])
                          - p1 * ws[None] - aaK * w2_ref[0, K - 2:K - 1]) \
        / betK

    def wbwd(kk, _):
        k = K - 2 - kk                    # k = K-2 .. 0
        w2_ref[0, pl.ds(k, 1)] = (F(w2_ref, k)
                                  - S(gam_ref, k + 1) * F(w2_ref, k + 1))
        return 0

    jax.lax.fori_loop(0, K - 1, wbwd, 0)

    # interface pressure perturbation: pe(k+1) = pe(k) + dm*(w2-w1)*rdt
    pe2_ref[0, 0:1] = jnp.zeros_like(dm[:1])

    def pacc(k, _):
        pe2_ref[0, pl.ds(k + 1, 1)] = (
            F(pe2_ref, k) + F(dm_ref, k)
            * (F(w2_ref, k) - F(w_ref, k)) * rdt)
        return 0

    jax.lax.fori_loop(0, K, pacc, 0)

    # dz from the blended pressure (bottom-up recurrence)
    R3 = 1.0 / 3.0
    p1b = (pe2_ref[0, K - 1:K] + 2.0 * pe2_ref[0, K:K + 1]) * R3
    dzo_ref[0, K - 1:K] = -dm[-1:] * rgas * pt[-1:] * jnp.exp(
        capa1 * jnp.log(jnp.maximum(p_fac * pm[-1:], p1b + pm[-1:])))

    def dzbwd(kk, p1c):
        k = K - 2 - kk                    # k = K-2 .. 0
        gr = S(grat_ref, k)
        p1c = ((F(pe2_ref, k) + S(bb_ref, k) * F(pe2_ref, k + 1)
                + gr * F(pe2_ref, k + 2)) * R3 - gr * p1c)
        pmk = F(pm_ref, k)
        dzo_ref[0, pl.ds(k, 1)] = -F(dm_ref, k) * rgas * F(pt_ref, k) \
            * jnp.exp(capa1 * jnp.log(jnp.maximum(p_fac * pmk, p1c + pmk)))
        return p1c

    jax.lax.fori_loop(0, K - 1, dzbwd, p1b)


def sim1_pallas(dt, dm2, pm2, pem, w2, dz2, pt2, ws, gama, akap, p_fac,
                interpret=False):
    """Drop-in for ops/nh_core.sim1_solver at alpha = 1. Fields
    [T, K, Y, X]; pem [T, K+1, Y, X]; ws [T, Y, X].
    Returns (pe2 [T, K+1, Y, X], w2, dz2)."""
    T, K, Y, X = dm2.shape
    dtype = dm2.dtype
    Y0 = Y
    by = 8
    if Y % by:
        Yp = (Y + by - 1) // by * by
        zpad = lambda a: jnp.concatenate(
            [a, jnp.ones(a.shape[:2] + (Yp - Y, X), a.dtype)], axis=2)
        dm2, pm2, pem, w2, pt2 = map(zpad, (dm2, pm2, pem, w2, pt2))
        # dz must stay negative in the pad (log of -dm/dz)
        dz2 = jnp.concatenate(
            [dz2, jnp.full(dz2.shape[:2] + (Yp - Y, X), -1.0, dtype)], axis=2)
        ws = jnp.concatenate(
            [ws, jnp.zeros(ws.shape[:1] + (Yp - Y, X), dtype)], axis=1)
        Y = Yp

    V = pltpu.VMEM
    cell = pl.BlockSpec((1, K, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    face = pl.BlockSpec((1, K + 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    surf = pl.BlockSpec((1, 1, by, X), (lambda t, y: (t, 0, y, 0)),
                        memory_space=V)
    kernel = functools.partial(_sim1_kernel, float(dt), con.RDGAS,
                               float(gama), float(akap), float(p_fac))
    pe2, w2n, dzn = pl.pallas_call(
        kernel,
        grid=(T, Y // by),
        in_specs=[cell, cell, face, cell, cell, cell, surf],
        out_specs=[face, cell, cell],
        out_shape=[jax.ShapeDtypeStruct((T, K + 1, Y, X), dtype),
                   jax.ShapeDtypeStruct((T, K, Y, X), dtype),
                   jax.ShapeDtypeStruct((T, K, Y, X), dtype)],
        scratch_shapes=[pltpu.VMEM((K + 1, by, X), dtype),
                        pltpu.VMEM((K, by, X), dtype),
                        pltpu.VMEM((K, by, X), dtype),
                        pltpu.VMEM((K, by, X), dtype),
                        pltpu.VMEM((K, by, X), dtype),
                        pltpu.VMEM((K, by, X), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dm2, pm2, pem, w2, dz2, pt2, ws[:, None])
    if Y != Y0:
        pe2, w2n, dzn = (a[:, :, :Y0] for a in (pe2, w2n, dzn))
    return pe2, w2n, dzn
