"""Held-Suarez (1994) idealized forcing.

Re-implements /root/reference/driver/solo/hswf.F90 Held_Suarez_Tend:45 —
Newtonian relaxation of temperature toward the HS radiative-equilibrium
profile plus Rayleigh boundary-layer friction, in the implicit form the
reference uses (relaxation applied as (T + r*Teq)/(1+r)); optional
strat/mesosphere extension (lapse-rate Teq above 100 hPa, hswf.F90:152-170).

The wind friction is applied directly to the D-grid winds with the
cell-pair-averaged damping factor (the effect of fv_update_phys'
update_dwinds_phys scatter of A-grid tendencies, fv_update_phys.F90:67).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as con

SDAY = 86400.0
T0 = 200.0
TY = 60.0
TZ = 10.0
SIGB = 0.7
H0 = 7.0    # scale height (km) for the strat extension


def hs_forcing(pt, delp, u, v, g, ptop, pdt, strat=False, radius=None):
    """Apply one physics step of HS forcing. pt: TEMPERATURE [6,K,n,n].
    Returns (pt, u, v)."""
    akap = 2.0 / 7.0
    p0 = 1.0e5
    ap0k = 1.0 / p0 ** akap
    algpk = np.log(ap0k)
    rad_ratio = (radius or con.RADIUS) / 6371.0e3
    kf_day = SDAY * rad_ratio
    rkv = pdt / kf_day
    rka = pdt / (40.0 * kf_day)
    rks = pdt / (4.0 * kf_day)
    rsgb = 1.0 / (1.0 - SIGB)

    lat = g.aglat_int if hasattr(g, "aglat_int") else jnp.asarray(
        g.geom.interior("aglat"))[:, None]

    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    pl = delp / (peln[:, 1:] - peln[:, :-1])
    pkz = (jnp.exp(akap * peln[:, 1:]) - jnp.exp(akap * peln[:, :-1])) / (
        akap * (peln[:, 1:] - peln[:, :-1]))
    ps = pe[:, -1:]

    sinl2 = jnp.sin(lat) ** 2
    cosl2 = jnp.cos(lat) ** 2
    cosl4 = cosl2 ** 2

    # troposphere HS equilibrium temperature (hswf.F90:180-184)
    tey = ap0k * (315.0 - TY * sinl2)
    tez = TZ * (ap0k / akap) * cosl2
    teq = jnp.maximum(T0, (tey - tez * (jnp.log(pkz) + algpk)) * pkz)

    sigl = pl / ps
    f1 = jnp.maximum(0.0, (sigl - SIGB) * rsgb)
    rkt = rka + (rks - rka) * f1 * cosl4
    pt_new = (pt + rkt * teq) / (1.0 + rkt)

    if strat:
        # stratosphere (1-100 hPa): Teq follows +2.25 K/km lapse built
        # downward-to-upward from the tropopause (hswf.F90:152-170)
        t_ms = 10.0 * rad_ratio
        t_st = 40.0 * rad_ratio
        tau = (t_st - t_ms) / np.log(100.0)
        rms = pdt / (t_ms * SDAY)
        plk = jnp.moveaxis(pl, 1, 0)                    # [K, ...]
        teq_k = jnp.moveaxis(teq, 1, 0)
        cosl = jnp.cos(lat)                              # [6,1,n,n]

        def up(carry, x):
            teq_below, pl_below = carry
            plk_, teqtrop = x
            dz = H0 * jnp.log(pl_below / plk_)
            strat_t = teq_below + 2.25 * cosl[:, 0] * dz
            meso_t = teq_below - 2.25 * cosl[:, 0] * dz
            t = jnp.where(plk_ <= 1.0e2, meso_t,
                          jnp.where(plk_ <= 100.0e2, strat_t, teqtrop))
            return (t, plk_), t

        K = pl.shape[1]
        init = (teq_k[-1], plk[-1])
        _, teq_up = jax.lax.scan(up, init, (plk[:-1][::-1], teq_k[:-1][::-1]))
        teq_s = jnp.concatenate([teq_up[::-1], teq_k[-1:]], axis=0)
        teq_s = jnp.moveaxis(teq_s, 0, 1)
        relx = t_ms + tau * jnp.log(jnp.maximum(0.01 * pl, 1e-30))
        relx = pdt / (relx * SDAY)
        rk_strat = jnp.where(pl <= 1.0e2, rms,
                             jnp.where(pl <= 100.0e2, relx, rkt))
        pt_new = jnp.where(pl <= 100.0e2,
                           (pt + rk_strat * teq_s) / (1.0 + rk_strat),
                           pt_new)

    # bottom Rayleigh friction (hswf.F90:188-196), damping factor per cell
    fac = jnp.maximum(0.0, (sigl - SIGB) * rsgb) * rkv
    damp = 1.0 / (1.0 + fac)
    # spread to D-wind walls by cell-pair average
    du = 0.5 * (damp[..., :-1, :] + damp[..., 1:, :])
    damp_u = jnp.concatenate(
        [damp[..., :1, :], du, damp[..., -1:, :]], axis=-2)
    dv = 0.5 * (damp[..., :, :-1] + damp[..., :, 1:])
    damp_v = jnp.concatenate(
        [damp[..., :, :1], dv, damp[..., :, -1:]], axis=-1)
    return pt_new, u * damp_u, v * damp_v
