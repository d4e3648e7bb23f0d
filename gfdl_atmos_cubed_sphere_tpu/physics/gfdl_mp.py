"""GFDL cloud microphysics (component #17), TPU-native implementation.

Re-implements the six-category (vapor, cloud water, rain, cloud ice, snow,
graupel) GFDL scheme of /root/reference/model/gfdl_mp.F90 (202411):
driver structure gfdl_mp_driver:607 -> mpdrv:1167 -> mp_full:1892
(sedimentation -> warm rain -> ice cloud -> subgrid processes), plus the
inline fast_sat_adj:5726.

TPU-first design choices (vs the Fortran):
- All processes are written as batched elementwise/column ops over
  [6, K, y, x] — the per-(i,j) column loops vanish.
- Saturation vapor pressure uses the reference's own analytic formulas
  (qs_table_core:7085, non-Smith branch: es = e00*exp((dc*ln(T/Tice) +
  L*(T-Tice)/(T*Tice))/Rv)) evaluated directly on the VPU instead of the
  1D lookup tables — transcendentals beat gathers on TPU.
- Terminal velocities use the exact PSD moment coefficients of
  setup_mp:823-844 (tva/tvb, Lin et al. 1983 power laws), precomputed on
  host with math.gamma.
- Sedimentation is the time-implicit upstream scheme implicit_fall:5250 as
  a lax.scan down the column.

Processes implemented: sedimentation (qr/qi/qs/qg) with precip fluxes and
sedi_heat, warm rain (praut:3006 Hong-style autoconversion, pracw:2950
accretion, prevp:2840 rain evaporation), ice cloud (pimlt:3244 ice melt,
pifr:3303 instant freezing, psaut:3599 ice->snow, pgaut:3854
snow->graupel, psaci:3536 / pgacw accretion, tau-based psmlt/pgmlt), and
saturation adjustment (pidep_pisub:4457 deposition/sublimation,
pcond_pevap:4198 condensation/evaporation, complete freezing below t_wfr).
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as con

# ---- gfdl_mp.F90 module constants (:130-200) ------------------------------
RGRAV = 1.0 / con.GRAV
C_ICE = 2.106e3        # IFS values used by gfdl_mp (NOT constants_mod's)
C_LIQ = 4.218e3
CP_VAP = 4.0 * con.RVGAS
CV_AIR = con.CP_AIR - con.RDGAS
CV_VAP = 3.0 * con.RVGAS
DC_VAP = CP_VAP - C_LIQ
DC_ICE = C_LIQ - C_ICE
D2_ICE = CP_VAP - C_ICE
TICE = 273.16
HLV = 2.5e6
HLF = 3.3358e5
LV0 = HLV - DC_VAP * TICE
LI0 = HLF - DC_ICE * TICE
LI2 = LV0 + LI0
E00 = 611.21
EPS = con.RDGAS / con.RVGAS
RHO0 = 1.2             # reference air density for denfac
QCMIN = 1.0e-12        # min condensate
QFMIN = 1.0e-8         # min falling condensate

RHOW, RHOI, RHOR, RHOS, RHOG = 1.0e3, 9.17e2, 1.0e3, 1.0e2, 4.0e2


@dataclass(frozen=True)
class MPConfig:
    """gfdl_mp_nml subset (defaults from gfdl_mp.F90:320-460)."""
    ntimes: int = 1
    tau_v2l: float = 150.0     # condensation timescale (s)
    tau_l2v: float = 300.0     # evaporation
    tau_i2s: float = 1000.0    # ice -> snow autoconversion
    tau_g2r: float = 600.0
    tau_smlt: float = 900.0    # snow melt
    tau_gmlt: float = 600.0
    tau_revp: float = 150.0    # rain evaporation
    ql0_max: float = 2.0e-3    # max cloud water before autoconversion
    qi0_crt: float = 1.0e-4    # ice -> snow threshold (kg/m^3)
    qs0_crt: float = 1.0e-3    # snow -> graupel threshold (kg/m^3)
    c_paut: float = 0.5        # autoconversion efficiency
    c_pracw: float = 0.8       # rain accretion efficiency
    c_psaci: float = 0.05      # snow-ice accretion efficiency
    c_pgacw: float = 1.0
    c_psacw: float = 1.0       # snow-cloud water accretion (gfdl_mp.F90)
    c_pgaci: float = 0.05      # graupel-ice accretion efficiency
    c_pgacr: float = 1.0       # graupel-rain accretion (freezing)
    rh_inc: float = 0.25
    rh_inr: float = 0.25       # rain evap rh threshold increment
    t_min: float = 178.0
    t_sub: float = 184.0
    vr_fac: float = 1.0
    vi_fac: float = 1.0
    vs_fac: float = 1.0
    vg_fac: float = 1.0
    vr_max: float = 12.0
    vi_max: float = 1.0
    vs_max: float = 2.0
    vg_max: float = 12.0
    do_sedi_heat: bool = True
    do_warm_rain_mp: bool = False

    @property
    def t_wfr(self):
        return self.t_min if self.do_warm_rain_mp else TICE - 40.0


def _tv_coeffs(alin, blin, mu, n0_sig, n0_exp, rho_x, extra=1.0):
    """setup_mp:823-844 terminal-velocity PSD coefficients (host scalars).
    vt = (tva/tvb) * (6*den*q) ** (blin/(mu+3))."""
    g = math.gamma
    tva = (math.exp(-blin / (mu + 3) * math.log(n0_sig)) * alin
           * g(mu + blin + 3)
           * math.exp(-blin * n0_exp / (mu + 3) * math.log(10.0))) * extra
    tvb = (math.exp(blin / (mu + 3) * math.log(math.pi * rho_x * g(mu + 3)))
           * g(mu + 3))
    return tva / tvb, blin / (mu + 3)


# defaults (gfdl_mp.F90:339-377); graupel gets the gcon drag factor
_GCON = math.sqrt(4.0 * con.GRAV * RHOG / (3.0 * 0.5 * RHO0))
_TV = {
    "qr": _tv_coeffs(842.0, 0.8, 1.0, 8.0, 6.0, RHOR),
    "qi": _tv_coeffs(7.0e2, 1.0, 3.35, 1.3, 18.0, RHOI),
    "qs": _tv_coeffs(4.8, 0.25, 1.0, 3.0, 6.0, RHOS),
    "qg": _tv_coeffs(1.0, 0.5, 1.0, 4.0, 6.0, RHOG, extra=_GCON),
}


def es_water(t):
    """Saturation vapor pressure over water (qs_table_core:7160-7172)."""
    fac = ((t - TICE) / (t * TICE) * LV0 + DC_VAP * jnp.log(t / TICE)) / con.RVGAS
    return E00 * jnp.exp(fac)


def es_ice(t):
    """Over ice (qs_table_core:7131-7138), blended to water above -10C."""
    fac = ((t - TICE) / (t * TICE) * LI2 + D2_ICE * jnp.log(t / TICE)) / con.RVGAS
    ei = E00 * jnp.exp(fac)
    # linear blend across the reference's 10K supercooled band
    w = jnp.clip((TICE - t) / 10.0, 0.0, 1.0)
    return w * ei + (1.0 - w) * es_water(t)


def wqs(t, p):
    """Saturation mixing ratio over water at pressure p + d(qs)/dT."""
    es = es_water(t)
    qs = EPS * es / jnp.maximum(p - (1.0 - EPS) * es, 1.0e-8)
    dqdt = qs * (DC_VAP + LV0 / t) / (con.RVGAS * t)
    return qs, dqdt


def iqs(t, p):
    """Saturation mixing ratio over ice (blended) + derivative."""
    es = es_ice(t)
    qs = EPS * es / jnp.maximum(p - (1.0 - EPS) * es, 1.0e-8)
    dqdt = qs * (D2_ICE + LI2 / t) / (con.RVGAS * t)
    return qs, dqdt


def _heat_capacities(qv, ql, qr, qi, qs, qg, t):
    """Moist heat capacity + latent-heat factors (setup_mhc_lhc:1120 /
    neg_adj-style lcpk/icpk)."""
    q_liq = ql + qr
    q_sol = qi + qs + qg
    cvm = ((1.0 - (qv + q_liq + q_sol)) * CV_AIR + qv * CV_VAP
           + q_liq * C_LIQ + q_sol * C_ICE)
    lcpk = (LV0 + DC_VAP * t) / cvm
    icpk = (LI0 + DC_ICE * t) / cvm
    return cvm, lcpk, icpk


def terminal_velocity(name, q, den, denfac, cfg: MPConfig):
    """Lin et al. (1983) PSD mass-weighted fall speed (term_rsg:2385)."""
    a, b = _TV[name]
    fac = {"qr": cfg.vr_fac, "qi": cfg.vi_fac,
           "qs": cfg.vs_fac, "qg": cfg.vg_fac}[name]
    vmax = {"qr": cfg.vr_max, "qi": cfg.vi_max,
            "qs": cfg.vs_max, "qg": cfg.vg_max}[name]
    qden = jnp.maximum(6.0 * q * den, 1.0e-20)
    vt = fac * a * jnp.exp(b * jnp.log(qden)) * denfac
    return jnp.where(q < QFMIN, 0.0, jnp.clip(vt, 0.0, vmax))


def implicit_fall(q, vt, dz, dp, dts):
    """Time-implicit upstream sedimentation (implicit_fall:5250).

    q [.., K, y, x] mixing ratio; vt fall speed (m/s, positive down);
    dz layer thickness (m, positive); dp (Pa). Returns (q_new,
    precip_mass [.., y, x] in kg/m^2-equivalent dp units, m1 flux)."""
    qk = jnp.moveaxis(q * dp, 1, 0)
    dzk = jnp.moveaxis(dz, 1, 0)
    ddk = jnp.moveaxis(dts * vt, 1, 0)

    def down(qm_prev, x):
        qq, dzz, dd, dd_up = x
        # influx from above uses the UPPER layer's dts*vt (implicit_fall:
        # qm(k) = (q(k) + qm(k-1)*dd(k-1)) / (dz(k) + dd(k)))
        qm = (qq + qm_prev * dd_up) / (dzz + dd)
        return qm, qm

    qm0 = qk[0] / (dzk[0] + ddk[0])
    _, qm_rest = jax.lax.scan(down, qm0,
                              (qk[1:], dzk[1:], ddk[1:], ddk[:-1]))
    qm = jnp.concatenate([qm0[None], qm_rest], axis=0) * dzk
    m1 = jnp.cumsum(qk - qm, axis=0)
    precip = m1[-1]
    q_new = jnp.moveaxis(qm, 0, 1) / dp
    return q_new, precip, jnp.moveaxis(m1, 0, 1)


def _sedi_heat(t, m1, dp, dz, cw_spec, qv, ql, qr, qi, qs, qg):
    """Temperature adjustment for vertical heat transport by falling
    condensate (sedi_heat:5685, simplified to the leading term)."""
    # heat carried downward: dT = - cw * m1_div / (cvm * dp)
    cvm, _, _ = _heat_capacities(qv, ql, qr, qi, qs, qg, t)
    flux_div = m1 - jnp.concatenate(
        [jnp.zeros_like(m1[:, :1]), m1[:, :-1]], axis=1)
    # falling mass leaves with temperature of the source layer; net local
    # heating is small — apply the standard correction term
    t_in = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
    dq = jnp.concatenate([jnp.zeros_like(m1[:, :1]), m1[:, :-1]], axis=1)
    dt = cw_spec * dq * (t_in - t) / (cvm * dp + cw_spec * dq)
    return t + dt


def sedimentation(t, qv, ql, qr, qi, qs, qg, dp, dz, den, denfac, dts,
                  cfg: MPConfig):
    """Fall of rain/ice/snow/graupel (sedimentation:2156)."""
    precip = {}
    for name, qx in (("qr", qr), ("qi", qi), ("qs", qs), ("qg", qg)):
        vt = terminal_velocity(name, qx, den, denfac, cfg)
        qx_new, p, m1 = implicit_fall(qx, vt, dz, dp, dts)
        if cfg.do_sedi_heat:
            cw = C_LIQ if name == "qr" else C_ICE
            t = _sedi_heat(t, m1, dp, dz, cw, qv, ql, qr, qi, qs, qg)
        precip[name] = p * RGRAV            # kg/m^2
        if name == "qr":
            qr = qx_new
        elif name == "qi":
            qi = qx_new
        elif name == "qs":
            qs = qx_new
        else:
            qg = qx_new
    return t, qr, qi, qs, qg, precip


def warm_rain(t, qv, ql, qr, qi, qs, qg, p_lay, den, denfac, dts,
              cfg: MPConfig):
    """praut + pracw + prevp (warm_rain:2792 children)."""
    # -- autoconversion ql -> qr above threshold (praut:3006, no-subgrid) --
    sink = jnp.maximum(0.0, ql - cfg.ql0_max) * (1.0 - jnp.exp(-dts / 300.0))
    sink = cfg.c_paut * sink
    ql = ql - sink
    qr = qr + sink

    # -- accretion of cloud water by rain (pracw:2950, acr2d form) ---------
    a, b = _TV["qr"]
    qden = jnp.maximum(6.0 * qr * den, 1.0e-20)
    acc = cfg.c_pracw * ql * dts * a * jnp.exp(b * jnp.log(qden)) * denfac
    acc = jnp.minimum(acc, ql)
    acc = jnp.where(qr > QCMIN, acc, 0.0)
    ql = ql - acc
    qr = qr + acc

    # -- rain evaporation toward (sub)saturation (prevp:2840) --------------
    qsat, dqdt = wqs(t, p_lay)
    cvm, lcpk, _ = _heat_capacities(qv, ql, qr, qi, qs, qg, t)
    dq = qsat - qv
    t_wfr = cfg.t_wfr
    can_evap = (t > t_wfr) & (qr > QCMIN) & (dq > 0.0)
    evap = jnp.where(can_evap,
                     jnp.minimum(qr, dts / cfg.tau_revp * dq
                                 / (1.0 + lcpk * dqdt)), 0.0)
    qr = qr - evap
    qv = qv + evap
    t = t - evap * lcpk
    return t, qv, ql, qr


def ice_cloud(t, qv, ql, qr, qi, qs, qg, p_lay, den, denfac, dts,
              cfg: MPConfig):
    """Ice-phase processes (ice_cloud:3116 children), tau-form."""
    cvm, lcpk, icpk = _heat_capacities(qv, ql, qr, qi, qs, qg, t)

    # pimlt: cloud ice melting above freezing (pimlt:3244)
    melt = jnp.where((qi > QCMIN) & (t > TICE),
                     jnp.minimum(qi, (t - TICE) / icpk), 0.0)
    qi = qi - melt
    ql = ql + melt
    t = t - melt * icpk

    # pifr: instant freezing of cloud water below t_wfr (pifr:3303)
    frez = jnp.where((ql > QCMIN) & (t < cfg.t_wfr),
                     jnp.minimum(ql, (cfg.t_wfr - t) / icpk), 0.0)
    ql = ql - frez
    qi = qi + frez
    t = t + frez * icpk

    # psaut: ice -> snow autoconversion above qi0_crt (psaut:3599)
    qi0 = cfg.qi0_crt / jnp.maximum(den, 1e-10)
    saut = jnp.maximum(0.0, qi - qi0) * (1.0 - jnp.exp(-dts / cfg.tau_i2s))
    qi = qi - saut
    qs = qs + saut

    # psaci: accretion of ice by snow (psaci:3536, acr2d form)
    a, b = _TV["qs"]
    qden = jnp.maximum(6.0 * qs * den, 1.0e-20)
    aci = cfg.c_psaci * qi * dts * a * jnp.exp(b * jnp.log(qden)) * denfac
    aci = jnp.where(qs > QCMIN, jnp.minimum(aci, qi), 0.0)
    qi = qi - aci
    qs = qs + aci

    # pgaut: snow -> graupel above qs0_crt (pgaut:3854)
    qs0 = cfg.qs0_crt / jnp.maximum(den, 1e-10)
    gaut = jnp.maximum(0.0, qs - qs0) * (1.0 - jnp.exp(-dts / cfg.tau_i2s))
    qs = qs - gaut
    qg = qg + gaut

    # pgacw: accretion of cloud water by graupel -> graupel (freezing)
    a, b = _TV["qg"]
    qden = jnp.maximum(6.0 * qg * den, 1.0e-20)
    gacw = cfg.c_pgacw * ql * dts * a * jnp.exp(b * jnp.log(qden)) * denfac
    gacw = jnp.where((qg > QCMIN) & (t < TICE), jnp.minimum(gacw, ql), 0.0)
    ql = ql - gacw
    qg = qg + gacw
    t = t + gacw * icpk

    # psacw: accretion of cloud water by snow (psacw:3318, acr2d form);
    # below freezing the rimed water freezes onto snow (latent heating),
    # above freezing it sheds to rain
    a, b = _TV["qs"]
    qden = jnp.maximum(6.0 * qs * den, 1.0e-20)
    sacw = cfg.c_psacw * ql * dts * a * jnp.exp(b * jnp.log(qden)) * denfac
    sacw = jnp.where(qs > QCMIN, jnp.minimum(sacw, ql), 0.0)
    ql = ql - sacw
    frz = t < TICE
    qs = qs + jnp.where(frz, sacw, 0.0)
    qr = qr + jnp.where(frz, 0.0, sacw)
    t = t + jnp.where(frz, sacw * icpk, 0.0)

    # pgaci: accretion of cloud ice by graupel (pgaci:3789)
    a, b = _TV["qg"]
    qden = jnp.maximum(6.0 * qg * den, 1.0e-20)
    gaci = cfg.c_pgaci * qi * dts * a * jnp.exp(b * jnp.log(qden)) * denfac
    gaci = jnp.where((qg > QCMIN) & (t < TICE), jnp.minimum(gaci, qi), 0.0)
    qi = qi - gaci
    qg = qg + gaci

    # pgacr: accretion (freezing) of rain by graupel below TICE (pgacr:3693)
    gacr = cfg.c_pgacr * qr * dts * a * jnp.exp(b * jnp.log(qden)) * denfac
    gacr = jnp.where((qg > QCMIN) & (t < TICE), jnp.minimum(gacr, qr), 0.0)
    gacr = jnp.minimum(gacr, jnp.maximum(0.0, (TICE - t) / icpk))
    qr = qr - gacr
    qg = qg + gacr
    t = t + gacr * icpk

    # pgfr: freezing of rain to graupel below t_wfr (pgfr:3651, tau form)
    gfr = jnp.where((qr > QCMIN) & (t < cfg.t_wfr),
                    jnp.minimum(qr * (1.0 - jnp.exp(-dts / cfg.tau_g2r)),
                                jnp.maximum(0.0, (cfg.t_wfr - t) / icpk)),
                    0.0)
    qr = qr - gfr
    qg = qg + gfr
    t = t + gfr * icpk

    # psdep / pssub: snow deposition/sublimation toward ice saturation
    # (psdep_pssub:3406 tau form)
    qsi, disdt = iqs(t, p_lay)
    dqi = qv - qsi
    cold = t < TICE
    sdep = jnp.where(cold & (dqi > 0.0) & (qs > QCMIN),
                     dqi / (1.0 + (lcpk + icpk) * disdt)
                     * (1.0 - jnp.exp(-dts / cfg.tau_i2s)), 0.0)
    ssub = jnp.where(cold & (dqi < 0.0) & (qs > QCMIN),
                     jnp.minimum(qs, -dqi / (1.0 + (lcpk + icpk) * disdt))
                     * (1.0 - jnp.exp(-dts / cfg.tau_i2s)), 0.0)
    sink = sdep - ssub
    qv = qv - sink
    qs = qs + sink
    t = t + sink * (lcpk + icpk)

    # psmlt / pgmlt: tau-based melting above freezing (psmlt:3362, :3447)
    smlt = jnp.where((qs > QCMIN) & (t > TICE),
                     jnp.minimum(qs, jnp.minimum(
                         dts / cfg.tau_smlt * qs, (t - TICE) / icpk)), 0.0)
    qs = qs - smlt
    qr = qr + smlt
    t = t - smlt * icpk
    gmlt = jnp.where((qg > QCMIN) & (t > TICE),
                     jnp.minimum(qg, jnp.minimum(
                         dts / cfg.tau_gmlt * qg, (t - TICE) / icpk)), 0.0)
    qg = qg - gmlt
    qr = qr + gmlt
    t = t - gmlt * icpk
    return t, qv, ql, qr, qi, qs, qg


def sat_adjust(t, qv, ql, qr, qi, qs, qg, p_lay, dts, cfg: MPConfig):
    """Condensation/evaporation + deposition/sublimation (pcond_pevap:4198,
    pidep_pisub:4457) with the complete-freezing floor."""
    cvm, lcpk, icpk = _heat_capacities(qv, ql, qr, qi, qs, qg, t)

    # vapor <-> liquid
    qsw, dwsdt = wqs(t, p_lay)
    dq = qv - qsw
    cond = jnp.where(dq > 0.0,
                     jnp.minimum(dq / (1.0 + lcpk * dwsdt),
                                 dq) * (1.0 - jnp.exp(-dts / cfg.tau_v2l)),
                     0.0)
    evap = jnp.where(dq < 0.0,
                     jnp.minimum(ql, -dq / (1.0 + lcpk * dwsdt))
                     * (1.0 - jnp.exp(-dts / cfg.tau_l2v)), 0.0)
    sink = cond - evap
    qv = qv - sink
    ql = ql + sink
    t = t + sink * lcpk

    # vapor <-> ice below freezing
    qsi, disdt = iqs(t, p_lay)
    dqi = qv - qsi
    cold = t < TICE
    dep = jnp.where(cold & (dqi > 0.0) & (t > cfg.t_sub),
                    dqi / (1.0 + (lcpk + icpk) * disdt), 0.0)
    sub = jnp.where(cold & (dqi < 0.0),
                    jnp.minimum(qi, -dqi / (1.0 + (lcpk + icpk) * disdt))
                    * (1.0 - jnp.exp(-dts / cfg.tau_l2v)), 0.0)
    sinki = dep - sub
    qv = qv - sinki
    qi = qi + sinki
    t = t + sinki * (lcpk + icpk)

    # complete freezing of cloud water below t_wfr - 8K (mp_fast:2049)
    t48 = cfg.t_wfr - 8.0
    frez = jnp.where((ql > QCMIN) & (t < t48),
                     jnp.minimum(ql, (t48 - t) / icpk), 0.0)
    ql = ql - frez
    qi = qi + frez
    t = t + frez * icpk
    return t, qv, ql, qr, qi, qs, qg


def cloud_fraction(qv, ql, qi, qs, p_lay, t, rh_inc=0.25):
    """GFDL area cloud fraction (cloud_fraction:4699, simplified RH-based
    closure with condensate trigger)."""
    qsw, _ = wqs(t, p_lay)
    qsi, _ = iqs(t, p_lay)
    qsat = jnp.where(t < TICE, qsi, qsw)
    rh = qv / jnp.maximum(qsat, 1.0e-12)
    qcond = ql + qi + qs
    base = jnp.clip((rh - (1.0 - rh_inc)) / rh_inc, 0.0, 1.0)
    return jnp.where(qcond > 1.0e-8, jnp.maximum(base, 0.05 + 0.95 * base),
                     0.0)


def gfdl_mp_driver(pt, delp, delz, q, dt, ptop, cfg: MPConfig = MPConfig(),
                   hydrostatic=False):
    """One physics step of microphysics (gfdl_mp_driver:607 / mpdrv:1167).

    pt: TEMPERATURE [6,K,y,x]; q: dict with the 6 categories (+ optional
    cld_amt). delz < 0 (heights) for the nonhydrostatic gas-law density;
    hydrostatic mode derives density from the hydrostatic relation.
    Returns (pt, q, diag dict with precipitation accumulations [kg/m^2])."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(pt)
    qv, ql, qr, qi, qs, qg = (q.get(k, z) for k in names)
    t = pt

    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    p_lay = delp / (peln[:, 1:] - peln[:, :-1])

    if hydrostatic or delz is None:
        tv = t * (1.0 + con.ZVIR * qv)
        dz = con.RDGAS * tv / con.GRAV * (peln[:, 1:] - peln[:, :-1])
    else:
        dz = -delz
    den = delp / (con.GRAV * dz)
    denfac = jnp.sqrt(RHO0 / jnp.maximum(den, 1e-10))

    dts = dt / cfg.ntimes
    rain = snow = icep = graup = 0.0
    for _ in range(cfg.ntimes):
        t, qr, qi, qs, qg, pcp = sedimentation(
            t, qv, ql, qr, qi, qs, qg, delp, dz, den, denfac, dts, cfg)
        rain = rain + pcp["qr"]
        icep = icep + pcp["qi"]
        snow = snow + pcp["qs"]
        graup = graup + pcp["qg"]
        t, qv, ql, qr = warm_rain(t, qv, ql, qr, qi, qs, qg, p_lay, den,
                                  denfac, dts, cfg)
        t, qv, ql, qr, qi, qs, qg = ice_cloud(
            t, qv, ql, qr, qi, qs, qg, p_lay, den, denfac, dts, cfg)
        t, qv, ql, qr, qi, qs, qg = sat_adjust(
            t, qv, ql, qr, qi, qs, qg, p_lay, dts, cfg)

    out = dict(q)
    for k, v in zip(names, (qv, ql, qr, qi, qs, qg)):
        out[k] = v
    if "cld_amt" in q:
        out["cld_amt"] = cloud_fraction(qv, ql, qi, qs, p_lay, t)
    diag = dict(rain=rain, ice=icep, snow=snow, graupel=graup)
    return t, out, diag


def fast_sat_adj(pt, delp, delz, q, dt, ptop, cfg: MPConfig = MPConfig(),
                 hydrostatic=False):
    """Inline fast saturation adjustment (fast_sat_adj:5726): melt/freeze +
    vapor<->liquid<->ice only — the dyn_core 'fast physics' hook."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(pt)
    qv, ql, qr, qi, qs, qg = (q.get(k, z) for k in names)
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    p_lay = delp / (peln[:, 1:] - peln[:, :-1])
    t, qv, ql, qr, qi, qs, qg = sat_adjust(pt, qv, ql, qr, qi, qs, qg,
                                           p_lay, dt, cfg)
    out = dict(q)
    for k, v in zip(names, (qv, ql, qr, qi, qs, qg)):
        if k in q:
            out[k] = v
    return t, out
