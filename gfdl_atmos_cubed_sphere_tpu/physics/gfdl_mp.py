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
    c_praci: float = 1.0       # cloud ice to rain accretion efficiency
    c_pracs: float = 1.0       # snow to rain accretion efficiency
    c_psacr: float = 1.0       # rain to snow accretion efficiency
    c_pgacs: float = 0.01      # snow to graupel accretion efficiency
    fi2s_fac: float = 1.0      # max sink fraction: cloud ice -> snow
    fs2g_fac: float = 1.0      # max sink fraction: snow -> graupel
    qs_mlt: float = 1.0e-6     # max cloud water from melted snow (kg/kg)
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
    # sedimentation variants + momentum transport (gfdl_mp.F90:276-305)
    sedflag: int = 1           # 1: implicit_fall (:5250); 2: explicit_fall
                               # (:5311, sub-stepped upstream)
    do_sedi_w: bool = True     # transport w by falling condensate (:5653)
    do_sedi_uv: bool = False   # transport horizontal momentum (:5622)
    # CCN / aerosol coupling (prog_ccn = Yi Ming's method, mpdrv:1377;
    # fixed land/ocean blend otherwise, :1388)
    prog_ccn: bool = False
    ccn_l: float = 270.0       # CCN over land (1/cm^3)
    ccn_o: float = 90.0        # CCN over ocean (1/cm^3)
    rthresh: float = 10.0e-6   # critical drop radius for autoconversion (m)
    use_ccn_praut: bool = True  # reference praut:3086 (ccn-aware) vs the
                                # simple ql0_max threshold scheme
    consv_checker: bool = False  # mpdrv:1365 mtetw energy/water audits
    # PSD parameters (gfdl_mp_nml:339-377 defaults)
    n0w_sig: float = 1.1
    n0i_sig: float = 1.3
    n0r_sig: float = 8.0
    n0s_sig: float = 3.0
    n0g_sig: float = 4.0
    n0w_exp: float = 41.0
    n0i_exp: float = 18.0
    n0r_exp: float = 6.0
    n0s_exp: float = 6.0
    n0g_exp: float = 6.0
    muw: float = 6.0
    mui: float = 3.35
    mur: float = 1.0
    mus: float = 1.0
    mug: float = 1.0
    alinw: float = 3.0e7
    alini: float = 7.0e2
    alinr: float = 842.0
    alins: float = 4.8
    aling: float = 1.0
    blinw: float = 2.0
    blini: float = 1.0
    blinr: float = 0.8
    blins: float = 0.25
    bling: float = 0.5
    rhow: float = 1.0e3
    rhoi: float = 9.17e2
    rhor: float = 1.0e3
    rhos: float = 1.0e2
    rhog: float = 4.0e2
    # ---- fast-physics (mp_fast) process options, gfdl_mp.F90 namelist
    # defaults at the cited lines --------------------------------------
    use_mp_fast: bool = True   # fast_sat_adj dispatches to the mp_fast
                               # process chain (:1995) vs the condensed
                               # sat_adjust
    use_subgrid_proc: bool = False  # mp_full's saturation stage runs the
                               # per-process subgrid_z_proc (:3989)
                               # instead of the condensed sat_adjust
    rh_adj: float = 0.0        # pinst instant-evap RH threshold
    fast_fr_mlt: bool = True   # freezing/melting in fast MP (:332)
    fast_dep_sub: bool = True  # deposition/sublimation in fast MP (:333)
    delay_cond_evap: bool = False  # cond/evap only on last step (:328)
    nconds: int = 1            # condensation subcycles (:191)
    do_evap_timescale: bool = True   # (:306)
    do_cond_timescale: bool = False  # (:307)
    rh_fac_evap: float = 10.0  # (:436)
    rh_fac_cond: float = 10.0  # (:437)
    use_rhc_cevap: bool = False  # (:289)
    rhc_cevap: float = 0.85    # (:461)
    do_wbf: bool = False       # Wegener-Bergeron-Findeisen (:315)
    tau_imlt: float = 1200.0   # cloud ice melting timescale (:394)
    tau_wbf: float = 300.0     # WBF timescale (:397)
    tau_r2g: float = 900.0     # rain freezing to graupel (:388)
    tau_l2r: float = 900.0     # cloud water -> rain autoconv (:390)
    ql_mlt: float = 2.0e-3     # max cloud water from melted ice (:411)
    qi0_max: float = 1.0e-4    # max cloud ice before autoconv (:415)
    qi_lim: float = 1.0        # ice generation limiter (:409)
    is_fac: float = 0.2        # ice sublimation temperature factor (:432)
    ss_fac: float = 0.2        # snow sublimation factor (:433)
    gs_fac: float = 0.2        # graupel sublimation factor (:434)
    inflag: int = 1            # ice nucleation scheme (:209)
    igflag: int = 3            # ice generation scheme (:216)
    tice_mlt: float = 273.16   # ice melting temperature (:380)

    @property
    def t_wfr(self):
        return self.t_min if self.do_warm_rain_mp else TICE - 40.0

    @property
    def coeffs(self):
        """Full Lin-scheme PSD coefficient pack (physics/mp_coeffs.py),
        cached per config."""
        c = _COEFF_CACHE.get(self)
        if c is None:
            from .mp_coeffs import build_coeffs
            c = build_coeffs(self)
            _COEFF_CACHE[self] = c
        return c


_COEFF_CACHE = {}


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


def wqs_den(t, den):
    """Saturation mixing ratio over water from DENSITY (gfdl_mp.F90 wqs:
    qsat = es / (rvgas * t * den)) + d(qs)/dT."""
    es = es_water(t)
    qs = es / (con.RVGAS * t * jnp.maximum(den, 1e-10))
    dqdt = qs * (DC_VAP + LV0 / t) / (con.RVGAS * t)
    return qs, dqdt


def iqs_den(t, den):
    """Saturation over ice from density (gfdl_mp.F90 iqs)."""
    es = es_ice(t)
    qs = es / (con.RVGAS * t * jnp.maximum(den, 1e-10))
    dqdt = qs * (D2_ICE + LI2 / t) / (con.RVGAS * t)
    return qs, dqdt


# ---------------------------------------------------------------------------
# Lin et al. (1983) accretion / ventilation kernels (gfdl_mp.F90:5490-5616)
# ---------------------------------------------------------------------------

def acr2d(qden, c, denfac, blin, mu):
    """Accretion of a suspended species by a falling species (acr2d:5490)."""
    return denfac * c * jnp.exp((2 + mu + blin) / (mu + 3)
                                * jnp.log(jnp.maximum(6.0 * qden, 1e-20)))


def acr3d(v1, v2, q1, q2, c, acco_k, acc1, acc2, den):
    """Accretion between two falling species (acr3d:5510, vdiffflag=1).
    q1 is collected by q2; acco_k = acco[:, k] (3 moments)."""
    lt1 = jnp.log(jnp.maximum(6.0 * q1 * den, 1e-20)) / (acc1 + 3)
    lt2 = jnp.log(jnp.maximum(6.0 * q2 * den, 1e-20)) / (acc2 + 3)
    vdiff = jnp.abs(v1 - v2)
    tmp = 0.0
    for i in (1, 2, 3):
        tmp = tmp + acco_k[i - 1] * jnp.exp((6 + acc1 - i) * lt1
                                            + (acc2 + i - 1) * lt2)
    return c * vdiff / den * tmp


def vent_coeff(qden, c1, c2, denfac, blin, mu):
    """Ventilation coefficient (vent_coeff:5552)."""
    lq = jnp.log(jnp.maximum(6.0 * qden, 1e-20))
    return c1 + c2 * jnp.exp((3 + 2 * mu + blin) / (mu + 3) / 2 * lq) \
        * jnp.sqrt(denfac) / jnp.exp((1 + mu) / (mu + 3) * lq)


def pmlt(tc, dq, qden, pxacw, pxacr, c4, den, denfac, blin, mu,
         lcpk, icpk, cvm):
    """Melt rate of snow/graupel incl. accreted-water enhancement
    (pmlt:5597)."""
    lq = jnp.log(jnp.maximum(6.0 * qden, 1e-20))
    return ((c4[0] / (icpk * cvm) * tc / den - c4[1] * lcpk / icpk * dq)
            * jnp.exp((1 + mu) / (mu + 3) * lq)
            * vent_coeff(qden, c4[2], c4[3], denfac, blin, mu)
            + C_LIQ / (icpk * cvm) * tc * (pxacw + pxacr))


def psub(t2, dq, qden, qsat, c5, den, denfac, blin, mu, cpk, cvm):
    """Sublimation/evaporation rate with ventilation (psub:5569)."""
    lq = jnp.log(jnp.maximum(6.0 * qden, 1e-20))
    return (c5[0] * t2 * dq * jnp.exp((1 + mu) / (mu + 3) * lq)
            * vent_coeff(qden, c5[1], c5[2], denfac, blin, mu)
            / (c5[3] * t2 + c5[4] * (cpk * cvm) ** 2 * qsat * den))


def _acco_k(co, k):
    """acco(:, k) column (1-based k, matching the reference pair table)."""
    return [co.acco[0][k - 1], co.acco[1][k - 1], co.acco[2][k - 1]]


def _mhc(qv, ql, qr, qi, qs, qg):
    """Moist heat capacity (gfdl_mp.F90 mhc)."""
    q_liq = ql + qr
    q_sol = qi + qs + qg
    return ((1.0 - (qv + q_liq + q_sol)) * CV_AIR + qv * CV_VAP
            + q_liq * C_LIQ + q_sol * C_ICE)


def _cal_mhc_lhc(t, qv, ql, qr, qi, qs, qg, t_wfr):
    """cvm, the conserved moist energy te8 = cvm*T - lv00*qv + li00*qsol,
    and the latent-heat factors (cal_mhc_lhc / update_qt)."""
    cvm = _mhc(qv, ql, qr, qi, qs, qg)
    # conserved moist internal energy: te8 = cvm*T + lv00*qv - li00*q_sol
    # (update_qt:6983 recovers T as (te8 - lv00*qv + li00*q_sol)/cvm)
    te8 = cvm * t + LV0 * qv - LI0 * (qi + qs + qg)
    lcpk = (LV0 + DC_VAP * t) / cvm
    icpk = (LI0 + DC_ICE * t) / cvm
    tcpk = (LI2 + (DC_VAP + DC_ICE) * t) / cvm
    tcp3 = lcpk + icpk * jnp.minimum(
        1.0, jnp.maximum(TICE - t, 0.0) / (TICE - t_wfr))
    return cvm, te8, lcpk, icpk, tcpk, tcp3


def _update_qt(st, dqv, dql, dqr, dqi, dqs, dqg):
    """Apply increments and recover T from the conserved te8 (update_qt:
    6951) — exact phase-change energy bookkeeping. st is a dict with keys
    t, qv, ql, qr, qi, qs, qg, te8, t_wfr; cvm/lcpk/... are refreshed."""
    st["qv"] = st["qv"] + dqv
    st["ql"] = st["ql"] + dql
    st["qr"] = st["qr"] + dqr
    st["qi"] = st["qi"] + dqi
    st["qs"] = st["qs"] + dqs
    st["qg"] = st["qg"] + dqg
    cvm = _mhc(st["qv"], st["ql"], st["qr"], st["qi"], st["qs"], st["qg"])
    t = (st["te8"] - LV0 * st["qv"]
         + LI0 * (st["qi"] + st["qs"] + st["qg"])) / cvm
    st["t"] = t
    st["cvm"] = cvm
    st["lcpk"] = (LV0 + DC_VAP * t) / cvm
    st["icpk"] = (LI0 + DC_ICE * t) / cvm
    st["tcpk"] = (LI2 + (DC_VAP + DC_ICE) * t) / cvm
    if "t_wfr" in st:       # refresh tcp3 too (update_qt:6987)
        st["tcp3"] = st["lcpk"] + st["icpk"] * jnp.minimum(
            1.0, jnp.maximum(TICE - t, 0.0) / (TICE - st["t_wfr"]))
    return st


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
    a, b = cfg.coeffs.tv[name]
    fac = {"qr": cfg.vr_fac, "qi": cfg.vi_fac, "qs": cfg.vs_fac,
           "qg": cfg.vg_fac, "qw": 1.0}[name]
    vmax = {"qr": cfg.vr_max, "qi": cfg.vi_max, "qs": cfg.vs_max,
            "qg": cfg.vg_max, "qw": 0.5}[name]
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
                              (qk[1:], dzk[1:], ddk[1:], ddk[:-1]),
                              unroll=8)
    qm = jnp.concatenate([qm0[None], qm_rest], axis=0) * dzk
    m1 = jnp.cumsum(qk - qm, axis=0)
    precip = m1[-1]
    q_new = jnp.moveaxis(qm, 0, 1) / dp
    return q_new, precip, jnp.moveaxis(m1, 0, 1)


def explicit_fall(q, vt, dz, dp, dts):
    """Sub-stepped explicit upstream sedimentation (explicit_fall:5311,
    sedflag=2). The CFL-limited substep count is PER COLUMN, as the
    reference computes it — nstep(i,j) = 1 + max_k(dts*vt/dz) — so the
    result is column-local and identical under any shard_map layout (a
    single global nstep would make sharded runs differ from
    single-device ones whenever shards see different CFL maxima). The
    lax.while_loop runs to the max nstep over the (local) batch;
    columns that finished earlier are masked to no-ops, so the extra
    trips do not change their values."""
    q0 = q * dp
    dd_full = dts * vt
    nstep_col = (1 + jnp.max(dd_full / dz, axis=1,
                             keepdims=True)).astype(jnp.int32)
    dd = dd_full / nstep_col.astype(q.dtype)
    frac = dd / dz

    def body(carry):
        n, qq = carry
        active = (n < nstep_col).astype(q.dtype)
        flux = qq * frac * active
        influx = jnp.concatenate(
            [jnp.zeros_like(flux[:, :1]), flux[:, :-1]], axis=1)
        return n + 1, qq - flux + influx

    _, qm = jax.lax.while_loop(lambda c: c[0] < jnp.max(nstep_col), body,
                               (jnp.int32(0), q0))
    m1 = jnp.cumsum(q0 - qm, axis=1)
    precip = m1[:, -1]
    return qm / dp, precip, m1


def sedi_uv(m1, dp, u, v):
    """Horizontal-momentum transport by falling condensate (sedi_uv:5622):
    u(k) = (dp(k) u(k) + m1(k-1) u(k-1)) / (dp(k) + m1(k-1)), sequential
    in k (uses the already-updated u(k-1)) -> lax.scan down the column."""
    uk = jnp.moveaxis(u, 1, 0)
    vk = jnp.moveaxis(v, 1, 0)
    dpk = jnp.moveaxis(dp, 1, 0)
    m1k = jnp.moveaxis(m1, 1, 0)

    def down(carry, x):
        u_up, v_up, m_up = carry
        uu, vv, dd, mm = x
        un = (dd * uu + m_up * u_up) / (dd + m_up)
        vn = (dd * vv + m_up * v_up) / (dd + m_up)
        return (un, vn, mm), (un, vn)

    (_, _, _), (u_rest, v_rest) = jax.lax.scan(
        down, (uk[0], vk[0], m1k[0]),
        (uk[1:], vk[1:], dpk[1:], m1k[1:]), unroll=8)
    u_new = jnp.concatenate([uk[:1], u_rest], axis=0)
    v_new = jnp.concatenate([vk[:1], v_rest], axis=0)
    return jnp.moveaxis(u_new, 0, 1), jnp.moveaxis(v_new, 0, 1)


def sedi_w(m1, w, vt, dm):
    """Vertical-momentum transport by falling condensate (sedi_w:5653):
    the falling mass m1(k-1) arrives carrying w(k-1) - vt(k-1); the top
    layer absorbs its own outgoing flux momentum. Sequential scan."""
    wk = jnp.moveaxis(w, 1, 0)
    vtk = jnp.moveaxis(vt, 1, 0)
    dmk = jnp.moveaxis(dm, 1, 0)
    m1k = jnp.moveaxis(m1, 1, 0)
    w0 = wk[0] + m1k[0] * vtk[0] / dmk[0]

    def down(carry, x):
        w_up, vt_up, m_up = carry
        ww, vv, dd, mm = x
        wn = (dd * ww + m_up * (w_up - vt_up) + mm * vv) / (dd + m_up)
        return (wn, vv, mm), wn

    _, w_rest = jax.lax.scan(down, (w0, vtk[0], m1k[0]),
                             (wk[1:], vtk[1:], dmk[1:], m1k[1:]),
                             unroll=8)
    w_new = jnp.concatenate([w0[None], w_rest], axis=0)
    return jnp.moveaxis(w_new, 0, 1)


def compute_ccn(den, cfg: MPConfig, hs=None, qnl=None):
    """Cloud-condensation-nuclei mixing number (mpdrv:1377-1393).

    prog_ccn: Boucher & Lohmann (1995) from the prognostic aerosol number
    tracer qnl (Yi Ming's method); else a land/ocean blend weighted by the
    surface geopotential |hs| (land proxy). Returns ccn in #/kg-like units
    (#/m^3 / den) matching the reference's in-column normalization."""
    if hs is None:
        land = 0.0
    else:
        land = jnp.minimum(1.0, jnp.abs(hs) / (10.0 * con.GRAV))
        if land.ndim == den.ndim - 1:       # [6,1,y,x] broadcast over K
            land = land[:, None] if land.ndim == 3 else land
    if cfg.prog_ccn and qnl is not None:
        qn = jnp.maximum(qnl * den * 1.0e9, 1.0e-20)
        nl = (land * 10.0 ** 2.24 * jnp.exp(0.257 * jnp.log(qn))
              + (1.0 - land) * 10.0 ** 2.06 * jnp.exp(0.48 * jnp.log(qn)))
        return jnp.maximum(10.0, nl) * 1.0e6 / den
    ccn0 = (cfg.ccn_l * land + cfg.ccn_o * (1.0 - land)) * 1.0e6
    return ccn0 / jnp.maximum(den, 1.0e-10)


def mte_column(t, qv, ql, qr, qi, qs, qg, dp, u=None, v=None, w=None):
    """Column moist total energy and total water (mte:6768 / mtetw:6809),
    both per unit area: te [J/m^2], tw [kg/m^2]. KE terms included when
    the winds are given."""
    q_liq = ql + qr
    q_sol = qi + qs + qg
    cvm = ((1.0 - (qv + q_liq + q_sol)) * CV_AIR + qv * CV_VAP
           + q_liq * C_LIQ + q_sol * C_ICE)
    te = cvm * t + LV0 * qv - LI0 * q_sol
    if u is not None:
        te = te + 0.5 * (u * u + v * v)
    if w is not None:
        te = te + 0.5 * w * w
    te_col = jnp.sum(RGRAV * te * dp, axis=1)
    tw_col = jnp.sum(RGRAV * (qv + q_liq + q_sol) * dp, axis=1)
    return te_col, tw_col


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
                  cfg: MPConfig, u=None, v=None, w=None):
    """Fall of rain/ice/snow/graupel (sedimentation:2156 /
    terminal_fall:2530). Per species: terminal velocity, fall (implicit
    or explicit per cfg.sedflag), then — exactly the reference's
    terminal_fall tail — momentum transport (sedi_uv:5622 / sedi_w:5653)
    and sedimentation heating."""
    precip = {}
    fall = implicit_fall if cfg.sedflag != 2 else explicit_fall
    if cfg.do_sedi_w and w is not None:
        # moist air mass from the PRE-sedimentation state, once for all
        # species (terminal_fall computes dm before any fall updates q)
        dm = dp * (1.0 + qv + ql + qr + qi + qs + qg)
    for name, qx in (("qi", qi), ("qs", qs), ("qg", qg), ("qr", qr)):
        vt = terminal_velocity(name, qx, den, denfac, cfg)
        qx_new, p, m1 = fall(qx, vt, dz, dp, dts)
        if name == "qr":
            qr = qx_new
        elif name == "qi":
            qi = qx_new
        elif name == "qs":
            qs = qx_new
        else:
            qg = qx_new
        if cfg.do_sedi_uv and u is not None:
            u, v = sedi_uv(m1, dp, u, v)
        if cfg.do_sedi_w and w is not None:
            w = sedi_w(m1, w, vt, dm)
        if cfg.do_sedi_heat:
            cw = C_LIQ if name == "qr" else C_ICE
            t = _sedi_heat(t, m1, dp, dz, cw, qv, ql, qr, qi, qs, qg)
        precip[name] = p * RGRAV            # kg/m^2
    return t, qr, qi, qs, qg, precip, u, v, w


def warm_rain(t, qv, ql, qr, qi, qs, qg, p_lay, den, denfac, dts,
              cfg: MPConfig, ccn=None):
    """praut + pracw + prevp (warm_rain:2792 children)."""
    co = cfg.coeffs
    if cfg.use_ccn_praut and ccn is not None:
        # -- CCN-aware autoconversion (praut:3072-3106, irain_f=1): the
        # critical mixing ratio qc = fac_rc*ccn comes from the critical
        # drop radius, the rate from the Manton-Cotton (aone) form with
        # c_praut = cpaut * (ccn*rhow)^(-1/3) ------------------------------
        fac_rc = (4.0 / 3.0) * math.pi * cfg.rhow * cfg.rthresh ** 3
        aone = 2.0 / 9.0 * (3.0 / 4.0) ** (4.0 / 3.0) / math.pi ** (1.0 / 3.0)
        visd = 1.717e-5                      # dyn. viscosity of air (:148)
        cpaut = cfg.c_paut * aone * con.GRAV / visd
        qc = fac_rc * ccn
        dq = ql - qc
        c_praut = cpaut * jnp.exp(
            (-1.0 / 3.0) * jnp.log(jnp.maximum(ccn * cfg.rhow, 1e-20)))
        rate = dts * c_praut * den * jnp.exp(
            (7.0 / 3.0) * jnp.log(jnp.maximum(ql, QCMIN)))
        sink = jnp.where((t > cfg.t_wfr) & (ql > QCMIN) & (dq > 0.0),
                         jnp.minimum(ql, jnp.minimum(dq, rate)), 0.0)
    else:
        # -- simple threshold autoconversion (no-subgrid fallback) ---------
        sink = cfg.c_paut * jnp.maximum(0.0, ql - cfg.ql0_max) \
            * (1.0 - jnp.exp(-dts / 300.0))
    ql = ql - sink
    qr = qr + sink

    # -- accretion of cloud water by rain (pracw:2950, exact acr2d form) ---
    fac = dts * acr2d(qr * den, co.cracw, denfac, co.blin["qr"], co.mu["qr"])
    acc = fac / (1.0 + fac) * ql
    acc = jnp.where((qr > QCMIN) & (ql > QCMIN) & (t > cfg.t_wfr), acc, 0.0)
    ql = ql - acc
    qr = qr + acc

    # -- rain evaporation with ventilation (prevp:2840 / psub:5569) --------
    cvm, lcpk, _ = _heat_capacities(qv, ql, qr, qi, qs, qg, t)
    qsat, dqdt = wqs_den(t, den)
    dq = qsat - qv
    fac_revp = 1.0 - math.exp(-dts / cfg.tau_revp) if cfg.tau_revp > 1e-6 \
        else 1.0
    t2 = t * t
    rate = psub(t2, dq, qr * den, qsat, co.crevp, den, denfac,
                co.blin["qr"], co.mu["qr"], lcpk, cvm)
    can_evap = (t > cfg.t_wfr) & (qr > QCMIN) & (dq > 0.0)
    evap = jnp.where(can_evap,
                     jnp.minimum(qr, jnp.minimum(
                         dts * fac_revp * rate,
                         dq / (1.0 + lcpk * dqdt))), 0.0)
    qr = qr - evap
    qv = qv + evap
    t = t - evap * lcpk
    return t, qv, ql, qr


def ice_cloud(t, qv, ql, qr, qi, qs, qg, p_lay, den, denfac, dts,
              cfg: MPConfig):
    """Ice-phase processes in the reference order (ice_cloud:3116): pimlt,
    pifr, psmlt (pmlt form with psacw/psacr/pracs melt enhancement), pgmlt
    (with pgacw/pgacr), psaci, psaut, pgaci, psacr + pgfr (Bigg freezing),
    pgacs, pgaut, pgacw + pgacr. Every transfer goes through the conserved
    moist-energy update (update_qt:6951), so each process is exactly
    energy-closed."""
    co = cfg.coeffs
    t_wfr = cfg.t_wfr

    st = dict(t=t, qv=qv, ql=ql, qr=qr, qi=qi, qs=qs, qg=qg)
    cvm, te8, lcpk, icpk, tcpk, tcp3 = _cal_mhc_lhc(
        t, qv, ql, qr, qi, qs, qg, t_wfr)
    st.update(cvm=cvm, te8=te8, lcpk=lcpk, icpk=icpk, tcpk=tcpk)

    def tvel(name, q):
        return terminal_velocity(name, q, den, denfac, cfg)

    zero = jnp.zeros_like(t)

    # ---- pimlt: cloud ice melting -> cloud water (up to ql_mlt) + rain ---
    melt = jnp.where((st["qi"] > QCMIN) & (st["t"] > TICE),
                     jnp.minimum(st["qi"], (st["t"] - TICE) / st["icpk"]),
                     0.0)
    to_l = jnp.minimum(melt, jnp.maximum(0.0, cfg.ql0_max - st["ql"]))
    st = _update_qt(st, zero, to_l, melt - to_l, -melt, zero, zero)

    # ---- pifr: homogeneous freezing of cloud water below t_wfr -----------
    frez = jnp.where((st["ql"] > QCMIN) & (st["t"] < t_wfr),
                     jnp.minimum(st["ql"], (t_wfr - st["t"]) / st["icpk"]),
                     0.0)
    st = _update_qt(st, zero, -frez, zero, frez, zero, zero)

    # ---- psmlt: snow melt with accreted water (psmlt:3362) ---------------
    vtw = tvel("qw", st["ql"])
    vtr = tvel("qr", st["qr"])
    vts = tvel("qs", st["qs"])
    vtg = tvel("qg", st["qg"])
    vti = tvel("qi", st["qi"])
    tc = st["t"] - TICE
    warm_s = (tc >= 0.0) & (st["qs"] > QCMIN)
    qden_s = st["qs"] * den
    fac = acr2d(qden_s, co.csacw, denfac, co.blin["qs"], co.mu["qs"])
    psacw = jnp.where(st["ql"] > QCMIN, fac / (1.0 + dts * fac) * st["ql"],
                      0.0)
    psacr = jnp.where(st["qr"] > QCMIN,
                      jnp.minimum(acr3d(vts, vtr, st["qr"], st["qs"],
                                        co.csacr, _acco_k(co, 2),
                                        co.acc[2], co.acc[3], den),
                                  st["qr"] / dts), 0.0)
    pracs = jnp.where(st["qr"] > QCMIN,
                      acr3d(vtr, vts, st["qs"], st["qr"], co.cracs,
                            _acco_k(co, 1), co.acc[0], co.acc[1], den), 0.0)
    qsi, _ = iqs_den(st["t"], den)
    dq = qsi - st["qv"]
    rate = jnp.maximum(0.0, pmlt(tc, dq, qden_s, psacw, psacr, co.csmlt,
                                 den, denfac, co.blin["qs"], co.mu["qs"],
                                 st["lcpk"], st["icpk"], st["cvm"]))
    sink = jnp.minimum(st["qs"],
                       jnp.minimum((rate + pracs) * dts,
                                   jnp.maximum(tc, 0.0) / st["icpk"]))
    sink = jnp.where(warm_s, sink, 0.0)
    tmp = jnp.minimum(sink, jnp.maximum(0.0, cfg.qs_mlt - st["ql"]))
    st = _update_qt(st, zero, tmp, sink - tmp, zero, -sink, zero)

    # ---- pgmlt: graupel melt (pgmlt:3447) --------------------------------
    tc = st["t"] - TICE
    warm_g = (tc >= 0.0) & (st["qg"] > QCMIN)
    qden_g = st["qg"] * den
    fac = acr2d(qden_g, co.cgacw, denfac, co.blin["qg"], co.mu["qg"])
    pgacw = jnp.where(st["ql"] > QCMIN, fac / (1.0 + dts * fac) * st["ql"],
                      0.0)
    pgacr = jnp.where(st["qr"] > QCMIN,
                      jnp.minimum(acr3d(vtg, vtr, st["qr"], st["qg"],
                                        co.cgacr, _acco_k(co, 3),
                                        co.acc[4], co.acc[5], den),
                                  st["qr"] / dts), 0.0)
    qsi, _ = iqs_den(st["t"], den)
    dq = qsi - st["qv"]
    rate = jnp.maximum(0.0, pmlt(tc, dq, qden_g, pgacw, pgacr, co.cgmlt,
                                 den, denfac, co.blin["qg"], co.mu["qg"],
                                 st["lcpk"], st["icpk"], st["cvm"]))
    sink = jnp.minimum(st["qg"],
                       jnp.minimum(rate * dts,
                                   jnp.maximum(tc, 0.0) / st["icpk"]))
    sink = jnp.where(warm_g, sink, 0.0)
    st = _update_qt(st, zero, zero, sink, zero, zero, -sink)

    # ---- psaci: snow accretion of cloud ice (psaci:3536) -----------------
    tc = st["t"] - TICE
    cold_i = (tc < 0.0) & (st["qi"] > QCMIN)
    fac = dts * acr2d(st["qs"] * den, co.csaci, denfac,
                      co.blin["qs"], co.mu["qs"])
    sink = jnp.where(cold_i & (st["qs"] > QCMIN),
                     fac / (1.0 + fac) * st["qi"], 0.0)
    sink = jnp.minimum(cfg.fi2s_fac * st["qi"], sink)
    st = _update_qt(st, zero, zero, zero, -sink, sink, zero)

    # ---- psaut: ice -> snow autoconversion (psaut:3599) ------------------
    tc = st["t"] - TICE
    qi0 = cfg.qi0_crt / jnp.maximum(den, 1e-10)
    fac_i2s = 1.0 - math.exp(-dts / cfg.tau_i2s)
    tmp = fac_i2s * jnp.exp(0.025 * tc)
    sink = jnp.where(tc < 0.0,
                     tmp * jnp.maximum(0.0, st["qi"] - qi0), 0.0)
    sink = jnp.minimum(cfg.fi2s_fac * st["qi"], sink)
    st = _update_qt(st, zero, zero, zero, -sink, sink, zero)

    # ---- pgaci: graupel accretion of cloud ice (pgaci:3665) --------------
    tc = st["t"] - TICE
    fac = dts * acr2d(st["qg"] * den, co.cgaci, denfac,
                      co.blin["qg"], co.mu["qg"])
    sink = jnp.where((tc < 0.0) & (st["qi"] > QCMIN) & (st["qg"] > QCMIN),
                     fac / (1.0 + fac) * st["qi"], 0.0)
    st = _update_qt(st, zero, zero, zero, -sink, zero, sink)

    # ---- psacr + pgfr: snow accretes rain; Bigg rain freezing ------------
    tc = st["t"] - TICE
    active = (tc < 0.0) & (st["qr"] > QCMIN)
    vtr = tvel("qr", st["qr"])
    vts = tvel("qs", st["qs"])
    psacr = jnp.where(st["qs"] > QCMIN,
                      dts * acr3d(vts, vtr, st["qr"], st["qs"], co.csacr, _acco_k(co, 2),
                                  co.acc[2], co.acc[3], den), 0.0)
    pgfr = (dts * co.cgfr[0] / jnp.maximum(den, 1e-10)
            * (jnp.exp(-co.cgfr[1] * tc) - 1.0)
            * jnp.exp((6 + co.mu["qr"]) / (co.mu["qr"] + 3)
                      * jnp.log(jnp.maximum(6.0 * st["qr"] * den, 1e-20))))
    tot = psacr + pgfr
    factor = jnp.where(active,
                       jnp.minimum(jnp.minimum(tot, st["qr"]),
                                   jnp.maximum(-tc, 0.0) / st["icpk"])
                       / jnp.maximum(tot, QCMIN), 0.0)
    psacr = factor * psacr
    pgfr = factor * pgfr
    sink = jnp.minimum(st["qr"], psacr + pgfr)
    st = _update_qt(st, zero, zero, -sink, zero, psacr, pgfr)

    # ---- pgacs: graupel accretion of snow (pgacs:3803) -------------------
    vts = tvel("qs", st["qs"])
    vtg = tvel("qg", st["qg"])
    sink = jnp.where((st["t"] < TICE) & (st["qs"] > QCMIN)
                     & (st["qg"] > QCMIN),
                     dts * acr3d(vtg, vts, st["qs"], st["qg"], co.cgacs, _acco_k(co, 4),
                                 co.acc[6], co.acc[7], den), 0.0)
    sink = jnp.minimum(cfg.fs2g_fac * st["qs"], sink)
    st = _update_qt(st, zero, zero, zero, zero, -sink, sink)

    # ---- pgaut: snow -> graupel autoconversion (pgaut:3854) --------------
    tc = st["t"] - TICE
    qs0 = cfg.qs0_crt / jnp.maximum(den, 1e-10)
    fac_s2g = 1.0 - math.exp(-dts / cfg.tau_i2s)
    sink = jnp.where(tc < 0.0,
                     fac_s2g * jnp.exp(0.09 * tc)
                     * jnp.maximum(0.0, st["qs"] - qs0), 0.0)
    sink = jnp.minimum(cfg.fs2g_fac * st["qs"], sink)
    st = _update_qt(st, zero, zero, zero, zero, -sink, sink)

    # ---- pgacw + pgacr: graupel accretes cloud water & rain (freezing) ---
    tc = st["t"] - TICE
    active = (tc < 0.0) & (st["qg"] > QCMIN)
    qden_g = st["qg"] * den
    fac = dts * acr2d(qden_g, co.cgacw, denfac, co.blin["qg"], co.mu["qg"])
    pgacw = jnp.where(st["ql"] > QCMIN, fac / (1.0 + fac) * st["ql"], 0.0)
    vtr = tvel("qr", st["qr"])
    vtg = tvel("qg", st["qg"])
    pgacr = jnp.where(st["qr"] > QCMIN,
                      jnp.minimum(dts * acr3d(vtg, vtr, st["qr"], st["qg"],
                                              co.cgacr, _acco_k(co, 3),
                                              co.acc[4], co.acc[5], den),
                                  st["qr"]), 0.0)
    tot = pgacr + pgacw
    factor = jnp.where(active,
                       jnp.minimum(tot, jnp.maximum(-tc, 0.0) / st["icpk"])
                       / jnp.maximum(tot, QCMIN), 0.0)
    pgacw = factor * pgacw
    pgacr = factor * pgacr
    st = _update_qt(st, zero, -pgacw, -pgacr, zero, zero, pgacw + pgacr)

    # ---- psdep / pssub: snow deposition/sublimation with ventilation -----
    cold = st["t"] < TICE
    qsi, disdt = iqs_den(st["t"], den)
    dqi = st["qv"] - qsi
    t2 = st["t"] * st["t"]
    rate = psub(t2, -dqi, st["qs"] * den, qsi, co.cssub, den, denfac,
                co.blin["qs"], co.mu["qs"], st["tcpk"], st["cvm"])
    # rate > 0 for subsaturation (sublimation); < 0 for deposition
    sub = jnp.where(cold & (dqi < 0.0) & (st["qs"] > QCMIN),
                    jnp.minimum(st["qs"], dts * rate), 0.0)
    dep = jnp.where(cold & (dqi > 0.0) & (st["qs"] > QCMIN),
                    jnp.minimum(-dts * rate,
                                dqi / (1.0 + st["tcpk"] * disdt)), 0.0)
    sink = dep - sub
    st = _update_qt(st, -sink, zero, zero, zero, sink, zero)

    return (st["t"], st["qv"], st["ql"], st["qr"], st["qi"], st["qs"],
            st["qg"])


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


def mp_full(t, qv, ql, qr, qi, qs, qg, delp, dz, den, denfac, dts, p_lay,
            cfg: MPConfig, ccn=None, ua=None, va=None, w=None):
    """Full microphysics loop (mp_full, gfdl_mp.F90:1892): per subcycle
    sedimentation -> warm rain -> ice cloud -> temperature-sensitive
    saturation processes (the subgrid_z_proc role), ntimes times.
    Returns (t, qv..qg, ua, va, w, rain, ice, snow, graupel)."""
    rain = snow = icep = graup = 0.0
    for _ in range(cfg.ntimes):
        t, qr, qi, qs, qg, pcp, ua_n, va_n, w = sedimentation(
            t, qv, ql, qr, qi, qs, qg, delp, dz, den, denfac, dts, cfg,
            u=ua, v=va, w=w)
        if ua_n is not None:
            ua, va = ua_n, va_n
        rain = rain + pcp["qr"]
        icep = icep + pcp["qi"]
        snow = snow + pcp["qs"]
        graup = graup + pcp["qg"]
        t, qv, ql, qr = warm_rain(t, qv, ql, qr, qi, qs, qg, p_lay, den,
                                  denfac, dts, cfg, ccn=ccn)
        t, qv, ql, qr, qi, qs, qg = ice_cloud(
            t, qv, ql, qr, qi, qs, qg, p_lay, den, denfac, dts, cfg)
        if cfg.use_subgrid_proc:
            t, qv, ql, qr, qi, qs, qg = subgrid_z_proc(
                t, qv, ql, qr, qi, qs, qg, delp, den, denfac, dts, cfg,
                rh_adj=cfg.rh_adj, ccn=ccn)
        else:
            t, qv, ql, qr, qi, qs, qg = sat_adjust(
                t, qv, ql, qr, qi, qs, qg, p_lay, dts, cfg)
    return (t, qv, ql, qr, qi, qs, qg, ua, va, w,
            rain, icep, snow, graup)


def gfdl_mp_driver(pt, delp, delz, q, dt, ptop, cfg: MPConfig = MPConfig(),
                   hydrostatic=False, w=None, ua=None, va=None, hs=None):
    """One physics step of microphysics (gfdl_mp_driver:607 / mpdrv:1167).

    pt: TEMPERATURE [6,K,y,x]; q: dict with the 6 categories (+ optional
    cld_amt, and optionally 'liq_aero' — the prognostic aerosol number
    tracer consumed by prog_ccn nucleation). delz < 0 (heights) for the
    nonhydrostatic gas-law density; hydrostatic mode derives density from
    the hydrostatic relation. w/ua/va: winds for sedimentation momentum
    transport (do_sedi_w/do_sedi_uv; returned in diag['w'/'ua'/'va']
    only when passed). hs: surface geopotential (land-proxy for CCN).
    Returns (pt, q, diag with precip accumulations rain/ice/snow/graupel
    [kg/m^2]; cfg.consv_checker adds mtetw-style te_beg/te_end/tw_beg/
    tw_end/te_err/tw_err audits, mpdrv:1365/:1570)."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(pt)
    qv, ql, qr, qi, qs, qg = (q.get(k, z) for k in names)
    t = pt
    if hydrostatic:
        w = None

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
    ccn = compute_ccn(den, cfg, hs=hs, qnl=q.get("liq_aero"))

    if cfg.consv_checker:
        te_beg, tw_beg = mte_column(t, qv, ql, qr, qi, qs, qg, delp,
                                    u=ua, v=va, w=w)
    w_in = w
    ua_in, va_in = ua, va

    dts = dt / cfg.ntimes
    (t, qv, ql, qr, qi, qs, qg, ua, va, w,
     rain, icep, snow, graup) = mp_full(
        t, qv, ql, qr, qi, qs, qg, delp, dz, den, denfac, dts, p_lay,
        cfg, ccn=ccn, ua=ua, va=va, w=w)

    # kinetic energy lost by sedimentation momentum transport goes to heat
    # (mpdrv:1550-1566: both the sedi_uv term 0.5*(ua^2+va^2 - u^2-v^2)/c8
    # and the sedi_w term 0.5*(wa^2 - w^2)/c8)
    ke_heat = None
    if w is not None and w_in is not None and cfg.do_sedi_w:
        ke_heat = 0.5 * (w_in * w_in - w * w)
    if cfg.do_sedi_uv and ua is not None and ua_in is not None:
        duv = 0.5 * (ua_in * ua_in + va_in * va_in - ua * ua - va * va)
        ke_heat = duv if ke_heat is None else ke_heat + duv
    if ke_heat is not None:
        cvm, _, _ = _heat_capacities(qv, ql, qr, qi, qs, qg, t)
        t = t + ke_heat / cvm

    out = dict(q)
    for k, v in zip(names, (qv, ql, qr, qi, qs, qg)):
        out[k] = v
    if "cld_amt" in q:
        out["cld_amt"] = cloud_fraction(qv, ql, qi, qs, p_lay, t)
    diag = dict(rain=rain, ice=icep, snow=snow, graupel=graup)
    if w is not None and w_in is not None:
        diag["w"] = w
    if cfg.do_sedi_uv and ua is not None:
        diag["ua"], diag["va"] = ua, va
    if cfg.consv_checker:
        te_end, tw_end = mte_column(t, qv, ql, qr, qi, qs, qg, delp,
                                    u=ua, v=va, w=w)
        surf_w = rain + icep + snow + graup       # kg/m^2 left the column
        diag.update(
            te_beg=te_beg, te_end=te_end, tw_beg=tw_beg, tw_end=tw_end,
            tw_err=(tw_end + surf_w - tw_beg) / jnp.maximum(tw_beg, 1e-30),
            te_err=(te_end - te_beg) / jnp.maximum(jnp.abs(te_beg), 1e-30))
    return t, out, diag


def fast_sat_adj(pt, delp, delz, q, dt, ptop, cfg: MPConfig = MPConfig(),
                 hydrostatic=False, last_step=True):
    """Inline fast physics (the dyn_core 'fast physics' hook,
    fast_phys.F90:58): with cfg.use_mp_fast (default), runs the full
    mp_fast process chain (gfdl_mp.F90:1995); otherwise the condensed
    melt/freeze + vapor<->liquid<->ice sat_adjust."""
    names = ("sphum", "liq_wat", "rainwat", "ice_wat", "snowwat", "graupel")
    z = jnp.zeros_like(pt)
    qv, ql, qr, qi, qs, qg = (q.get(k, z) for k in names)
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    p_lay = delp / (peln[:, 1:] - peln[:, :-1])
    if cfg.use_mp_fast:
        if hydrostatic or delz is None:
            tv = pt * (1.0 + con.ZVIR * qv)
            dz = con.RDGAS * tv / con.GRAV * (peln[:, 1:] - peln[:, :-1])
        else:
            dz = -delz
        den = delp / (con.GRAV * dz)
        denfac = jnp.sqrt(RHO0 / jnp.maximum(den, 1e-10))
        t, qv, ql, qr, qi, qs, qg = mp_fast(
            pt, qv, ql, qr, qi, qs, qg, dt, delp, den, denfac, cfg,
            last_step=last_step)
    else:
        t, qv, ql, qr, qi, qs, qg = sat_adjust(pt, qv, ql, qr, qi, qs, qg,
                                               p_lay, dt, cfg)
    out = dict(q)
    for k, v in zip(names, (qv, ql, qr, qi, qs, qg)):
        if k in q:
            out[k] = v
    return t, out


# ---------------------------------------------------------------------------
# Fast-physics process set: the mp_fast chain (gfdl_mp.F90 mp_fast:1995)
# run inside the acoustic loop from the fast_phys hook. Each process is a
# direct vectorized transcription of its Fortran subroutine operating on a
# state dict st = {t, qv, ql, qr, qi, qs, qg, te8, cvm, lcpk, icpk, tcpk,
# tcp3, t_wfr} with masked sinks and the conserved-energy update_qt
# bookkeeping (_update_qt). Thermodynamic constants follow this module's
# consistent constant-pressure family (LV0/DC_VAP) — see _cal_mhc_lhc.
# ---------------------------------------------------------------------------

DT_FR = 8.0       # t_wfr - dt_fr = min temp liquid water exists (:181)
TCOND = 2.40e-2   # thermal conductivity of air at 0 C (:151)
VDIFU = 2.25e-5   # vapor diffusivity at 0 C (:150)


def _st_init(t, qv, ql, qr, qi, qs, qg, t_wfr):
    cvm, te8, lcpk, icpk, tcpk, tcp3 = _cal_mhc_lhc(
        t, qv, ql, qr, qi, qs, qg, t_wfr)
    return dict(t=t, qv=qv, ql=ql, qr=qr, qi=qi, qs=qs, qg=qg, te8=te8,
                cvm=cvm, lcpk=lcpk, icpk=icpk, tcpk=tcpk, tcp3=tcp3,
                t_wfr=t_wfr)


def pimlt(st, dts, cfg: MPConfig):
    """Cloud ice melting -> cloud water + rain (pimlt:3244)."""
    fac = 1.0 - math.exp(-dts / cfg.tau_imlt)
    tc = st["t"] - cfg.tice_mlt
    act = (tc > 0.0) & (st["qi"] > QCMIN)
    sink = jnp.minimum(st["qi"], fac * tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    tmp = jnp.minimum(sink, jnp.maximum(cfg.ql_mlt - st["ql"], 0.0))
    return _update_qt(st, 0.0, tmp, sink - tmp, -sink, 0.0, 0.0)


def pcomp(st, cfg: MPConfig):
    """Complete freezing of cloud water below t_wfr (pcomp:4273)."""
    tc = st["t_wfr"] - st["t"]
    act = (tc > 0.0) & (st["ql"] > QCMIN)
    sink = jnp.minimum(jnp.minimum(st["ql"], st["ql"] * tc / DT_FR),
                       tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    return _update_qt(st, 0.0, -sink, 0.0, sink, 0.0, 0.0)


def pcond_pevap(st, dts, den, cfg: MPConfig):
    """Cloud water condensation / evaporation (pcond_pevap:4198)."""
    fac_l2v = 1.0 - math.exp(-dts / cfg.tau_l2v)
    fac_v2l = 1.0 - math.exp(-dts / cfg.tau_v2l)
    qsw, dqdt = wqs_den(st["t"], den)
    qpz = st["qv"] + st["ql"] + st["qi"]
    rh_tem = qpz / qsw
    dq = qsw - st["qv"]
    denom = 1.0 + st["tcp3"] * dqdt
    # evaporation branch (dq > 0): ql -> qv
    if cfg.do_evap_timescale:
        factor_e = jnp.minimum(1.0, fac_l2v * (cfg.rh_fac_evap * dq / qsw))
    else:
        factor_e = 1.0
    sink_e = jnp.minimum(st["ql"], factor_e * dq / denom)
    if cfg.use_rhc_cevap:
        sink_e = jnp.where(rh_tem >= cfg.rhc_cevap, 0.0, sink_e)
    # condensation branch (dq <= 0): qv -> ql
    if cfg.do_cond_timescale:
        factor_c = jnp.minimum(1.0, fac_v2l
                               * (cfg.rh_fac_cond * (-dq) / qsw))
    else:
        factor_c = 1.0
    sink_c = -jnp.minimum(st["qv"], factor_c * (-dq) / denom)
    sink = jnp.where(dq > 0.0, sink_e, sink_c)
    return _update_qt(st, sink, -sink, 0.0, 0.0, 0.0, 0.0)


def pifr(st, den, cfg: MPConfig):
    """Homogeneous cloud water freezing -> ice + snow (pifr:3303)."""
    tc = st["t_wfr"] - st["t"]
    act = (tc > 0.0) & (st["ql"] > QCMIN)
    sink = jnp.minimum(jnp.minimum(st["ql"], st["ql"] * tc / DT_FR),
                       tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    qim = cfg.qi0_crt / den
    tmp = jnp.minimum(sink, jnp.maximum(qim - st["qi"], 0.0))
    return _update_qt(st, 0.0, -sink, 0.0, tmp, sink - tmp, 0.0)


def pwbf(st, dts, den, cfg: MPConfig):
    """Wegener-Bergeron-Findeisen process (pwbf:4329)."""
    if not cfg.do_wbf:
        return st
    fac = 1.0 - math.exp(-dts / cfg.tau_wbf)
    tc = TICE - st["t"]
    qsw, _ = wqs_den(st["t"], den)
    qsi, _ = iqs_den(st["t"], den)
    act = ((tc > 0.0) & (st["ql"] > QCMIN) & (st["qi"] > QCMIN)
           & (st["qv"] > qsi) & (st["qv"] < qsw))
    sink = jnp.minimum(fac * st["ql"], tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    qim = cfg.qi0_crt / den
    tmp = jnp.minimum(sink, jnp.maximum(qim - st["qi"], 0.0))
    return _update_qt(st, 0.0, -sink, 0.0, tmp, sink - tmp, 0.0)


def pbigg(st, dts, den, ccn, cfg: MPConfig):
    """Bigg (1953) heterogeneous freezing of cloud water (pbigg:4395)."""
    tc = TICE - st["t"]
    act = (tc > 0.0) & (st["ql"] > QCMIN)
    ccn_ = jnp.maximum(ccn, 1.0e-8)
    sink = (100.0 / (cfg.rhow * ccn_) * dts
            * (jnp.exp(0.66 * jnp.minimum(tc, 80.0)) - 1.0)
            * st["ql"] ** 2)
    sink = jnp.minimum(jnp.minimum(st["ql"], sink), tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    return _update_qt(st, 0.0, -sink, 0.0, sink, 0.0, 0.0)


def pgfr_simp(st, dts, cfg: MPConfig):
    """Rain freezing -> graupel, simple version (pgfr_simp:5814)."""
    fac = 1.0 - math.exp(-dts / cfg.tau_r2g)
    tc = st["t"] - TICE
    act = (tc < 0.0) & (st["qr"] > QCMIN)
    sink = (-tc * 0.025) ** 2 * st["qr"]
    sink = jnp.minimum(jnp.minimum(st["qr"], sink),
                       -fac * tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    return _update_qt(st, 0.0, 0.0, -sink, 0.0, 0.0, sink)


def psmlt_simp(st, dts, cfg: MPConfig):
    """Snow melting -> cloud water + rain, simple version
    (psmlt_simp:5872)."""
    fac = 1.0 - math.exp(-dts / cfg.tau_smlt)
    tc = st["t"] - TICE
    act = (tc >= 0.0) & (st["qs"] > QCMIN)
    sink = (tc * 0.1) ** 2 * st["qs"]
    sink = jnp.minimum(jnp.minimum(st["qs"], sink),
                       fac * tc / st["icpk"])
    sink = jnp.where(act, sink, 0.0)
    tmp = jnp.minimum(sink, jnp.maximum(cfg.qs_mlt - st["ql"], 0.0))
    return _update_qt(st, 0.0, tmp, sink - tmp, 0.0, -sink, 0.0)


def praut_simp(st, dts, cfg: MPConfig):
    """Cloud water -> rain autoconversion, simple version
    (praut_simp:5931). Pure liquid-phase transfer (update_qq — no T
    change since ql and qr share C_LIQ)."""
    fac = 1.0 - math.exp(-dts / cfg.tau_l2r)
    tc = st["t"] - st["t_wfr"]
    act = (tc > 0.0) & (st["ql"] > cfg.ql0_max)
    sink = jnp.where(act, fac * (st["ql"] - cfg.ql0_max), 0.0)
    return _update_qt(st, 0.0, -sink, sink, 0.0, 0.0, 0.0)


def _ice_nuclei(st, den, qsi, cfg: MPConfig):
    """Ice-nuclei number per inflag (pidep_pisub:4502-4512)."""
    qi_den = jnp.maximum(st["qi"] * den, 1.0e-20)
    if cfg.inflag == 1:
        return 5.38e7 * jnp.exp(0.75 * jnp.log(qi_den))
    if cfg.inflag == 2:
        return jnp.exp(-2.80 + 0.262 * (TICE - st["t"])) * 1000.0
    if cfg.inflag == 3:
        return jnp.exp(-0.639 + 12.96 * (st["qv"] / qsi - 1.0)) * 1000.0
    if cfg.inflag == 4:
        return 5.0e-3 * jnp.exp(0.304 * (TICE - st["t"])) * 1000.0
    return 1.0e-5 * jnp.exp(0.5 * (TICE - st["t"])) * 1000.0


def pidep_pisub(st, dts, den, cin, cfg: MPConfig):
    """Cloud ice deposition / sublimation (pidep_pisub:4457)."""
    cold = st["t"] < TICE
    qsi, dqdt = iqs_den(st["t"], den)
    dq = st["qv"] - qsi
    tmp = dq / (1.0 + st["tcpk"] * dqdt)
    cin_ = _ice_nuclei(st, den, qsi, cfg) if cin is None else cin
    has_ice = st["qi"] > QCMIN
    pidep = (dts * dq * 4.0 * 11.9
             * jnp.exp(0.5 * jnp.log(
                 jnp.maximum(st["qi"] * den * cin_, 1.0e-30)))
             / (qsi * den * (st["tcpk"] * st["cvm"]) ** 2
                / (TCOND * con.RVGAS * st["t"] ** 2) + 1.0 / VDIFU))
    pidep = jnp.where(has_ice, pidep, 0.0)
    # deposition branch (dq > 0): limited by generation + heating
    tc = TICE - st["t"]
    qi_gen = 4.92e-11 * jnp.exp(1.33 * jnp.log(
        1.0e3 * jnp.exp(0.1 * jnp.maximum(tc, 0.0))))
    if cfg.igflag == 1:
        qi_crt = qi_gen / den
    elif cfg.igflag == 2:
        qi_crt = qi_gen * jnp.minimum(cfg.qi_lim, 0.1 * tc) / den
    elif cfg.igflag == 3:
        qi_crt = 1.82e-6 * jnp.minimum(cfg.qi_lim, 0.1 * tc) / den
    else:
        qi_crt = (jnp.maximum(qi_gen, 1.82e-6)
                  * jnp.minimum(cfg.qi_lim, 0.1 * tc) / den)
    sink_dep = jnp.minimum(jnp.minimum(
        tmp, jnp.maximum(qi_crt - st["qi"], pidep)), tc / st["tcpk"])
    # sublimation branch (dq <= 0)
    pisub = pidep * jnp.minimum(
        1.0, jnp.maximum(st["t"] - cfg.t_sub, 0.0) * cfg.is_fac)
    sink_sub = jnp.maximum(jnp.maximum(pisub, tmp), -st["qi"])
    sink = jnp.where(dq > 0.0, sink_dep, sink_sub)
    sink = jnp.where(cold, sink, 0.0)
    return _update_qt(st, -sink, 0.0, 0.0, sink, 0.0, 0.0)


def _dep_sub_species(st, dts, den, denfac, cfg, species, c5, blin, mu,
                     fac):
    """Shared psdep_pssub (:4555) / pgdep_pgsub (:4624) body."""
    qx = st[species]
    act = qx > QCMIN
    qsi, dqdt = iqs_den(st["t"], den)
    qden = qx * den
    t2 = st["t"] * st["t"]
    dq = qsi - st["qv"]
    pxsub = dts * psub(t2, dq, qden, qsi, c5, den, denfac, blin, mu,
                       st["tcpk"], st["cvm"])
    dq2 = dq / (1.0 + st["tcpk"] * dqdt)
    # sublimation (pxsub > 0): qx -> qv, temperature-gated
    sink_sub = jnp.minimum(
        pxsub * jnp.minimum(1.0, jnp.maximum(st["t"] - cfg.t_sub, 0.0)
                            * fac), qx)
    # deposition (pxsub <= 0) only below freezing
    sink_dep = jnp.where(
        st["t"] <= TICE,
        jnp.maximum(jnp.maximum(pxsub, dq2),
                    (st["t"] - TICE) / st["tcpk"]), 0.0)
    sink = jnp.where(pxsub > 0.0, sink_sub, sink_dep)
    sink = jnp.where(act, sink, 0.0)
    dqs = -sink if species == "qs" else 0.0
    dqg = -sink if species == "qg" else 0.0
    return _update_qt(st, sink, 0.0, 0.0, 0.0, dqs, dqg)


def psdep_pssub(st, dts, den, denfac, cfg: MPConfig):
    """Snow deposition / sublimation (psdep_pssub:4555)."""
    return _dep_sub_species(st, dts, den, denfac, cfg, "qs",
                            cfg.coeffs.cssub, cfg.blins, cfg.mus,
                            cfg.ss_fac)


def pgdep_pgsub(st, dts, den, denfac, cfg: MPConfig):
    """Graupel deposition / sublimation (pgdep_pgsub:4624)."""
    return _dep_sub_species(st, dts, den, denfac, cfg, "qg",
                            cfg.coeffs.cgsub, cfg.bling, cfg.mug,
                            cfg.gs_fac)


def psaut_simp(st, dts, den, cfg: MPConfig):
    """Cloud ice -> snow autoconversion, simple version
    (psaut_simp:5983). Ice-phase transfer, no T change."""
    fac = 1.0 - math.exp(-dts / cfg.tau_i2s)
    tc = st["t"] - TICE
    qim = cfg.qi0_max / den
    act = (tc < 0.0) & (st["qi"] > qim)
    sink = jnp.where(act, fac * (st["qi"] - qim), 0.0)
    return _update_qt(st, 0.0, 0.0, 0.0, -sink, sink, 0.0)


def mp_fast(t, qv, ql, qr, qi, qs, qg, dtm, dp, den, denfac,
            cfg: MPConfig, ccn=None, cin=None, last_step=True):
    """Fast microphysics loop (mp_fast, gfdl_mp.F90:1995): the simplified
    phase-change process chain run each acoustic/remap step — melting,
    complete freezing, condensation/evaporation, homogeneous + WBF +
    Bigg freezing, rain freezing, snow melting, warm/ice
    autoconversions, and the three deposition/sublimation processes.
    Returns (t, qv, ql, qr, qi, qs, qg)."""
    if ccn is None:
        ccn = jnp.full_like(t, 1.0e8 / 1.2)   # ~100/cm^3 / den fallback
    st = _st_init(t, qv, ql, qr, qi, qs, qg, cfg.t_wfr)
    fr_mlt = (not cfg.do_warm_rain_mp) and cfg.fast_fr_mlt
    if fr_mlt:
        st = pimlt(st, dtm, cfg)
        st = pcomp(st, cfg)
    if (not cfg.delay_cond_evap) or last_step:
        for _ in range(cfg.nconds):
            st = pcond_pevap(st, dtm, den, cfg)
    if fr_mlt:
        st = pifr(st, den, cfg)
        st = pwbf(st, dtm, den, cfg)
        st = pbigg(st, dtm, den, ccn, cfg)
        st = pgfr_simp(st, dtm, cfg)
        st = psmlt_simp(st, dtm, cfg)
    st = praut_simp(st, dtm, cfg)
    if (not cfg.do_warm_rain_mp) and cfg.fast_dep_sub:
        st = pidep_pisub(st, dtm, den, cin, cfg)
        st = psaut_simp(st, dtm, den, cfg)
        st = psdep_pssub(st, dtm, den, denfac, cfg)
        st = pgdep_pgsub(st, dtm, den, denfac, cfg)
    return (st["t"], st["qv"], st["ql"], st["qr"], st["qi"], st["qs"],
            st["qg"])


def pinst(st, den, rh_adj, cfg: MPConfig):
    """Instant processes (pinst:4113): deposit all vapor to ice below
    t_min; instantly evaporate/sublimate all clouds when the clear-sky
    RH (from the te8-implied temperature with all condensate removed)
    is below rh_adj."""
    # super-cold instant deposition
    sink = jnp.where(st["t"] < cfg.t_min,
                     jnp.maximum(st["qv"] - QCMIN, 0.0), 0.0)
    st = _update_qt(st, -sink, 0.0, 0.0, sink, 0.0, 0.0)
    # instant evaporation below rh_adj
    qpz = st["qv"] + st["ql"] + st["qi"]
    tin = (st["te8"] - LV0 * qpz + LI0 * (st["qs"] + st["qg"])) / _mhc(
        qpz, st["qr"], 0.0, 0.0, st["qs"], st["qg"])
    qsi, _ = iqs_den(tin, den)
    act = (tin > cfg.t_sub + 6.0) & (qpz / qsi < rh_adj)
    sink_l = jnp.where(act, st["ql"], 0.0)
    sink_i = jnp.where(act, st["qi"], 0.0)
    return _update_qt(st, sink_l + sink_i, -sink_l, 0.0, -sink_i, 0.0,
                      0.0)


def subgrid_z_proc(t, qv, ql, qr, qi, qs, qg, dp, den, denfac, dts,
                   cfg: MPConfig, rh_adj=0.0, ccn=None, cin=None,
                   last_step=True):
    """Temperature-sensitive high-vertical-resolution saturation
    processes (subgrid_z_proc:3989) — the per-process full-path
    counterpart of the condensed sat_adjust: cal_mhc_lhc -> pinst ->
    pcond_pevap (x nconds) -> pcomp -> pwbf -> pbigg -> pidep_pisub ->
    psdep_pssub -> pgdep_pgsub, each on the conserved-te8 update_qt
    bookkeeping. Opt into it from mp_full via cfg.use_subgrid_proc."""
    if ccn is None:
        ccn = jnp.full_like(t, 1.0e8 / 1.2)
    st = _st_init(t, qv, ql, qr, qi, qs, qg, cfg.t_wfr)
    st = pinst(st, den, rh_adj, cfg)
    if (not cfg.delay_cond_evap) or last_step:
        for _ in range(cfg.nconds):
            st = pcond_pevap(st, dts, den, cfg)
    if not cfg.do_warm_rain_mp:
        st = pcomp(st, cfg)
        st = pwbf(st, dts, den, cfg)
        st = pbigg(st, dts, den, ccn, cfg)
        st = pidep_pisub(st, dts, den, cin, cfg)
        st = psdep_pssub(st, dts, den, denfac, cfg)
        st = pgdep_pgsub(st, dts, den, denfac, cfg)
    return (st["t"], st["qv"], st["ql"], st["qr"], st["qi"], st["qs"],
            st["qg"])
