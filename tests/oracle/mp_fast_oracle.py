"""Loop-literal NumPy oracle for the mp_fast process chain.

Transcribed statement-for-statement from /root/reference/model/gfdl_mp.F90:
cal_mhc_lhc:6884, update_qt:6951, pimlt:3244, pcomp:4273,
pcond_pevap:4198, psmlt_simp:5872, praut_simp:5931, pgfr_simp:5814.

The latent-heat constant family (lv00/d1_vap, li00/d1_ice, li20) is taken
as ARGUMENTS so the parity test can pin the vectorized JAX processes
(which use the module's consistent constant-pressure LV0/DC_VAP family)
while the process STRUCTURE — masks, min-chains, sink ordering, and the
conserved-te8 update — is transcribed exactly.  Deliberately slow scalar
code; its only job is 1e-12 f64 parity."""
import numpy as np


def dim(a, b):
    return max(a - b, 0.0)


class Thermo:
    """lv00/li00/li20 + d1_vap/d1_ice + heat capacities (mhc:6860)."""

    def __init__(self, lv00, li00, d1_vap, d1_ice, cv_air, cv_vap,
                 c_liq, c_ice, tice, t_wfr):
        self.lv00, self.li00 = lv00, li00
        self.li20 = lv00 + li00
        self.d1_vap, self.d1_ice = d1_vap, d1_ice
        self.cv_air, self.cv_vap = cv_air, cv_vap
        self.c_liq, self.c_ice = c_liq, c_ice
        self.tice, self.t_wfr = tice, t_wfr

    def mhc(self, qv, q_liq, q_sol):
        return ((1.0 - (qv + q_liq + q_sol)) * self.cv_air
                + qv * self.cv_vap + q_liq * self.c_liq
                + q_sol * self.c_ice)


def cal_mhc_lhc_ref(th, qv, ql, qr, qi, qs, qg, tz):
    """cal_mhc_lhc:6884 for one column: returns (cvm, te8, lcpk, icpk,
    tcpk, tcp3) lists."""
    km = len(qv)
    cvm = np.zeros(km)
    te8 = np.zeros(km)
    lcpk = np.zeros(km)
    icpk = np.zeros(km)
    tcpk = np.zeros(km)
    tcp3 = np.zeros(km)
    for k in range(km):
        q_liq = ql[k] + qr[k]
        q_sol = qi[k] + qs[k] + qg[k]
        cvm[k] = th.mhc(qv[k], q_liq, q_sol)
        te8[k] = cvm[k] * tz[k] + th.lv00 * qv[k] - th.li00 * q_sol
        lcpk[k] = (th.lv00 + th.d1_vap * tz[k]) / cvm[k]
        icpk[k] = (th.li00 + th.d1_ice * tz[k]) / cvm[k]
        tcpk[k] = (th.li20 + (th.d1_vap + th.d1_ice) * tz[k]) / cvm[k]
        tcp3[k] = lcpk[k] + icpk[k] * min(
            1.0, dim(th.tice, tz[k]) / (th.tice - th.t_wfr))
    return cvm, te8, lcpk, icpk, tcpk, tcp3


def update_qt_ref(th, st, k, dqv, dql, dqr, dqi, dqs, dqg):
    """update_qt:6951 at level k of the state dict of numpy columns."""
    st["qv"][k] += dqv
    st["ql"][k] += dql
    st["qr"][k] += dqr
    st["qi"][k] += dqi
    st["qs"][k] += dqs
    st["qg"][k] += dqg
    q_liq = st["ql"][k] + st["qr"][k]
    q_sol = st["qi"][k] + st["qs"][k] + st["qg"][k]
    cvm = th.mhc(st["qv"][k], q_liq, q_sol)
    tk = (st["te8"][k] - th.lv00 * st["qv"][k] + th.li00 * q_sol) / cvm
    st["cvm"][k] = cvm
    st["tz"][k] = tk
    st["lcpk"][k] = (th.lv00 + th.d1_vap * tk) / cvm
    st["icpk"][k] = (th.li00 + th.d1_ice * tk) / cvm
    st["tcpk"][k] = (th.li20 + (th.d1_vap + th.d1_ice) * tk) / cvm
    st["tcp3"][k] = st["lcpk"][k] + st["icpk"][k] * min(
        1.0, dim(th.tice, tk) / (th.tice - th.t_wfr))


def make_state(th, qv, ql, qr, qi, qs, qg, tz):
    cvm, te8, lcpk, icpk, tcpk, tcp3 = cal_mhc_lhc_ref(
        th, qv, ql, qr, qi, qs, qg, tz)
    return dict(qv=qv.copy(), ql=ql.copy(), qr=qr.copy(), qi=qi.copy(),
                qs=qs.copy(), qg=qg.copy(), tz=tz.copy(), cvm=cvm,
                te8=te8, lcpk=lcpk, icpk=icpk, tcpk=tcpk, tcp3=tcp3)


QCMIN = 1.0e-12
DT_FR = 8.0


def pimlt_ref(th, st, dts, tau_imlt, ql_mlt, tice_mlt):
    """pimlt:3244."""
    fac_imlt = 1.0 - np.exp(-dts / tau_imlt)
    km = len(st["qv"])
    for k in range(km):
        tc = st["tz"][k] - tice_mlt
        if tc > 0.0 and st["qi"][k] > QCMIN:
            sink = fac_imlt * tc / st["icpk"][k]
            sink = min(st["qi"][k], sink)
            tmp = min(sink, dim(ql_mlt, st["ql"][k]))
            update_qt_ref(th, st, k, 0.0, tmp, sink - tmp, -sink, 0.0,
                          0.0)


def pcomp_ref(th, st):
    """pcomp:4273."""
    km = len(st["qv"])
    for k in range(km):
        tc = th.t_wfr - st["tz"][k]
        if tc > 0.0 and st["ql"][k] > QCMIN:
            sink = st["ql"][k] * tc / DT_FR
            sink = min(st["ql"][k], sink, tc / st["icpk"][k])
            update_qt_ref(th, st, k, 0.0, -sink, 0.0, sink, 0.0, 0.0)


def pcond_pevap_ref(th, st, dts, den, wqs_fn, tau_l2v, tau_v2l,
                    rh_fac_evap, rh_fac_cond, do_evap_timescale=True,
                    do_cond_timescale=False, use_rhc_cevap=False,
                    rhc_cevap=0.85):
    """pcond_pevap:4198; wqs_fn(t, den) -> (qsw, dqdt)."""
    fac_l2v = 1.0 - np.exp(-dts / tau_l2v)
    fac_v2l = 1.0 - np.exp(-dts / tau_v2l)
    km = len(st["qv"])
    for k in range(km):
        tin = st["tz"][k]
        qsw, dqdt = wqs_fn(tin, den[k])
        qpz = st["qv"][k] + st["ql"][k] + st["qi"][k]
        rh_tem = qpz / qsw
        dq = qsw - st["qv"][k]
        if dq > 0.0:
            if do_evap_timescale:
                factor = min(1.0, fac_l2v * (rh_fac_evap * dq / qsw))
            else:
                factor = 1.0
            sink = min(st["ql"][k],
                       factor * dq / (1.0 + st["tcp3"][k] * dqdt))
            if use_rhc_cevap and rh_tem >= rhc_cevap:
                sink = 0.0
        else:
            if do_cond_timescale:
                factor = min(1.0, fac_v2l * (rh_fac_cond * (-dq) / qsw))
            else:
                factor = 1.0
            sink = -min(st["qv"][k],
                        factor * (-dq) / (1.0 + st["tcp3"][k] * dqdt))
        update_qt_ref(th, st, k, sink, -sink, 0.0, 0.0, 0.0, 0.0)


def psmlt_simp_ref(th, st, dts, tau_smlt, qs_mlt):
    """psmlt_simp:5872."""
    fac_smlt = 1.0 - np.exp(-dts / tau_smlt)
    km = len(st["qv"])
    for k in range(km):
        tc = st["tz"][k] - th.tice
        if tc >= 0.0 and st["qs"][k] > QCMIN:
            sink = (tc * 0.1) ** 2 * st["qs"][k]
            sink = min(st["qs"][k], sink, fac_smlt * tc / st["icpk"][k])
            tmp = min(sink, dim(qs_mlt, st["ql"][k]))
            update_qt_ref(th, st, k, 0.0, tmp, sink - tmp, 0.0, -sink,
                          0.0)


def praut_simp_ref(th, st, dts, tau_l2r, ql0_max):
    """praut_simp:5931 (update_qq — no temperature change)."""
    fac_l2r = 1.0 - np.exp(-dts / tau_l2r)
    km = len(st["qv"])
    for k in range(km):
        tc = st["tz"][k] - th.t_wfr
        if tc > 0.0 and st["ql"][k] > ql0_max:
            sink = fac_l2r * (st["ql"][k] - ql0_max)
            st["ql"][k] -= sink
            st["qr"][k] += sink


def pgfr_simp_ref(th, st, dts, tau_r2g):
    """pgfr_simp:5814."""
    fac_r2g = 1.0 - np.exp(-dts / tau_r2g)
    km = len(st["qv"])
    for k in range(km):
        tc = st["tz"][k] - th.tice
        if tc < 0.0 and st["qr"][k] > QCMIN:
            sink = (-tc * 0.025) ** 2 * st["qr"][k]
            sink = min(st["qr"][k], sink, -fac_r2g * tc / st["icpk"][k])
            update_qt_ref(th, st, k, 0.0, 0.0, -sink, 0.0, 0.0, sink)
