"""Diff the vectorized mp_fast processes (physics/gfdl_mp.py) against the
loop-literal Fortran transcriptions (mp_fast_oracle). f64, 1e-12
relative. Reference: /root/reference/model/gfdl_mp.F90 pimlt:3244,
pcomp:4273, pcond_pevap:4198, psmlt_simp:5872, praut_simp:5931,
pgfr_simp:5814, update_qt:6951, cal_mhc_lhc:6884."""
import jax.numpy as jnp
import numpy as np
import pytest

import gfdl_atmos_cubed_sphere_tpu.physics.gfdl_mp as mp
import gfdl_atmos_cubed_sphere_tpu.constants as con
from .mp_fast_oracle import (Thermo, make_state, pimlt_ref, pcomp_ref,
                             pcond_pevap_ref, psmlt_simp_ref,
                             praut_simp_ref, pgfr_simp_ref)

pytestmark = pytest.mark.fast


def _thermo(cfg):
    """The module's constant-pressure latent-heat family as oracle args."""
    return Thermo(lv00=mp.LV0, li00=mp.LI0, d1_vap=mp.DC_VAP,
                  d1_ice=mp.DC_ICE, cv_air=mp.CV_AIR, cv_vap=mp.CV_VAP,
                  c_liq=mp.C_LIQ, c_ice=mp.C_ICE, tice=mp.TICE,
                  t_wfr=cfg.t_wfr)


def _columns(km=24, seed=3):
    """Mixed-phase columns spanning melt/freeze/saturation regimes."""
    rng = np.random.default_rng(seed)
    tz = rng.uniform(230.0, 300.0, km)
    qv = rng.uniform(1e-6, 1.5e-2, km)
    ql = rng.uniform(0.0, 3e-3, km)
    qr = rng.uniform(0.0, 2e-3, km)
    qi = rng.uniform(0.0, 2e-3, km)
    qs = rng.uniform(0.0, 2e-3, km)
    qg = rng.uniform(0.0, 1e-3, km)
    den = rng.uniform(0.3, 1.2, km)
    return tz, qv, ql, qr, qi, qs, qg, den


def _jax_state(cfg, tz, qv, ql, qr, qi, qs, qg):
    arr = lambda a: jnp.asarray(a, jnp.float64)[None, :, None, None]
    return mp._st_init(arr(tz), arr(qv), arr(ql), arr(qr), arr(qi),
                       arr(qs), arr(qg), cfg.t_wfr)


def _compare(st_j, st_ref):
    back = lambda a: np.asarray(a)[0, :, 0, 0]
    for jk, rk in (("t", "tz"), ("qv", "qv"), ("ql", "ql"), ("qr", "qr"),
                   ("qi", "qi"), ("qs", "qs"), ("qg", "qg")):
        np.testing.assert_allclose(back(st_j[jk]), st_ref[rk],
                                   rtol=1e-12, atol=1e-15,
                                   err_msg=jk)


@pytest.mark.parametrize("proc", ["pimlt", "pcomp", "psmlt_simp",
                                  "praut_simp", "pgfr_simp"])
def test_process_vs_oracle(proc):
    cfg = mp.MPConfig()
    th = _thermo(cfg)
    tz, qv, ql, qr, qi, qs, qg, den = _columns()
    dts = 20.0

    st_ref = make_state(th, qv, ql, qr, qi, qs, qg, tz)
    st_j = _jax_state(cfg, tz, qv, ql, qr, qi, qs, qg)
    if proc == "pimlt":
        pimlt_ref(th, st_ref, dts, cfg.tau_imlt, cfg.ql_mlt, cfg.tice_mlt)
        st_j = mp.pimlt(st_j, dts, cfg)
    elif proc == "pcomp":
        pcomp_ref(th, st_ref)
        st_j = mp.pcomp(st_j, cfg)
    elif proc == "psmlt_simp":
        psmlt_simp_ref(th, st_ref, dts, cfg.tau_smlt, cfg.qs_mlt)
        st_j = mp.psmlt_simp(st_j, dts, cfg)
    elif proc == "praut_simp":
        praut_simp_ref(th, st_ref, dts, cfg.tau_l2r, cfg.ql0_max)
        st_j = mp.praut_simp(st_j, dts, cfg)
    else:
        pgfr_simp_ref(th, st_ref, dts, cfg.tau_r2g)
        st_j = mp.pgfr_simp(st_j, dts, cfg)
    _compare(st_j, st_ref)


def test_pcond_pevap_vs_oracle():
    """pcond_pevap with the module's own density-form wqs as the shared
    saturation function (the oracle transcribes the control flow, the
    saturation curve is the module's)."""
    cfg = mp.MPConfig()
    th = _thermo(cfg)
    tz, qv, ql, qr, qi, qs, qg, den = _columns(seed=7)
    dts = 20.0

    def wqs_scalar(t, d):
        q, dq = mp.wqs_den(jnp.asarray(t, jnp.float64),
                           jnp.asarray(d, jnp.float64))
        return float(q), float(dq)

    st_ref = make_state(th, qv, ql, qr, qi, qs, qg, tz)
    pcond_pevap_ref(th, st_ref, dts, den, wqs_scalar, cfg.tau_l2v,
                    cfg.tau_v2l, cfg.rh_fac_evap, cfg.rh_fac_cond)
    st_j = _jax_state(cfg, tz, qv, ql, qr, qi, qs, qg)
    den_j = jnp.asarray(den, jnp.float64)[None, :, None, None]
    st_j = mp.pcond_pevap(st_j, dts, den_j, cfg)
    _compare(st_j, st_ref)


def test_mp_fast_chain_runs_and_conserves():
    """The full mp_fast chain: finite, non-negative species, and the
    conserved moist energy te8 = cvm*T + LV0*qv - LI0*q_sol is invariant
    to round-off across every phase change (the update_qt contract)."""
    cfg = mp.MPConfig()
    tz, qv, ql, qr, qi, qs, qg, den = _columns(km=32, seed=11)
    arr = lambda a: jnp.asarray(a, jnp.float64)[None, :, None, None]
    dp = arr(np.full_like(tz, 500.0))
    denfac = jnp.sqrt(1.2 / arr(den))
    args = [arr(x) for x in (tz, qv, ql, qr, qi, qs, qg)]
    te0 = mp._mhc(*args[1:]) * args[0] + mp.LV0 * args[1] - mp.LI0 * (
        args[4] + args[5] + args[6])
    out = mp.mp_fast(*args, 20.0, dp, arr(den), denfac, cfg)
    t2, qv2, ql2, qr2, qi2, qs2, qg2 = out
    for a in out:
        assert not bool(jnp.isnan(a).any())
    for a in (qv2, ql2, qr2, qi2, qs2, qg2):
        assert float(a.min()) >= -1e-15
    te1 = mp._mhc(qv2, ql2, qr2, qi2, qs2, qg2) * t2 + mp.LV0 * qv2 \
        - mp.LI0 * (qi2 + qs2 + qg2)
    np.testing.assert_allclose(np.asarray(te1), np.asarray(te0),
                               rtol=1e-11)
    # total water conserved (no sedimentation in the fast chain)
    tw0 = sum(np.asarray(a) for a in args[1:])
    tw1 = sum(np.asarray(a) for a in (qv2, ql2, qr2, qi2, qs2, qg2))
    np.testing.assert_allclose(tw1, tw0, rtol=1e-12)


def test_fast_sat_adj_dispatches_mp_fast():
    """cfg.use_mp_fast routes the dyn_core fast-phys hook through the
    mp_fast chain; both paths stay callable."""
    cfg_fast = mp.MPConfig(use_mp_fast=True)
    cfg_old = mp.MPConfig(use_mp_fast=False)
    rng = np.random.default_rng(5)
    shp = (2, 10, 3, 3)
    pt = jnp.asarray(rng.uniform(240.0, 300.0, shp))
    delp = jnp.full(shp, 1.0e4)
    q = {"sphum": jnp.asarray(rng.uniform(1e-4, 1.2e-2, shp)),
         "liq_wat": jnp.full(shp, 1e-4),
         "rainwat": jnp.full(shp, 1e-4),
         "ice_wat": jnp.full(shp, 1e-4),
         "snowwat": jnp.full(shp, 1e-4),
         "graupel": jnp.full(shp, 1e-5)}
    t_new, q_new = mp.fast_sat_adj(pt, delp, None, q, 30.0, 100.0,
                                   cfg=cfg_fast, hydrostatic=True)
    t_old, q_old = mp.fast_sat_adj(pt, delp, None, q, 30.0, 100.0,
                                   cfg=cfg_old, hydrostatic=True)
    assert not bool(jnp.isnan(t_new).any())
    assert float(jnp.abs(t_new - pt).max()) > 0.0
    assert float(jnp.abs(t_new - t_old).max()) > 0.0


def test_subgrid_z_proc_full_path():
    """mp_full's per-process saturation stage (subgrid_z_proc:3989 via
    cfg.use_subgrid_proc): finite, conserves the te8 moist energy and
    total water, removes supersaturation, and pinst deposits all vapor
    below t_min / clears clouds below rh_adj."""
    cfg = mp.MPConfig(use_subgrid_proc=True, rh_adj=0.3)
    tz, qv, ql, qr, qi, qs, qg, den = _columns(km=24, seed=21)
    arr = lambda a: jnp.asarray(a, jnp.float64)[None, :, None, None]
    args = [arr(x) for x in (tz, qv, ql, qr, qi, qs, qg)]
    dp = arr(np.full_like(tz, 500.0))
    denfac = jnp.sqrt(1.2 / arr(den))
    te0 = mp._mhc(*args[1:]) * args[0] + mp.LV0 * args[1] - mp.LI0 * (
        args[4] + args[5] + args[6])
    out = mp.subgrid_z_proc(*args, dp, arr(den), denfac, 20.0, cfg,
                            rh_adj=cfg.rh_adj)
    t2, qv2, ql2, qr2, qi2, qs2, qg2 = out
    for a in out:
        assert not bool(jnp.isnan(a).any())
    te1 = mp._mhc(qv2, ql2, qr2, qi2, qs2, qg2) * t2 + mp.LV0 * qv2 \
        - mp.LI0 * (qi2 + qs2 + qg2)
    np.testing.assert_allclose(np.asarray(te1), np.asarray(te0),
                               rtol=1e-11)
    tw0 = sum(np.asarray(a) for a in args[1:])
    tw1 = sum(np.asarray(a) for a in (qv2, ql2, qr2, qi2, qs2, qg2))
    np.testing.assert_allclose(tw1, tw0, rtol=1e-12)
    # pinst super-cold deposition: in isolation a t_min-cold column
    # deposits all vapor to ice (the downstream dep/sub processes then
    # re-equilibrate, so check the process itself)
    t_cold = arr(np.full_like(tz, 170.0))
    stc = mp._st_init(t_cold, *args[1:], cfg.t_wfr)
    qi_before = stc["qi"]
    stc = mp.pinst(stc, arr(den), cfg.rh_adj, cfg)
    assert float(stc["qv"].max()) <= 1.1e-12
    assert float((stc["qi"] - qi_before).min()) >= 0.0
    # mp_full accepts the flag end-to-end
    dz = arr(np.full_like(tz, -400.0))
    p_lay = arr(np.full_like(tz, 5.0e4))
    r = mp.mp_full(*args, dp, dz, arr(den), denfac, 20.0, p_lay, cfg)
    assert not bool(jnp.isnan(r[0]).any())
