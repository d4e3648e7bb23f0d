"""moist_cv/moist_cp, compute_aam, ColumnDiag, off-centered SIM solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gfdl_atmos_cubed_sphere_tpu.constants as con
from gfdl_atmos_cubed_sphere_tpu.model import thermodynamics as thermo
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

N, K = 12, 10


@pytest.fixture(scope="module")
def setup():
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(K)
    ic = jw_baroclinic(g.geom, K, ak, bk, ptop)
    return g, ptop, ic


def test_moist_cv_cp():
    q = {"sphum": jnp.asarray(0.01), "liq_wat": jnp.asarray(2.0e-3),
         "rainwat": jnp.asarray(1.0e-3), "ice_wat": jnp.asarray(5.0e-4),
         "snowwat": jnp.asarray(2.0e-4), "graupel": jnp.asarray(1.0e-4)}
    cvm, qcon = thermo.moist_cv(q, nwat=6)
    ql = 3.0e-3
    qs = 8.0e-4
    expect = ((1.0 - 0.01 - ql - qs) * con.CV_AIR + 0.01 * con.CV_VAP
              + ql * con.C_LIQ + qs * con.C_ICE)
    assert float(cvm) == pytest.approx(expect, rel=1e-12)
    assert float(qcon) == pytest.approx(ql + qs, rel=1e-12)
    # dry limit
    cvm0, qc0 = thermo.moist_cv({"sphum": jnp.asarray(0.0)}, nwat=6)
    assert float(cvm0) == pytest.approx(con.CV_AIR)
    cpm, _ = thermo.moist_cp(q, nwat=6)
    assert float(cpm) > float(cvm)            # cp > cv always
    # nwat ordering: more condensate -> different cvm
    cvm5, _ = thermo.moist_cv(q, nwat=5)
    assert float(cvm5) != float(cvm)


def test_compute_aam(setup):
    g, ptop, ic = setup
    aam, m_fac, ps = thermo.compute_aam(jnp.asarray(ic["u"]),
                                        jnp.asarray(ic["v"]),
                                        jnp.asarray(ic["delp"]), g, ptop)
    assert aam.shape == (6, N, N)
    # JW westerlies: net positive relative AAM beyond the planetary part
    omega_term = (g.geom.radius * jnp.cos(
        jnp.asarray(g.geom.interior("aglat")))) ** 2 * g.geom.omega
    rel = float(jnp.sum(aam)) - float(jnp.sum(
        omega_term * jnp.asarray(ic["delp"]).sum(axis=1) / con.GRAV))
    assert rel > 0.0
    np.testing.assert_allclose(np.asarray(ps),
                               ptop + np.asarray(ic["delp"]).sum(axis=1))


def test_column_diag(setup):
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import ColumnDiag
    g, ptop, ic = setup
    cd = ColumnDiag(g.geom, [("equator", 0.0, 0.0), ("pole", 10.0, 88.0)])
    assert abs(cd.points[0]["lat"]) < 10.0
    assert cd.points[1]["lat"] > 75.0
    lines = []
    s = cd.printout({"pt": ic["pt"], "ps": ic["ps"]}, out=lines.append)
    assert "equator" in s and "pole" in s
    assert s["equator"]["pt"].shape == (K,)
    assert any("column 'pole'" in ln for ln in lines)


def test_sim_solver_offcentered():
    """a_imp=0.75 (SIM_solver) stays close to the fully-implicit solution
    for a hydrostatic column at rest (both must keep w ~ 0) and reduces to
    SIM1 exactly at alpha=1."""
    from gfdl_atmos_cubed_sphere_tpu.ops.nh_core import sim1_solver
    rng = np.random.default_rng(3)
    Kz = 16
    akap = con.KAPPA
    gama = 1.0 / (1.0 - akap)
    ptop = 100.0e2
    pe = np.linspace(ptop, 1.0e5, Kz + 1)
    dp = np.diff(pe)
    pm = dp / np.diff(np.log(pe))
    t0 = 280.0 * np.ones(Kz)
    dz = -con.RDGAS * t0 / con.GRAV * np.diff(np.log(pe))
    # the solver's pt2 is virtual potential temperature normalized by
    # p0 = 1 Pa (gas law p = (rho*Rd*theta)^gamma)
    t0 = t0 * pm ** (-akap)
    sh = (Kz, 4, 4)
    e = lambda a, n=3: jnp.asarray(np.broadcast_to(
        np.asarray(a).reshape((-1, 1, 1)), (len(np.asarray(a)),) + sh[1:]))
    args = dict(dm2=e(dp / con.GRAV), pm2=e(pm), pem=e(pe),
                w2=jnp.zeros(sh), dz2=e(dz), pt2=e(t0),
                ws=jnp.zeros(sh[1:]), gama=gama, akap=akap, p_fac=0.05)
    p1, w1_, dz1 = sim1_solver(5.0, **args, alpha=1.0)
    p2, w2_, dz2_ = sim1_solver(5.0, **args, alpha=0.75)
    # hydrostatic rest column: w stays ~0, dz unchanged to roundoff
    assert float(jnp.abs(w1_).max()) < 1e-8
    assert float(jnp.abs(w2_).max()) < 1e-8
    np.testing.assert_allclose(np.asarray(dz2_), np.asarray(dz1), rtol=1e-9)
    # perturbed column: both give finite, similar answers
    args["w2"] = jnp.asarray(rng.normal(size=sh)) * 0.5
    p1, w1_, dz1 = sim1_solver(5.0, **args, alpha=1.0)
    p2, w2_, dz2_ = sim1_solver(5.0, **args, alpha=0.75)
    assert np.isfinite(np.asarray(w2_)).all()
    assert float(jnp.abs(w2_ - w1_).max()) < 0.5 * float(jnp.abs(w1_).max())


def test_consv_checker():
    """consv_checker (fv_control.F90:1145 te_err/tw_err audit): zero for
    an unchanged state; flags a deliberate energy leak."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
    from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import consv_checker

    g = build_grid_ops(13, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(10)
    ic = jw_baroclinic(g.geom, 10, ak, bk, ptop, perturb=True, moist=True)
    st = {k: jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v")}
    st["phis"] = jnp.asarray(ic["phis"])
    st["q"] = {"sphum": jnp.asarray(ic["sphum"])}
    te, tw = consv_checker(st, st, g, ptop)
    assert te == 0.0 and tw == 0.0
    warm = dict(st, pt=st["pt"] * 1.001)
    msgs = []
    te, tw = consv_checker(st, warm, g, ptop, out=msgs.append)
    assert te > 1e-5 and msgs
    with pytest.raises(AssertionError):
        consv_checker(st, warm, g, ptop, strict=True)
    dryer = dict(st, q={"sphum": st["q"]["sphum"] * 0.999})
    te, tw = consv_checker(st, dryer, g, ptop, out=msgs.append)
    assert tw > 1e-6
