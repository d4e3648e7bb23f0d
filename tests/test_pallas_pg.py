"""Pressure-stage Pallas kernels (ops/pallas_col.py round-4 additions) must
reproduce the XLA geopk + p_grad_c path exactly (interpret mode, f64, CPU).
Reference: dyn_core.F90 geopk:2202, p_grad_c:1635, one_grad_p feed :906."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import geopk, p_grad_c
from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic
from gfdl_atmos_cubed_sphere_tpu.ops import pallas_col
import gfdl_atmos_cubed_sphere_tpu.constants as con

pytestmark = pytest.mark.fast

H = 3


def _inputs(npx=17, npz=16):
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    rng = np.random.default_rng(3)
    delp = jnp.asarray(ic["delp"] * (1 + 0.01 * rng.standard_normal(
        ic["delp"].shape)))
    ptv = jnp.asarray(300.0 * (1 + 0.02 * rng.standard_normal(delp.shape)))
    delp_p = g.halo.pad_cell(delp)
    pt_p = g.halo.pad_cell(ptv)
    return g, delp_p, pt_p, ptop


def test_pkgz_matches_geopk():
    g, delp_p, pt_p, ptop = _inputs()
    akap = con.KAPPA
    _, _, pk_ref, gz_ref, _ = geopk(delp_p, pt_p, g.phis_p, akap, ptop)
    pk, gz = jax.jit(lambda: pallas_col.pkgz_pallas(
        delp_p, pt_p, g.phis_p, akap, ptop, interpret=True))()
    np.testing.assert_allclose(np.asarray(pk), np.asarray(pk_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gz), np.asarray(gz_ref),
                               rtol=1e-12, atol=1e-7)


def test_pgradc_fused_matches_xla():
    npx = 17
    g, delp_p, pt_p, ptop = _inputs(npx)
    akap = con.KAPPA
    rng = np.random.default_rng(5)
    uc = jnp.asarray(rng.standard_normal(
        delp_p.shape[:-1] + (delp_p.shape[-1] + 1,)))
    vc = jnp.asarray(rng.standard_normal(
        delp_p.shape[:-2] + (delp_p.shape[-2] + 1, delp_p.shape[-1])))
    dt2 = 30.0
    _, _, pkc, gzc, _ = geopk(delp_p, pt_p, g.phis_p, akap, ptop)
    uc_ref, vc_ref = p_grad_c(uc, vc, delp_p, pkc, gzc, g, dt2, npx)
    uc_k, vc_k = jax.jit(lambda: pallas_col.pgradc_fused_pallas(
        delp_p, pt_p, g.phis_p, uc, vc, g, dt2, akap, ptop, npx,
        interpret=True))()
    np.testing.assert_allclose(np.asarray(uc_k), np.asarray(uc_ref),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(vc_k), np.asarray(vc_ref),
                               rtol=1e-11, atol=1e-11)
