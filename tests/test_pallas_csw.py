"""The c_sw Pallas mega-kernel (ops/pallas_csw.py) must reproduce the XLA
c_sw path exactly (interpret mode, f64, CPU), including the select-based
d2a2c_vect / divergence_corner / corner-fill variants
(reference: /root/reference/model/sw_core.F90:79 c_sw, :3006 d2a2c_vect,
:1740 divergence_corner)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.init import sw_cases
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core
from gfdl_atmos_cubed_sphere_tpu.ops.pallas_csw import c_sw_pallas

# integration tier (formerly 'fast'): interpret-mode kernel
# equivalence / multi-step runs, too slow for the <90 s tier


def _inputs(npz=2, npx=17):
    g = build_grid_ops(npx, dtype=jnp.float64)
    ic = sw_cases.case2(g.geom)
    halo = g.halo
    key = np.random.default_rng(11)

    def levs(x, scale=0.01):
        x = np.asarray(x)
        pert = 1.0 + scale * key.standard_normal(
            (x.shape[0], npz) + x.shape[2:])
        return jnp.asarray(x * pert)

    delp = levs(ic["delp"])
    u = levs(ic["u"])
    v = levs(ic["v"])
    pt = jnp.asarray(300.0 * (1.0 + 0.02 * key.standard_normal(delp.shape)))
    w = jnp.asarray(0.1 * key.standard_normal(delp.shape))
    delp_p = halo.pad_cell(delp)
    pt_p = halo.pad_cell(pt)
    w_p = halo.pad_cell(w)
    u_p, v_p = halo.pad_dgrid(u, v)
    return g, delp_p, pt_p, w_p, u_p, v_p


@pytest.mark.parametrize("hydro", [True, False])
def test_pallas_csw_interpret_matches_xla(hydro):
    g, delp_p, pt_p, w_p, u_p, v_p = _inputs()
    dt2 = 30.0
    ref = sw_core.c_sw(delp_p, pt_p, None if hydro else w_p, u_p, v_p, g,
                       dt2, hydrostatic=hydro, nord=1, sw_mode=False)
    names = ["delpc", "ptc", "uc", "vc", "ua", "va", "ut", "vt", "divg_d"]
    if not hydro:
        names.append("wc")
    got_t = jax.jit(lambda: tuple(
        getattr(c_sw_pallas(delp_p, pt_p, None if hydro else w_p, u_p, v_p,
                            g, dt2, hydrostatic=hydro, nord=1,
                            interpret=True), nm)
        for nm in names))()
    for nm, b in zip(names, got_t):
        a = np.asarray(getattr(ref, nm))
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-10, atol=1e-9,
                                   err_msg=nm)


def test_in_kernel_csw_matches_default():
    """The in_kernel=True select formulation (outside Pallas) must match the
    default path exactly — pins _d2a2c_vect_sel and the select edge code."""
    g, delp_p, pt_p, w_p, u_p, v_p = _inputs()
    ref = sw_core.c_sw(delp_p, pt_p, w_p, u_p, v_p, g, 30.0,
                       hydrostatic=False, nord=1, sw_mode=False)
    got = sw_core.c_sw(delp_p, pt_p, w_p, u_p, v_p, g, 30.0,
                       hydrostatic=False, nord=1, sw_mode=False,
                       in_kernel=True)
    for nm in ("delpc", "ptc", "wc", "uc", "vc", "ua", "va", "ut", "vt",
               "divg_d"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, nm)), np.asarray(getattr(got, nm)),
            rtol=1e-12, atol=1e-12, err_msg=nm)
