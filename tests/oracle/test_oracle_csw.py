"""Diff the vectorized c_sw (ops/sw_core.c_sw) against the loop-literal
transcription of sw_core.F90 c_sw:79-493 (+d2a2c_vect, divergence_corner)
on a real C12 cube tile. f64, ~1e-12."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core
from .csw_oracle import FA2, c_sw_ref

pytestmark = pytest.mark.fast

H = 3


def _metric_fa2(g, t):
    """FA2 views of tile t's metric arrays (Fortran cell isd=-2 at numpy
    padded index 0)."""
    a2 = lambda arr: FA2.from_np(np.asarray(arr)[t, 0], -2, -2)
    gg = dict(
        dxa=a2(g.dxa), dya=a2(g.dya), cosa_s=a2(g.cosa_s), rsin2=a2(g.rsin2),
        rarea=a2(g.rarea), dx=a2(g.dx), dy=a2(g.dy),
        cosa_u=a2(g.cosa_u), rsin_u=a2(g.rsin_u), sina_u=a2(g.sina_u),
        cosa_v=a2(g.cosa_v), rsin_v=a2(g.rsin_v), sina_v=a2(g.sina_v),
        dxc=a2(g.dxc), dyc=a2(g.dyc), rdxc=a2(g.rdxc), rdyc=a2(g.rdyc),
        rarea_c=a2(g.area_c), fC=a2(g.fC),
    )
    gg["rarea_c"] = FA2.from_np(1.0 / np.asarray(g.area_c)[t, 0], -2, -2)
    gg["sin_sg"] = [FA2.from_np(
        np.asarray(getattr(g, f"sin_sg{c}"))[t, 0], -2, -2)
        for c in (1, 2, 3, 4)]
    gg["cos_sg"] = [FA2.from_np(
        np.asarray(getattr(g, f"cos_sg{c}"))[t, 0], -2, -2)
        for c in (1, 2, 3, 4)]
    return gg


@pytest.mark.parametrize("hydrostatic", [True, False])
def test_csw_vs_oracle(hydrostatic):
    npx = 13
    n = npx - 1
    g = build_grid_ops(npx, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    delp = jnp.asarray(rng.uniform(900.0, 1100.0, (6, 1, n, n)))
    pt = jnp.asarray(rng.uniform(250.0, 310.0, (6, 1, n, n)))
    w = jnp.asarray(rng.standard_normal((6, 1, n, n)))
    u = jnp.asarray(rng.standard_normal((6, 1, n + 1, n)) * 10)
    v = jnp.asarray(rng.standard_normal((6, 1, n, n + 1)) * 10)
    dt2 = 30.0

    delp_p = g.halo.pad_cell(delp)
    pt_p = g.halo.pad_cell(pt)
    w_p = g.halo.pad_cell(w)
    u_p, v_p = g.halo.pad_dgrid(u, v)
    cs = sw_core.c_sw(delp_p, pt_p, None if hydrostatic else w_p,
                      u_p, v_p, g, dt2, hydrostatic=hydrostatic, nord=1,
                      sw_mode=False)

    t = 0
    gg = _metric_fa2(g, t)
    f2 = lambda a, li, lj: FA2.from_np(np.asarray(a)[t, 0], li, lj)
    ref = c_sw_ref(f2(delp_p, -2, -2), f2(pt_p, -2, -2),
                   f2(w_p, -2, -2), f2(u_p, -2, -2), f2(v_p, -2, -2),
                   gg, npx, dt2, hydrostatic=hydrostatic, nord=1)

    # rim cells 0..npx for delpc/ptc, minus the four rim-corner cells
    # ((0,0) etc.): those are never consumed downstream (geopk feeds
    # p_grad_c only through cells adjacent to compute walls) and the
    # vectorized path leaves different fill-order values there
    lo, hi = 0, npx
    mask = np.ones((npx + 1, npx + 1), bool)
    for jj in (0, npx):
        for ii in (0, npx):
            mask[jj, ii] = False

    def cmp_rim(arr, key):
        got = np.asarray(arr)[t, 0][lo + 2:hi + 3, lo + 2:hi + 3]
        want = ref[key].to_np(lo, hi, lo, hi)
        np.testing.assert_allclose(got[mask], want[mask],
                                   rtol=1e-12, atol=1e-9, err_msg=key)

    cmp_rim(cs.delpc, "delpc")
    cmp_rim(cs.ptc, "ptc")
    if not hydrostatic:
        cmp_rim(cs.wc, "wc")

    # updated C winds on compute walls: uc walls 1..npx, cell rows 1..npx-1
    got = np.asarray(cs.uc)[t, 0]
    want = ref["uc"].to_np(1, npx, 1, npx - 1)
    np.testing.assert_allclose(got[3:npx + 2, 3:npx + 3], want,
                               rtol=1e-11, atol=1e-8, err_msg="uc")
    got = np.asarray(cs.vc)[t, 0]
    want = ref["vc"].to_np(1, npx - 1, 1, npx)
    np.testing.assert_allclose(got[3:npx + 3, 3:npx + 2], want,
                               rtol=1e-11, atol=1e-8, err_msg="vc")

    # divergence on interior corners 1..npx
    got = np.asarray(cs.divg_d)[t, 0]
    want = ref["divg_d"].to_np(1, npx, 1, npx)
    np.testing.assert_allclose(got[3:npx + 3, 3:npx + 3], want,
                               rtol=1e-11, atol=1e-14, err_msg="divg_d")

    # A-grid winds on the dord4 range (cells -1..npx+1 -> padded 1..npx+3)
    got = np.asarray(cs.ua)[t, 0]
    want = ref["ua"].to_np(-1, npx + 1, -1, npx + 1)
    np.testing.assert_allclose(got[1:npx + 4, 1:npx + 4], want,
                               rtol=1e-11, atol=1e-10, err_msg="ua")
    got = np.asarray(cs.va)[t, 0]
    want = ref["va"].to_np(-1, npx + 1, -1, npx + 1)
    np.testing.assert_allclose(got[1:npx + 4, 1:npx + 4], want,
                               rtol=1e-11, atol=1e-10, err_msg="va")
