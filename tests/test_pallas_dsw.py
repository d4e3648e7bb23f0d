"""The d_sw Pallas mega-kernel (ops/pallas_dsw.py) must reproduce the XLA
d_sw path exactly (interpret mode, f64, CPU). Covers the merged-sponge
per-level SMEM profiles (d2_bg / damp_v / damp_v2 / nord_mask) and both
hord families (reference: /root/reference/model/sw_core.F90:494 d_sw;
dyn_core.F90:675-733 per-k damping)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model import sw_dynamics as swd
from gfdl_atmos_cubed_sphere_tpu.init import sw_cases
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core
from gfdl_atmos_cubed_sphere_tpu.ops.pallas_dsw import d_sw_pallas

# integration tier (formerly 'fast'): interpret-mode kernel
# equivalence / multi-step runs, too slow for the <90 s tier


def _dsw_inputs(npz=3, npx=17):
    """Padded d_sw operands from SW case 2 on C16 with per-level noise and a
    non-trivial pt field (sw_mode=False transport active)."""
    g = build_grid_ops(npx, dtype=jnp.float64)
    ic = sw_cases.case2(g.geom)
    swd.prepare_phis(g, ic["phis"])
    halo = g.halo
    key = np.random.default_rng(7)

    def levs(x, scale=0.01):
        x = np.asarray(x)
        pert = 1.0 + scale * key.standard_normal(
            (x.shape[0], npz) + x.shape[2:])
        return jnp.asarray(x * pert)

    delp = levs(ic["delp"])
    u = levs(ic["u"])
    v = levs(ic["v"])
    pt = jnp.asarray(
        300.0 * (1.0 + 0.02 * key.standard_normal(delp.shape)))

    delp_p = halo.pad_cell(delp)
    pt_p = halo.pad_cell(pt)
    u_p, v_p = halo.pad_dgrid(u, v)
    cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, 30.0,
                      hydrostatic=True, nord=1, sw_mode=False)
    uc, vc = swd._p_grad_c_sw(cs.uc, cs.vc, cs.delpc, g.phis_p, g, 30.0)
    from gfdl_atmos_cubed_sphere_tpu.ops.fill_corners import fi
    ctr = slice(swd.H, swd.H + g.n)
    wsl = slice(fi(1), fi(g.npx) + 1)
    uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr])
    divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl])
    return g, dict(delp=delp_p, pt=pt_p, w=None, u=u_p, v=v_p, uc=uc_p,
                   vc=vc_p, ua=cs.ua, va=cs.va, divg_d=divg_p)


def _sponge_kwargs(hord):
    """The merged-sponge per-level profile set of the headline config
    (dyn_core._sponge_level_params at nord=1, 3 levels)."""
    return dict(
        dt=60.0, hord_mt=hord, hord_vt=hord, hord_dp=hord, hord_tm=hord,
        nord=1, nord_v=1, dddmp=0.0, d4_bg=0.16,
        d2_bg=np.array([0.2, 0.015, 0.0]),
        damp_v=np.array([0.0, 0.0, 0.02]),
        damp_v2=np.array([0.1, 0.0075, 0.0]), nord_v2=0,
        nord_mask=np.array([True, True, False]),
        d_con=0.0, hydrostatic=True, lim_fac=1.0)


@pytest.mark.parametrize("hord", [
    pytest.param(6, marks=pytest.mark.slow), 10])
def test_pallas_dsw_interpret_matches_xla(hord):
    g, ins = _dsw_inputs(npz=3)
    kw = _sponge_kwargs(hord)
    args = (ins["delp"], ins["pt"], ins["w"], ins["u"], ins["v"],
            ins["uc"], ins["vc"], ins["ua"], ins["va"], ins["divg_d"], g)
    ref = sw_core.d_sw(*args, **kw)
    names = ("u", "v", "delp", "pt", "fx", "fy", "crx", "cry",
             "xfx", "yfx")
    got_t = jax.jit(lambda: tuple(
        getattr(d_sw_pallas(*args, interpret=True, **kw), nm)
        for nm in names))()
    got = dict(zip(names, got_t))
    for name in names:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(got[name]),
            rtol=2e-10, atol=1e-9, err_msg=name)


def test_pallas_dsw_heat_source():
    """d_con > 0 path: dissipative-heating output must match."""
    g, ins = _dsw_inputs(npz=2)
    kw = _sponge_kwargs(8)
    kw.update(d2_bg=np.array([0.2, 0.0]), damp_v=np.array([0.0, 0.02]),
              damp_v2=np.array([0.1, 0.0]),
              nord_mask=np.array([True, False]),
              d_con=np.array([0.0, 1.0]))
    args = (ins["delp"], ins["pt"], ins["w"], ins["u"], ins["v"],
            ins["uc"], ins["vc"], ins["ua"], ins["va"], ins["divg_d"], g)
    ref = sw_core.d_sw(*args, **kw)
    hs, uu = jax.jit(lambda: (lambda d: (d.heat_source, d.u))(
        d_sw_pallas(*args, interpret=True, **kw)))()
    np.testing.assert_allclose(np.asarray(ref.heat_source), np.asarray(hs),
                               rtol=2e-10, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(uu),
                               rtol=2e-10, atol=1e-9)


def test_pallas_dsw_dddmp_smagorinsky():
    """dddmp >= 1e-5 (Smagorinsky-modulated divergence damping,
    sw_core.F90:1466-1473): the winds kernel takes the precomputed
    a2b_ord4(vorticity) operand and must match the XLA path."""
    g, ins = _dsw_inputs(npz=2)
    kw = _sponge_kwargs(8)
    kw.update(dddmp=0.2, d2_bg=np.array([0.2, 0.0]),
              damp_v=np.array([0.0, 0.02]), damp_v2=np.array([0.1, 0.0]),
              nord_mask=np.array([True, False]))
    args = (ins["delp"], ins["pt"], ins["w"], ins["u"], ins["v"],
            ins["uc"], ins["vc"], ins["ua"], ins["va"], ins["divg_d"], g)
    ref = sw_core.d_sw(*args, **kw)
    got_u, got_v = jax.jit(lambda: (lambda d: (d.u, d.v))(
        d_sw_pallas(*args, interpret=True, **kw)))()
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(got_u),
                               rtol=2e-10, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ref.v), np.asarray(got_v),
                               rtol=2e-10, atol=1e-9)
