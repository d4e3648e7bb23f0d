"""Regression: the in-kernel (use_select / traced-mask) d_sw formulations
must match the default XLA paths (ADVICE r2 item 4).

The use_select=True variants rewrite static .at[].set edge/corner overrides
as iota-masked selects (what Mosaic needs inside a Pallas kernel); nothing
else in CI exercised them, so this pins the equivalence on a real C24 SW
state (reference formulation: /root/reference/model/sw_core.F90:494 d_sw,
:1063 KE section, :700-760 edge winds).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model import sw_dynamics as swd
from gfdl_atmos_cubed_sphere_tpu.init import sw_cases
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core

# integration tier (formerly 'fast'): interpret-mode kernel
# equivalence / multi-step runs, too slow for the <90 s tier


def _dsw_inputs(npz=3):
    """Build padded d_sw operands from SW case 2 on C24, replicated to npz
    levels with small per-level perturbations."""
    g = build_grid_ops(25, dtype=jnp.float64)
    ic = sw_cases.case2(g.geom)
    swd.prepare_phis(g, ic["phis"])
    halo = g.halo
    key = np.random.default_rng(0)

    def levs(x):
        x = np.asarray(x)          # [6, 1, ...]
        pert = 1.0 + 0.01 * key.standard_normal(
            (x.shape[0], npz) + x.shape[2:])
        return jnp.asarray(x * pert)

    delp = levs(ic["delp"])
    u = levs(ic["u"])
    v = levs(ic["v"])

    delp_p = halo.pad_cell(delp)
    pt_p = jnp.ones_like(delp_p)
    u_p, v_p = halo.pad_dgrid(u, v)
    cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, 30.0,
                      hydrostatic=True, nord=1, sw_mode=True)
    uc, vc = swd._p_grad_c_sw(cs.uc, cs.vc, cs.delpc, g.phis_p, g, 30.0)
    from gfdl_atmos_cubed_sphere_tpu.ops.fill_corners import fi
    ctr = slice(swd.H, swd.H + g.n)
    wsl = slice(fi(1), fi(g.npx) + 1)
    uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr])
    divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl])
    return g, dict(delp=delp_p, pt=pt_p, u=u_p, v=v_p, uc=uc_p, vc=vc_p,
                   ua=cs.ua, va=cs.va, divg_d=divg_p)


def _run_dsw(g, ins, *, in_kernel, nord_mask, damp_v, d2_bg, d_con):
    ds = sw_core.d_sw(
        ins["delp"], ins["pt"], None, ins["u"], ins["v"], ins["uc"],
        ins["vc"], ins["ua"], ins["va"], ins["divg_d"], g,
        dt=60.0, hord_mt=6, hord_vt=6, hord_dp=6, hord_tm=6,
        nord=1, nord_v=1, dddmp=0.2, d2_bg=d2_bg, d4_bg=0.16,
        damp_v=damp_v, d_con=d_con, sw_mode=True,
        nord_mask=nord_mask, in_kernel=in_kernel)
    return ds


def test_in_kernel_matches_default_with_mask():
    npz = 3
    g, ins = _dsw_inputs(npz)
    mask_np = np.array([True, False, False])
    damp_v = np.array([0.06, 0.02, 0.02])
    d2_bg = np.array([0.01, 0.0, 0.0])
    d_con = np.array([0.0, 1.0, 1.0])

    ref = _run_dsw(g, ins, in_kernel=False, nord_mask=mask_np,
                   damp_v=damp_v, d2_bg=d2_bg, d_con=d_con)

    # in_kernel path with a *traced* float mask/damping profiles, as the
    # Pallas wrapper supplies them from SMEM
    def run(mask, dv, d2, dc):
        ds = _run_dsw(g, ins, in_kernel=True,
                      nord_mask=mask.reshape(-1, 1, 1),
                      damp_v=dv.reshape(-1, 1, 1),
                      d2_bg=d2.reshape(-1, 1, 1),
                      d_con=dc.reshape(-1, 1, 1))
        return ds.u, ds.v, ds.delp, ds.pt, ds.heat_source

    got = jax.jit(run)(jnp.asarray(mask_np, jnp.float64), jnp.asarray(damp_v),
                       jnp.asarray(d2_bg), jnp.asarray(d_con))
    for a, b, name in zip((ref.u, ref.v, ref.delp, ref.pt, ref.heat_source),
                          got, ("u", "v", "delp", "pt", "heat")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-9, err_msg=name)


def test_corner_solve_and_ke_select_paths():
    g, ins = _dsw_inputs(2)
    ref = _run_dsw(g, ins, in_kernel=False, nord_mask=None,
                   damp_v=0.06, d2_bg=0.0, d_con=0.0)
    got = _run_dsw(g, ins, in_kernel=True, nord_mask=None,
                   damp_v=0.06, d2_bg=0.0, d_con=0.0)
    for name in ("u", "v", "delp", "ke"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            rtol=1e-11, atol=1e-9, err_msg=name)
