"""Hydrostatic 3-D core tests: vertical coordinate, remap operators, and the
Jablonowski-Williamson steady state (the analog of the reference CI `hydro`
builds, .github/workflows: C96 baroclinic cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.ops import fv_mapz
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_hydro
from gfdl_atmos_cubed_sphere_tpu.model import sw_dynamics as swd
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic


def test_set_eta_tables():
    for km in (26, 32, 63):
        ks, ptop, ak, bk = set_eta(km)
        pe = ak + bk * 1.0e5
        assert np.all(np.diff(pe) > 0)
        assert bk[0] == 0.0 and abs(bk[-1] - 1.0) < 1e-12
        assert np.all(bk[:ks + 1] == 0.0)
        pe_min = ak + bk * 4.0e4        # still monotone at low surface p
        assert np.all(np.diff(pe_min) > 0)


def test_set_eta_var_hi():
    ks, ptop, ak, bk = set_eta(79)
    pe = ak + bk * 1.0e5
    assert np.all(np.diff(pe) > 0) and ptop == pytest.approx(ak[0])


def test_remap_conservation_and_monotonicity():
    km = 32
    rng = np.random.default_rng(0)
    pe1 = np.sort(rng.uniform(100.0, 1e5, (8, km + 1)), axis=-1)
    pe1[:, 0] = 100.0
    pe1[:, -1] = 1e5
    q = rng.uniform(0.0, 1.0, (8, km))
    pe2 = np.sort(rng.uniform(100.0, 1e5, (8, km + 1)), axis=-1)
    pe2[:, 0] = 100.0
    pe2[:, -1] = 1e5
    for kord in (8, 9, 10, 11, 13):
        q2 = fv_mapz.map1_ppm(jnp.asarray(q), jnp.asarray(pe1),
                              jnp.asarray(pe2), iv=0, kord=kord)
        m1 = (q * np.diff(pe1)).sum()
        m2 = (np.asarray(q2) * np.diff(pe2)).sum()
        assert abs(m2 - m1) / m1 < 1e-12, kord
        assert float(q2.min()) >= -1e-12, kord          # iv=0 positivity


def test_jw_steady_state():
    """Unperturbed JW (case 12) must remain close to balance for 2 days."""
    npx, npz = 25, 26
    g = build_grid_ops(npx, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(npz)
    ic = jw_baroclinic(g.geom, npz, ak, bk, ptop, perturb=False)
    swd.prepare_phis(g, ic["phis"])
    cfg = DynConfig(npx=npx, npz=npz, dt=1800.0, n_split=5)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)

    @jax.jit
    def step(delp, pt, u, v):
        r = fv_dynamics_hydro(delp, pt, u, v, None, g, cfg, akj, bkj, ptop)
        return r.delp, r.pt, r.u, r.v, r.ps

    d, p, u, v = map(jnp.asarray, (ic["delp"], ic["pt"], ic["u"], ic["v"]))
    area = jnp.asarray(g.geom.interior("area")[:, None])
    m0 = float((d * area).sum())
    d1, p1, u1, v1 = d, p, u, v
    for _ in range(96):                    # 2 days
        d1, p1, u1, v1, ps = step(d1, p1, u1, v1)
    assert not bool(jnp.isnan(p1).any())
    assert abs(float((d1 * area).sum()) - m0) / m0 < 1e-8    # dry air mass
    assert 205.0 < float(p1.min()) and float(p1.max()) < 315.0
    # surface pressure stays near 1000 hPa (coarse-grid adjustment only)
    assert float(jnp.abs(ps - 1.0e5).max()) < 500.0
    # interior winds stay near the balanced jet
    du = np.abs(np.asarray(u1 - u)).max(axis=(0, 2, 3))
    assert du[4:].max() < 8.0


def test_var_hi2_levels():
    """km > 79 level sets use the var_hi2 generator (fv_eta.F90:243-246):
    monotone hybrid coordinate with a hi-top and valid ks split."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    for km in (91, 96):
        ks, ptop, ak, bk = set_eta(km)
        pe = ak + bk * 1.0e5
        assert ptop == ak[0] and ptop <= 2.0          # hi-top (~1 Pa)
        assert np.all(np.diff(pe) > 0)
        assert np.all(bk[:ks + 1] == 0.0) and bk[-1] == 1.0
        assert abs(ak[-1]) < 1e-9
        # surface-adjacent layers thinner than ~60 hPa, top layers thin
        assert np.diff(pe)[-1] < 60.0e2


def test_beta_offcentered_pgrad_and_d_ext():
    """beta > 0 (grad1_p_update, dyn_core.F90:2033) and d_ext external-mode
    damping (:828-846, one_grad_p wk1/wk2): both run stably on the JW wave
    and stay close to the beta=0 solution (same PDE, different acoustic
    time-centering)."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_hydro
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

    NPX, NPZ = 25, 10
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    st0 = tuple(jnp.asarray(ic[k]) for k in ("delp", "pt", "u", "v"))

    outs = {}
    for name, kw in (("base", {}), ("beta", dict(beta=0.45)),
                     ("dext", dict(d_ext=0.02))):
        cfg = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=4, **kw)

        def step(delp, pt, u, v, cfg=cfg):
            r = fv_dynamics_hydro(delp, pt, u, v, None, g, cfg, akj, bkj,
                                  ptop)
            return r.delp, r.pt, r.u, r.v

        s = st0
        js = jax.jit(step)
        for _ in range(4):
            s = js(*s)
        for a in s:
            assert not bool(jnp.isnan(a).any()), name
        outs[name] = s

    for name in ("beta", "dext"):
        du = float(jnp.abs(outs[name][2] - outs["base"][2]).max())
        dpt = float(jnp.abs(outs[name][1] - outs["base"][1]).max())
        assert du < 1.0, (name, du)
        assert dpt < 1.0, (name, dpt)


def test_split_p_grad_nh_runs():
    """NH beta > 0 path (split_p_grad, dyn_core.F90:1795) stays stable and
    near the beta=0 (nh_p_grad) solution."""
    import numpy as np
    from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
    from gfdl_atmos_cubed_sphere_tpu.model.sw_dynamics import prepare_phis
    from gfdl_atmos_cubed_sphere_tpu.model.dyn_core import DynConfig
    from gfdl_atmos_cubed_sphere_tpu.model.fv_dynamics import fv_dynamics_nh
    from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
    from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

    NPX, NPZ = 25, 10
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True)
    prepare_phis(g, ic["phis"])
    dp0 = np.diff(ak) + np.diff(bk) * 1e5
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    st0 = tuple(jnp.asarray(ic[k])
                for k in ("delp", "pt", "u", "v", "w", "delz"))
    outs = {}
    for beta in (0.0, 0.4):
        cfg = DynConfig(npx=NPX, npz=NPZ, dt=600.0, n_split=4,
                        hydrostatic=False, beta=beta)

        def step(*s, cfg=cfg):
            r = fv_dynamics_nh(*s, None, g, cfg, akj, bkj, ptop, dp0)
            return r.delp, r.pt, r.u, r.v, r.w, r.delz

        s = st0
        js = jax.jit(step)
        for _ in range(3):
            s = js(*s)
        for a in s:
            assert not bool(jnp.isnan(a).any()), beta
        outs[beta] = s
    du = float(jnp.abs(outs[0.4][2] - outs[0.0][2]).max())
    assert du < 1.0, du
