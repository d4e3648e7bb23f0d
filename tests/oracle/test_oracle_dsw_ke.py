"""Diff the vectorized d_sw KE stage (ops/sw_core.ke_section + its
xtp_u/ytp_v sweeps) against the loop-literal transcription of
sw_core.F90:1077-1228 / xtp_u:2154 / ytp_v:2524 on a real C12 tile.
f64, 1e-12."""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.ops import sw_core
from .csw_oracle import FA2
from .dsw_oracle import ke_stage_ref, xtp_u_ref, ytp_v_ref

pytestmark = pytest.mark.fast

H = 3


def _setup(npx=13, seed=9):
    n = npx - 1
    g = build_grid_ops(npx, dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    NC = n + 2 * H
    NW = n + 1 + 2 * H
    u = jnp.asarray(rng.standard_normal((6, 1, NW, NC)) * 10)
    v = jnp.asarray(rng.standard_normal((6, 1, NC, NW)) * 10)
    uc = jnp.asarray(rng.standard_normal((6, 1, NC, NW)) * 10)
    vc = jnp.asarray(rng.standard_normal((6, 1, NW, NC)) * 10)
    ut = jnp.asarray(rng.standard_normal((6, 1, NC, NW)) * 10)
    vt = jnp.asarray(rng.standard_normal((6, 1, NW, NC)) * 10)
    return g, u, v, uc, vc, ut, vt


@pytest.mark.parametrize("hord", [6, 8, 10])
def test_ke_section_vs_oracle(hord):
    npx = 13
    g, u, v, uc, vc, ut, vt = _setup(npx, seed=40 + hord)
    dt = 60.0
    ke = sw_core.ke_section(u, v, uc, vc, ut, vt, g.cosa, g.rsina,
                            g.dx, g.rdx, g.dy, g.rdy, dt, hord, 1.0,
                            npx, edges=True)
    t = 0
    f2 = lambda a, li, lj: FA2.from_np(np.asarray(a)[t, 0], li, lj)
    gg = dict(cosa=f2(g.cosa, -2, -2), rsina=f2(g.rsina, -2, -2),
              dx=f2(g.dx, -2, -2), rdx=f2(g.rdx, -2, -2),
              dy=f2(g.dy, -2, -2), rdy=f2(g.rdy, -2, -2))
    ref = ke_stage_ref(f2(u, -2, -2), f2(v, -2, -2), f2(uc, -2, -2),
                       f2(vc, -2, -2), f2(ut, -2, -2), f2(vt, -2, -2),
                       gg, npx, dt, hord)
    got = np.asarray(ke)[t, 0][3:npx + 3, 3:npx + 3]
    want = ref.to_np(1, npx, 1, npx)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)
