"""Diff the vectorized a2b_ord4 against the loop-literal Fortran
transcription (a2b_oracle.py) on a real C12 cube geometry. f64, 1e-12."""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.ops.a2b_edge import a2b_ord4, fi
from .a2b_oracle import a2b_ord4_face

pytestmark = pytest.mark.fast

H = 3


def test_a2b_ord4_vs_oracle():
    npx = 13
    n = npx - 1
    g = build_grid_ops(npx, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((6, 2, n, n)))
    q_p = g.halo.pad_cell(q)

    got = np.asarray(a2b_ord4(q_p, g))

    dxa = np.asarray(g.dxa)[:, 0]
    dya = np.asarray(g.dya)[:, 0]
    cw = np.asarray(g.a2b_corner_w)[:, 0]          # [6, 4, 3]
    # edge factors stored on the f wall index grid ([n+1] entries 0..npx)
    for t in range(6):
        ew = np.asarray(g.edge_w)[t, 0]
        ee = np.asarray(g.edge_e)[t, 0]
        es = np.asarray(g.edge_s)[t, 0]
        en = np.asarray(g.edge_n)[t, 0]
        for k in range(2):
            want = a2b_ord4_face(np.asarray(q_p)[t, k], dxa[t], dya[t],
                                 ew, ee, es, en, cw[t])
            wsl = slice(fi(1), fi(npx) + 1)
            np.testing.assert_allclose(
                got[t, k][wsl, wsl], want[wsl, wsl],
                rtol=1e-12, atol=1e-12,
                err_msg=f"tile {t} level {k}")


def test_mapn_tracer_matches_map1_ppm():
    """mapn_tracer's shared-weight batched-matmul remap must equal the
    per-tracer map1_ppm path (fv_operators.F90 mapn_tracer:234 vs
    map1_q2)."""
    import jax
    from gfdl_atmos_cubed_sphere_tpu.ops import fv_mapz
    rng = np.random.default_rng(5)
    B, km, nq = 7, 20, 4
    dp1 = rng.uniform(0.5, 2.0, (B, km))
    pe1 = np.concatenate([np.zeros((B, 1)), np.cumsum(dp1, -1)], -1) + 10.0
    w2 = rng.uniform(0.5, 2.0, (B, km))
    pe2 = np.concatenate([np.zeros((B, 1)), np.cumsum(w2, -1)], -1)
    pe2 = pe1[:, :1] + (pe2 / pe2[:, -1:]) * (pe1[:, -1:] - pe1[:, :1])
    qs = np.abs(rng.standard_normal((nq, B, km))) + 0.01
    got = np.asarray(fv_mapz.mapn_tracer(jnp.asarray(qs), jnp.asarray(pe1),
                                         jnp.asarray(pe2), kord=8))
    for i in range(nq):
        want = np.asarray(fv_mapz.map1_ppm(jnp.asarray(qs[i]),
                                           jnp.asarray(pe1),
                                           jnp.asarray(pe2), iv=0, kord=8))
        np.testing.assert_allclose(got[i], want, rtol=1e-12, atol=1e-12)
    # conservation: total mass per column preserved
    m1 = (qs * dp1[None]).sum(-1)
    m2 = (got * (pe2[:, 1:] - pe2[:, :-1])[None]).sum(-1)
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
