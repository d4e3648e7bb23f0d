"""The a2b_ord4 Pallas kernel must reproduce the XLA path exactly
(interpret mode, f64, CPU; reference /root/reference/model/a2b_edge.F90
a2b_ord4:47)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.ops.a2b_edge import a2b_ord4, fi
from gfdl_atmos_cubed_sphere_tpu.ops.pallas_a2b import a2b_ord4_pallas

pytestmark = pytest.mark.fast


def test_pallas_a2b_interpret_matches_xla():
    npx = 17
    n = npx - 1
    g = build_grid_ops(npx, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((6, 5, n, n)))   # K+1=5 interfaces
    q_p = g.halo.pad_cell(q)
    ref = np.asarray(a2b_ord4(q_p, g))
    got = np.asarray(jax.jit(
        lambda: a2b_ord4_pallas(q_p, g, interpret=True))())
    wsl = slice(fi(1), fi(npx) + 1)
    np.testing.assert_allclose(got[..., wsl, wsl], ref[..., wsl, wsl],
                               rtol=1e-12, atol=1e-12)
