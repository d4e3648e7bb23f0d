"""Diff the vectorized JAX xppm/yppm against the loop-literal Fortran
transcription (tests/oracle/tpcore_oracle.py) across every hord scheme
variant, with and without cube-edge stencils. f64, 1e-12."""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.ops import tp_core
from .tpcore_oracle import xppm_row

pytestmark = pytest.mark.fast

N = 24
NROWS = 8
IORDS = [1, 2, 3, 4, 5, -5, 6, 7, 8, 9, 10, 11, 12, 13]


def _rows(seed, smooth=False):
    rng = np.random.default_rng(seed)
    if smooth:
        x = np.linspace(0, 2 * np.pi, N + 6)
        q = (1.0 + 0.5 * np.sin(3 * x)[None]
             + 0.05 * rng.standard_normal((NROWS, N + 6)))
    else:
        q = rng.standard_normal((NROWS, N + 6))
    c = rng.uniform(-0.9, 0.9, (NROWS, N + 1))
    # a few exact zeros to hit the c==0 branch boundary
    c[:, ::7] = 0.0
    dxa = rng.uniform(0.5, 1.5, (NROWS, N + 6))
    return q, c, dxa


@pytest.mark.parametrize("iord", IORDS)
@pytest.mark.parametrize("edges", [True, False])
def test_xppm_vs_oracle(iord, edges):
    q, c, dxa, = _rows(42 + iord)
    want = np.stack([
        xppm_row(q[r], c[r], dxa[r], iord, lim_fac=1.0, edges=edges)
        for r in range(NROWS)])
    got = np.asarray(tp_core.xppm(jnp.asarray(q), jnp.asarray(c),
                                  jnp.asarray(dxa), iord, lim_fac=1.0,
                                  edges=edges))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("iord", [5, 8, 10, 13])
def test_xppm_vs_oracle_smooth(iord):
    """Smooth fields exercise the non-limited branches."""
    q, c, dxa = _rows(7, smooth=True)
    want = np.stack([
        xppm_row(q[r], c[r], dxa[r], iord, edges=True)
        for r in range(NROWS)])
    got = np.asarray(tp_core.xppm(jnp.asarray(q), jnp.asarray(c),
                                  jnp.asarray(dxa), iord, edges=True))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("iord", [6, 8, 9])
def test_yppm_matches_xppm_transposed(iord):
    """yppm is the axis=-2 variant of the same operator."""
    q, c, dxa = _rows(3)
    fx = np.asarray(tp_core.xppm(jnp.asarray(q), jnp.asarray(c),
                                 jnp.asarray(dxa), iord, edges=True))
    fy = np.asarray(tp_core.yppm(jnp.asarray(q.T), jnp.asarray(c.T),
                                 jnp.asarray(dxa.T), iord, edges=True))
    np.testing.assert_allclose(fy.T, fx, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("jord", IORDS)
@pytest.mark.parametrize("edges", [True, False])
def test_yppm_vs_native_oracle(jord, edges):
    """The repo's yppm called NATIVELY (axis=-2, no transpose) against the
    independent j-indexed transcription of tp_core.F90 yppm:715."""
    from .tpcore_oracle import yppm_col
    q, c, dxa = _rows(137 + jord)
    # treat rows as columns: fields [NY, ncols]
    qc = q.T.copy()          # [N+6, NROWS]
    cc = c.T.copy()          # [N+1, NROWS]
    dyac = dxa.T.copy()
    want = np.stack([
        yppm_col(qc[:, r], cc[:, r], dyac[:, r], jord, lim_fac=1.0,
                 edges=edges)
        for r in range(NROWS)], axis=1)
    got = np.asarray(tp_core.yppm(jnp.asarray(qc), jnp.asarray(cc),
                                  jnp.asarray(dyac), jord, lim_fac=1.0,
                                  edges=edges))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
