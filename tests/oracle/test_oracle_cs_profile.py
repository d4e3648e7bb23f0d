"""Diff the vectorized cs_profile against the loop-literal Fortran
transcription over the kord/iv matrix."""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.ops import fv_mapz
from .mapz_oracle import cs_profile_col

pytestmark = pytest.mark.fast

KM = 32
NCOL = 16


def _cols(seed, positive=False, noise=0.25):
    """Smooth-ish profiles + noise: rough enough to hit every limiter
    branch, smooth enough that the large-scale clamp (whose exact-tie
    outcomes are masked) stays the exception."""
    rng = np.random.default_rng(seed)
    z = np.linspace(0, 3 * np.pi, KM)
    a1 = (np.sin(z)[None] * rng.uniform(1, 3, (NCOL, 1))
          + noise * rng.standard_normal((NCOL, KM))
          + 0.8 * noise * rng.standard_normal((NCOL, KM)).cumsum(axis=-1))
    if positive:
        a1 = np.abs(a1) + 0.01
        # small values + a few exact zeros for the PD branches (kept mild:
        # hard spikes make every interface clamp, which is all-tie)
        a1[:, ::5] *= 0.05
        a1[0, ::8] = 0.0
    if noise < 0.1:
        # near-uniform layer thicknesses: with jagged delp a profile smooth
        # in k is rough in p, so the spline legitimately overshoots (and
        # clamps, and ties) at every interface
        delp = rng.uniform(0.9, 1.1, (NCOL, KM))
    else:
        delp = rng.uniform(0.2, 2.0, (NCOL, KM))
    # bottom BC consistent with the profile (a detached random BC makes the
    # solve overshoot everywhere -> all interfaces clamp -> all ties)
    qs = a1[:, -1] * (1.0 + 0.2 * rng.standard_normal(NCOL))
    return a1, delp, qs


@pytest.mark.parametrize("kord", [4, 6, 8, 9, 10, 11, 12, 13, 14, 15, 17])
@pytest.mark.parametrize("iv", [1, 0, -1, -2])
def test_cs_profile_vs_oracle(kord, iv):
    # the iv=-2 (w) spline overshoots rough profiles everywhere, turning
    # every interface into a clamped exact tie: keep that variant smoother
    a1, delp, qs = _cols(kord * 101 + iv, positive=(iv == 0),
                         noise=0.03 if iv == -2 else 0.25)
    want_al = np.zeros_like(a1)
    want_ar = np.zeros_like(a1)
    want_a6 = np.zeros_like(a1)
    ok = np.zeros(a1.shape, bool)
    for c in range(NCOL):
        want_al[c], want_ar[c], want_a6[c], tie = cs_profile_col(
            a1[c], delp[c], qs[c], iv, kord, return_tie=True)
        # a knife-edge limiter branch at layer j affects j and (through the
        # neighbor-flag conditions of kord 9-12) j+-1: exclude those layers
        bad = tie | np.roll(tie, 1) | np.roll(tie, -1)
        ok[c] = ~bad
    assert ok.mean() > 0.4, "tie mask degenerate — test data too pathological"
    al, ar, a6 = fv_mapz.cs_profile(jnp.asarray(a1), jnp.asarray(delp),
                                    qs=jnp.asarray(qs), iv=iv, kord=kord)
    for got, want, name in ((al, want_al, "al"), (ar, want_ar, "ar"),
                            (a6, want_a6, "a6")):
        np.testing.assert_allclose(np.asarray(got)[ok], want[ok], rtol=1e-12,
                                   atol=1e-12, err_msg=name)
