"""AtmosState pytree container (fv_arrays.F90 fv_atmos_type analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.model.fv_arrays import AtmosState


pytestmark = pytest.mark.fast


def _mk(n=4, K=3):
    r = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(r.normal(size=s))
    return AtmosState(delp=f(6, K, n, n), pt=f(6, K, n, n),
                      u=f(6, K, n + 1, n), v=f(6, K, n, n + 1),
                      q={"sphum": f(6, K, n, n)})


def test_pytree_roundtrip_and_jit():
    st = _mk()
    leaves, treedef = jax.tree.flatten(st)
    assert len(leaves) == 5
    st2 = jax.tree.unflatten(treedef, leaves)
    assert float(jnp.abs(st2.delp - st.delp).max()) == 0.0

    @jax.jit
    def bump(s: AtmosState):
        return s.replace(pt=s.pt + 1.0)

    out = bump(st)
    np.testing.assert_allclose(np.asarray(out.pt), np.asarray(st.pt) + 1.0)
    assert out.hydrostatic


def test_dict_conversions_and_checksum():
    st = _mk()
    d = st.to_dict()
    assert "w" not in d and "q" in d
    st2 = AtmosState.from_dict(d)
    cs1, cs2 = st.checksum(), st2.checksum()
    assert cs1 == cs2
    assert "q/sphum" in cs1
    st3 = st.replace(pt=st.pt + 1e-7)
    assert st3.checksum()["pt"] != cs1["pt"]
