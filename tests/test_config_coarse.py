"""Config/namelist system (#5) and coarse graining (#27)."""

import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.utils.config import (
    parse_namelist, dyn_config_from_namelist, mp_config_from_namelist)
from gfdl_atmos_cubed_sphere_tpu.utils import coarse_graining as cg

NML = """
&fv_core_nml
    npx = 97
    npz = 32        ! levels
    hord_mt = 6
    hord_tm = 6
    kord_tm = -9
    n_split = 6
    k_split = 2
    do_vort_damp = .T.
    vtdm4 = 0.06
    consv_te = 1.
    d2_bg_k1 = 0.2
    tau = 10.
/
&gfdl_mp_nml
    tau_l2v = 225.
    ql0_max = 1.0e-3
    do_sedi_heat = .false.
/
"""


def test_namelist_parse_and_config():
    nml = parse_namelist(NML)
    assert nml["fv_core_nml"]["npx"] == 97
    assert nml["fv_core_nml"]["do_vort_damp"] is True
    cfg, unknown = dyn_config_from_namelist(nml, dt=450.0)
    assert cfg.npx == 97 and cfg.npz == 32
    assert cfg.hord_mt == 6 and cfg.kord_tm == -9
    assert cfg.n_split == 6 and cfg.k_split == 2
    assert cfg.vtdm4 == 0.06 and cfg.consv_te == 1.0 and cfg.tau == 10.0
    assert not unknown
    mpc, unk2 = mp_config_from_namelist(nml)
    assert mpc.tau_l2v == 225.0 and mpc.ql0_max == 1.0e-3
    assert mpc.do_sedi_heat is False
    assert not unk2


def test_coarse_graining_ops():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(6, 3, 8, 8)))
    area = jnp.asarray(rng.uniform(0.5, 1.5, (6, 1, 8, 8)))
    m = cg.block_area_weighted_mean(f, area, 2)
    assert m.shape == (6, 3, 4, 4)
    # uniform field stays uniform under any weighting
    u = cg.block_area_weighted_mean(jnp.ones_like(f), area, 2)
    np.testing.assert_allclose(np.asarray(u), 1.0, rtol=1e-12)
    # sum conserves totals
    s = cg.block_sum(f, 4)
    np.testing.assert_allclose(float(s.sum()), float(f.sum()), rtol=1e-12)
    assert float(cg.block_min(f, 2).max()) <= float(cg.block_max(f, 2).max())
    # mode of a constant class field
    cls = jnp.zeros((6, 8, 8), dtype=jnp.int32)
    md = cg.block_mode(cls, 2, 3)
    assert int(md.max()) == 0
    # masked mean falls back to fill when block fully masked out
    mask = jnp.zeros_like(f, dtype=bool)
    mm = cg.block_masked_area_mean(f, area, mask, 2, fill=7.0)
    np.testing.assert_allclose(np.asarray(mm), 7.0)
