"""Config/namelist system (#5) and coarse graining (#27)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfdl_atmos_cubed_sphere_tpu.utils.config import (
    parse_namelist, dyn_config_from_namelist, mp_config_from_namelist)
from gfdl_atmos_cubed_sphere_tpu.utils import coarse_graining as cg

pytestmark = pytest.mark.fast


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


# A realistic SHiELD C768L91 forecast fv_core_nml (typical public SHiELD
# config values) — every option must be consumed: mapped onto DynConfig,
# routed to its owning subsystem, or rejected loudly; nothing silent.
SHIELD_NML = """
&fv_core_nml
       layout   = 8,8
       io_layout = 1,1
       npx      = 769
       npy      = 769
       ntiles   = 6
       npz      = 91
       npz_type = ''
       grid_type = 0
       make_nh = .F.
       fv_debug = .F.
       range_warn = .T.
       reset_eta = .F.
       n_sponge = 9
       nudge_qv = .T.
       tau = 5.
       rf_cutoff = 7.5e2
       d2_bg_k1 = 0.20
       d2_bg_k2 = 0.15
       kord_tm = -9
       kord_mt = 9
       kord_wz = 9
       kord_tr = 9
       hydrostatic = .F.
       phys_hydrostatic = .F.
       use_hydro_pressure = .F.
       beta = 0.
       a_imp = 1.
       p_fac = 0.1
       k_split = 1
       n_split = 8
       nwat = 6
       na_init = 1
       d_ext = 0.0
       dnats = 1
       fv_sg_adj = 600
       d2_bg = 0.
       nord = 2
       dddmp = 0.2
       d4_bg = 0.12
       vtdm4 = 0.02
       delt_max = 0.002
       ke_bg = 0.
       do_vort_damp = .T.
       external_ic = .T.
       external_eta = .T.
       gfs_phil = .F.
       nggps_ic = .T.
       mountain = .F.
       ncep_ic = .F.
       d_con = 1.
       hord_mt = 5
       hord_vt = 5
       hord_tm = 5
       hord_dp = -5
       hord_tr = 8
       adjust_dry_mass = .F.
       consv_te = 1.
       consv_am = .F.
       fill = .T.
       dwind_2d = .F.
       print_freq = 6
       warm_start = .F.
       no_dycore = .F.
       z_tracer = .T.
       agrid_vel_rst = .T.
       read_increment = .F.
       res_latlon_dynamics = "fv3_increment.nc"
/
"""


def test_shield_namelist_roundtrip():
    """Round-4 VERDICT item 10: a real SHiELD input.nml maps fully — no
    silently-dropped options, DynConfig carries the values, routed options
    name their owning subsystem, unsupported ones raise under strict."""
    nml = parse_namelist(SHIELD_NML)
    cfg, unknown = dyn_config_from_namelist(nml, dt=150.0)
    routed = unknown.pop("_routed", {})
    # hord_dp = -5 is the reference's "negative => use abs, positive-definite
    # delp" convention — accepted as-is
    assert cfg.npx == 769 and cfg.npz == 91 and cfg.n_split == 8
    assert cfg.nwat == 6 and cfg.dnats == 1 and cfg.fv_sg_adj == 600
    assert cfg.kord_wz == 9 and cfg.delt_max == 0.002
    assert cfg.range_warn and cfg.nudge_qv and not cfg.hydrostatic
    assert cfg.dddmp == 0.2 and cfg.d_con == 1.0 and cfg.consv_te == 1.0
    # routed options point at their owning subsystem
    for name in ("layout", "nggps_ic", "external_ic", "grid_type"):
        assert name in routed, (name, routed)
    # the only leftovers are recognized-unsupported or F90-side physics
    # coupler options — and each is named, not silently dropped
    # make_nh/add_noise/reset_eta route to io.restart startup helpers
    allowed_left = {"phys_hydrostatic", "use_hydro_pressure"}
    assert set(unknown) <= allowed_left, unknown
    # strict mode rejects unimplemented behavior loudly
    import pytest
    with pytest.raises(ValueError, match="hybrid_z"):
        dyn_config_from_namelist({"fv_core_nml": {"hybrid_z": True,
                                                  "npx": 13, "npz": 10}},
                                 strict=True, dt=30.0)
    # nwat validation
    with pytest.raises(ValueError, match="nwat"):
        dyn_config_from_namelist({"fv_core_nml": {"nwat": 4, "npx": 13,
                                                  "npz": 10}}, dt=30.0)
