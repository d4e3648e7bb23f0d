"""CMIP pressure-level diagnostics (GFDL_tools/fv_cmip_diag.F90 analog)."""

import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.io.cmip_diag import (PLEV19, PLEV8,
                                                      fv_cmip_diag)
from gfdl_atmos_cubed_sphere_tpu.io.diagnostics import DiagManager
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta
from gfdl_atmos_cubed_sphere_tpu.init.baroclinic import jw_baroclinic

NPX, NPZ = 13, 32


def test_cmip_diag_jw():
    g = build_grid_ops(NPX, dtype=jnp.float64)
    ks, ptop, ak, bk = set_eta(NPZ)
    ic = jw_baroclinic(g.geom, NPZ, ak, bk, ptop, perturb=True, moist=True)
    # convert virtual potential temperature IC convention to plain
    # temperature for the diag call: use pt as-is (diag treats it as T)
    pe = ptop + np.cumsum(np.asarray(ic["delp"]), axis=1)
    state = {k: jnp.asarray(ic[k]) for k in ("delp", "u", "v", "phis")}
    # build a realistic temperature field: isothermal-ish decay
    pmid = jnp.asarray(ptop + np.concatenate(
        [pe[:, :1] * 0.5, 0.5 * (pe[:, 1:] + pe[:, :-1])], axis=1)[:, :NPZ])
    state["pt"] = 230.0 + 60.0 * (pmid / 1.0e5)
    q = {"sphum": jnp.asarray(ic["sphum"])}

    dm = DiagManager()
    out = fv_cmip_diag(dm, state, q, g, ak, bk, ptop, plevs=PLEV19)

    n = NPX - 1
    assert out["ta"].shape == (6, len(PLEV19), n, n)
    # 500 hPa temperature within physical range where defined
    ta500 = np.asarray(out["ta500"])
    ok = np.isfinite(ta500)
    assert ok.any()
    assert 200.0 < ta500[ok].min() and ta500[ok].max() < 300.0
    # zg increases with altitude: index 10 (150 hPa) sits far above
    # index 3 (700 hPa)
    zg = np.asarray(out["zg"])
    fin = np.isfinite(zg[:, 3]) & np.isfinite(zg[:, 10])
    assert (zg[:, 10][fin] > zg[:, 3][fin]).mean() > 0.99
    # column water path positive, ps near 1000 hPa
    assert float(out["prw"].min()) >= 0.0
    assert abs(float(out["ps"].mean()) - 1.0e5) < 5e3
    # registry got the fields
    assert "cmip/ta" in dm._fields and "cmip/zg500" in dm._fields
    # plev8 variant runs too
    out8 = fv_cmip_diag(DiagManager(), state, q, g, ak, bk, ptop,
                        plevs=PLEV8)
    assert out8["ua"].shape[1] == len(PLEV8)
