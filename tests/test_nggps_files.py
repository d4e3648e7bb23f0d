"""Real NGGPS/chgres tile-file ingestion (external_ic.F90 get_nggps_ic:290,
remap_scalar:1206+): gfs_ctrl.nc + gfs_data.tile{1..6}.nc layout, terrain
surface-pressure adjustment, face-wind -> D-grid rotation."""

import numpy as np
import pytest
import jax.numpy as jnp

import gfdl_atmos_cubed_sphere_tpu.constants as con
from gfdl_atmos_cubed_sphere_tpu.io import external_ic as eic
from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.grid.fv_eta import set_eta

pytestmark = pytest.mark.fast

N = 12
KS = 20            # source levels
T0 = 280.0
P00 = 1.0e5


def _write_files(tmpdir, geom):
    """Synthetic chgres cold-start set: isothermal atmosphere over flat
    source terrain, uniform 10 m/s zonal face winds."""
    from scipy.io import netcdf_file
    aks = np.linspace(100.0, 0.0, KS + 1)
    bks = np.linspace(0.0, 1.0, KS + 1) ** 1.3
    with netcdf_file(str(tmpdir / "gfs_ctrl.nc"), "w") as f:
        f.createDimension("levsp", KS + 1)
        f.createDimension("nvcoord", 2)
        v = f.createVariable("vcoord", "d", ("nvcoord", "levsp"))
        v[0, :] = aks
        v[1, :] = bks

    H = con.RDGAS * T0 / con.GRAV
    ps = np.full((6, N, N), P00)
    pe = (aks.reshape(1, -1, 1, 1) + bks.reshape(1, -1, 1, 1)
          * ps[:, None])
    zh = H * np.log(P00 / np.maximum(pe, 1.0))        # isothermal heights
    for t in range(6):
        with netcdf_file(str(tmpdir / f"gfs_data.tile{t + 1}.nc"),
                         "w") as f:
            f.createDimension("lev", KS)
            f.createDimension("levp", KS + 1)
            f.createDimension("lat", N)
            f.createDimension("lon", N)
            f.createDimension("latp", N + 1)
            f.createDimension("lonp", N + 1)
            f.createVariable("ps", "d", ("lat", "lon"))[:] = ps[t]
            f.createVariable("zh", "d", ("levp", "lat", "lon"))[:] = zh[t]
            f.createVariable("sphum", "d", ("lev", "lat", "lon"))[:] = \
                np.full((KS, N, N), 1.0e-3)
            f.createVariable("o3mr", "d", ("lev", "lat", "lon"))[:] = \
                np.full((KS, N, N), 1.0e-7)
            f.createVariable("u_s", "d", ("lev", "latp", "lon"))[:] = \
                np.full((KS, N + 1, N), 10.0)
            f.createVariable("v_s", "d", ("lev", "latp", "lon"))[:] = 0.0
            f.createVariable("u_w", "d", ("lev", "lat", "lonp"))[:] = \
                np.full((KS, N, N + 1), 10.0)
            f.createVariable("v_w", "d", ("lev", "lat", "lonp"))[:] = 0.0
    return aks, bks, ps, zh


def test_nggps_file_roundtrip_and_terrain_ps(tmp_path):
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    aks, bks, ps, zh = _write_files(tmp_path, g.geom)
    data = eic.read_nggps_tiles(str(tmp_path))
    np.testing.assert_allclose(data["ak_src"], aks)
    np.testing.assert_allclose(data["bk_src"], bks)
    assert data["zh"].shape == (6, KS + 1, N, N)

    # terrain adjustment: a 500 m model mountain under an isothermal column
    # must match the barometric formula
    phis = np.zeros((6, N, N))
    phis[0, 5, 5] = con.GRAV * 500.0
    ps_adj = eic.adjust_ps_to_terrain(phis, zh, ps, aks, bks)
    H = con.RDGAS * T0 / con.GRAV
    expect = P00 * np.exp(-500.0 / H)
    np.testing.assert_allclose(ps_adj[0, 5, 5], expect, rtol=2e-3)
    np.testing.assert_allclose(ps_adj[phis == 0.0], P00, rtol=1e-6)


def test_nggps_full_cold_start(tmp_path):
    npz = 15
    g = build_grid_ops(N + 1, dtype=jnp.float64)
    _write_files(tmp_path, g.geom)
    ks, ptop, ak, bk = set_eta(npz)
    out = eic.get_nggps_ic_files(str(tmp_path), g.geom, ak, bk, ptop)
    assert out["delp"].shape == (6, npz, N, N)
    assert out["u"].shape == (6, npz, N + 1, N)
    assert out["v"].shape == (6, npz, N, N + 1)
    # temperature derived from hydrostatic thickness ~ isothermal T0
    pt = np.asarray(out["pt"])
    assert abs(np.median(pt) - T0) < 5.0
    # uniform westerly: the equatorial row of tile 0's D-grid u ~ +10
    ueq = np.asarray(out["u"])[0, npz // 2, N // 2, :]
    assert np.abs(ueq - 10.0).max() < 1.5
    # delz negative, finite everywhere
    assert (np.asarray(out["delz"]) < 0).all()
    for k in ("delp", "pt", "u", "v", "delz", "sphum"):
        assert np.isfinite(np.asarray(out[k])).all(), k
