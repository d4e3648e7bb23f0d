"""External initial conditions (component #22).

Re-implements the role of /root/reference/tools/external_ic.F90
(get_external_ic:94, get_ncep_ic:1206 etc.): ingest gridded lat-lon
analyses (NetCDF via scipy or plain arrays), horizontally interpolate to
the cube, vertically remap onto the model's hybrid ak/bk levels with the
monotone PPM operators, and construct the prognostic state (delp from ps,
D winds from lat-lon winds via the update_dwinds_phys scatter).
"""

import numpy as np
import jax.numpy as jnp

from .. import constants as con
from ..ops import fv_mapz


# ---- horizontal interpolation --------------------------------------------

def latlon_bilinear_weights(src_lon, src_lat, dst_lon, dst_lat):
    """Precompute bilinear interpolation (host, numpy): src_lon [NX]
    (radians, ascending, periodic), src_lat [NY] (ascending); dst arbitrary
    shape. Returns dict of indices/weights."""
    src_lon = np.asarray(src_lon)
    src_lat = np.asarray(src_lat)
    lon = np.mod(np.asarray(dst_lon), 2.0 * np.pi)
    lat = np.asarray(dst_lat)
    nx = src_lon.shape[0]

    i0 = np.searchsorted(src_lon, lon, side="right") - 1
    i0 = np.mod(i0, nx)
    i1 = np.mod(i0 + 1, nx)
    dlon = np.mod(src_lon[i1] - src_lon[i0], 2.0 * np.pi)
    wx = np.mod(lon - src_lon[i0], 2.0 * np.pi) / np.where(dlon == 0, 1, dlon)

    j0 = np.clip(np.searchsorted(src_lat, lat, side="right") - 1, 0,
                 src_lat.shape[0] - 2)
    j1 = j0 + 1
    wy = np.clip((lat - src_lat[j0]) / (src_lat[j1] - src_lat[j0]), 0.0, 1.0)
    return dict(i0=i0, i1=i1, j0=j0, j1=j1, wx=wx, wy=wy)


def interp_to_cube(field, w):
    """field [..., NY, NX] -> [..., dst_shape] with precomputed weights."""
    f = jnp.asarray(field)
    f00 = f[..., w["j0"], w["i0"]]
    f01 = f[..., w["j0"], w["i1"]]
    f10 = f[..., w["j1"], w["i0"]]
    f11 = f[..., w["j1"], w["i1"]]
    wx, wy = w["wx"], w["wy"]
    return ((1 - wy) * ((1 - wx) * f00 + wx * f01)
            + wy * ((1 - wx) * f10 + wx * f11))


# ---- vertical remap -------------------------------------------------------

def remap_column_field(field, pe_src, pe_dst, iv=1, kord=8):
    """Remap [..., Ksrc] layer field between interface-pressure sets via
    the monotone PPM operators (external_ic.F90 remap_xyz pattern)."""
    return fv_mapz.map1_ppm(field, pe_src, pe_dst, iv=iv, kord=kord)


def state_from_latlon_analysis(ana, geom, ak, bk, ptop, kord=8):
    """Build the model state from a lat-lon analysis dict:
      ana = {lon [NX] (rad), lat [NY] (rad), ps [NY,NX] (Pa),
             phis [NY,NX], t [Ks,NY,NX], sphum (optional),
             u [Ks,NY,NX], v [Ks,NY,NX],
             ak_src [Ks+1], bk_src [Ks+1]}  (source hybrid coordinate)
    Returns dict(delp, pt, u(D), v(D), phis, sphum?) on the cube."""
    lon_c = geom.interior("aglon")
    lat_c = geom.interior("aglat")
    w = latlon_bilinear_weights(ana["lon"], ana["lat"], lon_c, lat_c)

    ps = interp_to_cube(ana["ps"], w)                       # [6, n, n]
    phis = interp_to_cube(ana["phis"], w)
    K = len(ak) - 1
    Ks = len(ana["ak_src"]) - 1

    def src_pe(psd):
        aks = jnp.asarray(ana["ak_src"]).reshape((1,) * psd.ndim + (-1,))
        bks = jnp.asarray(ana["bk_src"]).reshape((1,) * psd.ndim + (-1,))
        return aks + bks * psd[..., None]

    def dst_pe(psd):
        akd = jnp.asarray(ak).reshape((1,) * psd.ndim + (-1,))
        bkd = jnp.asarray(bk).reshape((1,) * psd.ndim + (-1,))
        return akd + bkd * psd[..., None]

    pe1 = src_pe(ps)                                        # [6,n,n,Ks+1]
    pe2 = dst_pe(ps)
    delp = jnp.moveaxis(pe2[..., 1:] - pe2[..., :-1], -1, 1)

    def remap(name, iv):
        f = interp_to_cube(jnp.asarray(ana[name]), w)   # [Ks, 6, n, n]
        f = jnp.moveaxis(f, 0, -1)                      # [6, n, n, Ks]
        out = remap_column_field(f, pe1, pe2, iv=iv, kord=kord)
        return jnp.moveaxis(out, -1, 1)                     # [6, K, n, n]

    pt = remap("t", iv=1)
    out = dict(delp=delp, pt=pt, phis=phis[:, None], ps=ps[:, None])
    if "sphum" in ana:
        out["sphum"] = remap("sphum", iv=0)

    # lat-lon winds -> A-grid centers -> D grid via the phys-wind scatter
    ua = remap("u", iv=-1)
    va = remap("v", iv=-1)
    out["ua"] = ua
    out["va"] = va
    return out


def d_winds_from_latlon(ua, va, g):
    """A-grid lat-lon winds -> D-grid covariant winds using the
    update_dwinds_phys projection with zero initial winds."""
    from ..model.fv_update_phys import update_dwinds_phys
    n = g.n
    K = ua.shape[1]
    u0 = jnp.zeros((6, K, n + 1, n), ua.dtype)
    v0 = jnp.zeros((6, K, n, n + 1), ua.dtype)
    return update_dwinds_phys(u0, v0, ua, va, g, dt=1.0)


def read_latlon_netcdf(path, names=None):
    """Read a lat-lon analysis NetCDF3 file into the `ana` dict layout."""
    from scipy.io import netcdf_file
    names = names or {}
    out = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for key, var in f.variables.items():
            out[names.get(key, key)] = np.array(var[:])
    return out
