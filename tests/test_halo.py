"""Halo exchange validation against independently computed geometry.

The decisive test: halo values gathered from neighbor tiles must equal the
analytic field evaluated at the geometric positions of the halo cells (which
the metrics module computed independently from halo-extended corner
coordinates). This validates index maps, orientations, component rotations
and signs — the analog of the reference's layout-invariance contract
(SURVEY.md §4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gfdl_atmos_cubed_sphere_tpu.grid.metrics import build_grid_geometry
from gfdl_atmos_cubed_sphere_tpu.parallel.halo import HaloExchanger, copy_corners


@pytest.fixture(scope="module")
def geom():
    return build_grid_geometry(25)       # C24


@pytest.fixture(scope="module")
def hx(geom):
    return HaloExchanger(geom.topology, geom.ng)


def _f(lon, lat):
    return np.sin(2 * lon) * np.cos(3 * lat) + 0.5 * np.sin(lat)


def test_scalar_halo(geom, hx):
    h, n = geom.ng, geom.n
    lon, lat = geom.aglon, geom.aglat            # padded [6, n+2h, n+2h]
    q = jnp.asarray(_f(lon, lat)[:, h:-h, h:-h])
    qp = np.asarray(hx.pad_cell(q))
    expected = _f(lon, lat)
    # valid everywhere except h x h corner blocks
    mask = np.ones_like(expected, bool)
    for js in (slice(0, h), slice(n + h, None)):
        for isl in (slice(0, h), slice(n + h, None)):
            mask[:, js, isl] = False
    assert np.allclose(qp[mask], expected[mask], atol=1e-6)


def test_scalar_halo_batched(geom, hx):
    h, n = geom.ng, geom.n
    lon, lat = geom.aglon, geom.aglat
    q0 = _f(lon, lat)[:, h:-h, h:-h]
    q = jnp.stack([jnp.asarray(q0), jnp.asarray(2 * q0)], axis=1)  # [6,2,n,n]
    qp = np.asarray(hx.pad_cell(q))
    assert qp.shape == (6, 2, n + 2 * h, n + 2 * h)
    assert np.allclose(qp[:, 1], 2 * qp[:, 0], atol=1e-6)


def test_corner_point_halo(geom, hx):
    h, n = geom.ng, geom.n
    lon, lat = geom.lon, geom.lat                # padded corners
    q = jnp.asarray(_f(lon, lat)[:, h:-h, h:-h])
    qp = np.asarray(hx.pad_corner(q))
    expected = _f(lon, lat)
    mask = np.ones_like(expected, bool)
    for js in (slice(0, h), slice(n + 1 + h, None)):
        for isl in (slice(0, h), slice(n + 1 + h, None)):
            mask[:, js, isl] = False
    assert np.allclose(qp[mask], expected[mask], atol=1e-6)


def _analytic_wind(xyz):
    """A smooth 3-D vector field tangent to the sphere (rigid rotation about
    a tilted axis plus a deformation)."""
    axis = np.array([0.3, -0.2, 0.93])
    w = np.cross(np.broadcast_to(axis, xyz.shape), xyz)
    axis2 = np.array([0.8, 0.5, 0.1])
    w2 = np.cross(np.broadcast_to(axis2, xyz.shape), xyz) * xyz[..., 2:3]
    return w + 0.3 * w2


def test_dgrid_vector_halo(geom, hx):
    """D-grid u/v halos must match the analytic wind projected on the
    independently computed wall tangent vectors (es/ew from metrics)."""
    h, n = geom.ng, geom.n
    # wall midpoints & tangents (padded, f64, from metrics)
    es = geom.es        # [6, n+1+2h, n+2h, 2, 3]; comp 0 = along-x tangent
    ew = geom.ew        # [6, n+2h, n+1+2h, 2, 3]; comp 1 = along-y tangent
    gxyz = geom.grid_xyz
    ymid = gxyz[:, :, :-1] + gxyz[:, :, 1:]
    ymid /= np.linalg.norm(ymid, axis=-1, keepdims=True)   # y-wall midpoints
    xmid = gxyz[:, :-1, :] + gxyz[:, 1:, :]
    xmid /= np.linalg.norm(xmid, axis=-1, keepdims=True)   # x-wall midpoints
    u_full = np.sum(_analytic_wind(ymid) * es[..., 0, :], axis=-1)
    v_full = np.sum(_analytic_wind(xmid) * ew[..., 1, :], axis=-1)
    u = jnp.asarray(u_full[:, h:-h, h:-h])    # [6, n+1, n]
    v = jnp.asarray(v_full[:, h:-h, h:-h])    # [6, n, n+1]
    up, vp = hx.pad_dgrid(u, v)
    up, vp = np.asarray(up), np.asarray(vp)
    # compare on halo strips (not corner blocks, not shared-edge self rows)
    mask_u = np.zeros(u_full.shape, bool)
    mask_u[:, h:-h, :h] = True
    mask_u[:, h:-h, n + h:] = True
    mask_u[:, :h, h:-h] = True
    mask_u[:, n + 1 + h:, h:-h] = True
    assert np.allclose(up[mask_u], u_full[mask_u], atol=1e-6), (
        np.abs(up[mask_u] - u_full[mask_u]).max())
    mask_v = np.zeros(v_full.shape, bool)
    mask_v[:, h:-h, :h] = True
    mask_v[:, h:-h, n + 1 + h:] = True
    mask_v[:, :h, h:-h] = True
    mask_v[:, n + h:, h:-h] = True
    assert np.allclose(vp[mask_v], v_full[mask_v], atol=1e-6), (
        np.abs(vp[mask_v] - v_full[mask_v]).max())


def test_cgrid_vector_halo(geom, hx):
    """C-grid uc/vc: x-wind on x-walls, y-wind on y-walls. Components are
    normal to the wall segments — exercises the component-vs-segment sign
    logic."""
    h, n = geom.ng, geom.n
    ew = geom.ew        # x-walls; comp 0 = along-x unit vector
    es = geom.es        # y-walls; comp 1 = along-y unit vector
    gxyz = geom.grid_xyz
    ymid = gxyz[:, :, :-1] + gxyz[:, :, 1:]
    ymid /= np.linalg.norm(ymid, axis=-1, keepdims=True)
    xmid = gxyz[:, :-1, :] + gxyz[:, 1:, :]
    xmid /= np.linalg.norm(xmid, axis=-1, keepdims=True)
    uc_full = np.sum(_analytic_wind(xmid) * ew[..., 0, :], axis=-1)  # x-wind
    vc_full = np.sum(_analytic_wind(ymid) * es[..., 1, :], axis=-1)  # y-wind
    uc = jnp.asarray(uc_full[:, h:-h, h:-h])   # [6, n, n+1]
    vc = jnp.asarray(vc_full[:, h:-h, h:-h])   # [6, n+1, n]
    ucp, vcp = hx.pad_cgrid(uc, vc)
    ucp, vcp = np.asarray(ucp), np.asarray(vcp)
    mask_uc = np.zeros(uc_full.shape, bool)
    mask_uc[:, h:-h, :h] = True
    mask_uc[:, h:-h, n + 1 + h:] = True
    mask_uc[:, :h, h:-h] = True
    mask_uc[:, n + h:, h:-h] = True
    assert np.allclose(ucp[mask_uc], uc_full[mask_uc], atol=1e-6), (
        np.abs(ucp[mask_uc] - uc_full[mask_uc]).max())
    mask_vc = np.zeros(vc_full.shape, bool)
    mask_vc[:, h:-h, :h] = True
    mask_vc[:, h:-h, n + h:] = True
    mask_vc[:, :h, h:-h] = True
    mask_vc[:, n + 1 + h:, h:-h] = True
    assert np.allclose(vcp[mask_vc], vc_full[mask_vc], atol=1e-6), (
        np.abs(vcp[mask_vc] - vc_full[mask_vc]).max())


def test_copy_corners_sources(geom, hx):
    """copy_corners must fill corner blocks from valid halo/interior data."""
    h, n = geom.ng, geom.n
    q = jnp.asarray(np.random.default_rng(0).normal(size=(6, n, n)))
    qp = hx.pad_cell(q)
    # poison the corner blocks, then fill
    P = n + 2 * h
    qp = np.array(qp)
    for js in (slice(0, h), slice(P - h, None)):
        for isl in (slice(0, h), slice(P - h, None)):
            qp[:, js, isl] = np.nan
    for d in (1, 2):
        filled = np.asarray(copy_corners(jnp.asarray(qp), h, d))
        assert np.isfinite(filled).all(), f"direction {d} leaves NaNs"
