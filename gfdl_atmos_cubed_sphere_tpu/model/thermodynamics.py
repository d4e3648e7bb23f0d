"""Thermodynamics / energetics (component #13).

Re-implements /root/reference/model/fv_thermodynamics.F90 (moist_cv/cp,
compute_total_energy:43) and the total-energy fixer bookkeeping of
fv_mapz.F90:644-772 with the identical column formulas, so entry/exit
energies are directly comparable.

Moist path: constant-kappa virtual-temperature thermodynamics (the 202411
`fv_thermo_nml` defaults use_cond=F, moist_kappa=F).
"""

import jax.numpy as jnp

from .. import constants as con

H = 3
ZVIR = con.RVGAS / con.RDGAS - 1.0


def ke_cell(u, v, g):
    """Cell-mean kinetic energy from D winds (the 0.25*rsin2*(...) form used
    throughout fv_mapz.F90, e.g. :688-691). u [6,K,n+1,n], v [6,K,n,n+1]."""
    ctr = slice(H, H + u.shape[-1])
    n = u.shape[-1]
    rsin2 = g.rsin2[..., ctr, ctr] if g.rsin2.shape[-1] != n else g.rsin2
    cosa_s = g.cosa_s[..., ctr, ctr] if g.cosa_s.shape[-1] != n else g.cosa_s
    u1, u2 = u[..., :-1, :], u[..., 1:, :]
    v1, v2 = v[..., :, :-1], v[..., :, 1:]
    return 0.25 * rsin2 * (u1 ** 2 + u2 ** 2 + v1 ** 2 + v2 ** 2
                           - (u1 + u2) * (v1 + v2) * cosa_s)


def total_energy_2d_hydro(u, v, tv, delp, peln, pe, phis, g):
    """Column total energy, hydrostatic form (fv_mapz.F90:665-683):
    te = pe_bot*hs - ptop*gz_top + sum_k delp*(cp*Tv + KE)."""
    hs = phis if phis.ndim == 3 else phis[:, 0]
    gz_top = hs + jnp.sum(con.RDGAS * tv * (peln[:, 1:] - peln[:, :-1]),
                          axis=1)
    te = pe[:, -1] * hs - pe[:, 0] * gz_top
    te = te + jnp.sum(delp * (con.CP_AIR * tv + ke_cell(u, v, g)), axis=1)
    return te


def total_energy_2d_nh(u, v, w, tv, qsphum, delp, delz, phis, g):
    """Column total energy, nonhydrostatic form (fv_mapz.F90:686-717):
    te = sum_k delp*(cv*T + 0.5*(phi_k + phi_k+1 + w^2 + 2*KE))."""
    hs = phis if phis.ndim == 3 else phis[:, 0]
    cv_air = con.CP_AIR - con.RDGAS
    incr = jnp.cumsum((-con.GRAV * delz)[:, ::-1], axis=1)[:, ::-1]
    phi_top = jnp.concatenate([hs[:, None] + incr, hs[:, None]], axis=1)
    t_abs = tv if qsphum is None else tv / (1.0 + ZVIR * qsphum)
    te = jnp.sum(delp * (cv_air * t_abs
                         + 0.5 * (phi_top[:, :-1] + phi_top[:, 1:]
                                  + w ** 2 + 2.0 * ke_cell(u, v, g))), axis=1)
    return te


def g_mean(field2d, g, reproduce=False):
    """Area-weighted global mean (fv_grid_utils.F90 g_sum mode 0).

    Tile-parallel aware: inside a shard_map body (g.halo is a ShardHalo
    with a mesh axis) the sum crosses tiles with lax.psum.

    reproduce=True selects the bitwise layout-invariant fixed-point sum
    (parallel/reductions.py, the reference's reproduce_sum contract)."""
    area = g.area_int if hasattr(g, "area_int") else None
    if area is None:
        area = jnp.asarray(g.geom.interior("area"))
    axis = getattr(getattr(g, "halo", None), "axis", None)
    if axis is not None and field2d.shape[0] != area.shape[0]:
        import jax
        ti = jax.lax.axis_index(axis)
        area = jax.lax.dynamic_index_in_dim(area, ti, 0, keepdims=True)
        if reproduce:
            from ..parallel.reductions import g_sum_reproducible
            return g_sum_reproducible(field2d, area, axis_name=axis)
        num = jax.lax.psum(jnp.sum(field2d * area), axis)
        den = jax.lax.psum(jnp.sum(area), axis)
        return num / den
    if reproduce:
        from ..parallel.reductions import g_sum_reproducible
        return g_sum_reproducible(field2d, area)
    return jnp.sum(field2d * area) / jnp.sum(area)


def moist_cv(q, nwat=6):
    """Moist heat capacity at constant volume + condensate loading q_con
    (fv_thermodynamics.F90 moist_cv:250, nwat cases 2-6). q: dict of tracer
    arrays. Returns (cvm, q_con) broadcast like the tracers."""
    z = lambda k: q.get(k) if q.get(k) is not None else 0.0
    qv = jnp.maximum(z("sphum"), 0.0) if "sphum" in q else 0.0
    if nwat == 2:
        qs = jnp.maximum(z("liq_wat"), 0.0)
        q_con = qs
        cvm = (1.0 - qv) * con.CV_AIR + qv * con.CV_VAP
        return cvm, q_con
    if nwat == 3:
        ql, qs = z("liq_wat"), z("ice_wat")
    elif nwat == 4:
        ql, qs = z("liq_wat") + z("rainwat"), 0.0
    elif nwat == 5:
        ql = z("liq_wat") + z("rainwat")
        qs = z("ice_wat") + z("snowwat")
    elif nwat == 6:
        ql = z("liq_wat") + z("rainwat")
        qs = z("ice_wat") + z("snowwat") + z("graupel")
    else:
        return jnp.asarray(con.CV_AIR), 0.0
    q_con = ql + qs
    cvm = ((1.0 - (qv + q_con)) * con.CV_AIR + qv * con.CV_VAP
           + ql * con.C_LIQ + qs * con.C_ICE)
    return cvm, q_con


def moist_cp(q, nwat=6):
    """Moist heat capacity at constant pressure (moist_cp:327)."""
    z = lambda k: q.get(k) if q.get(k) is not None else 0.0
    qv = jnp.maximum(z("sphum"), 0.0) if "sphum" in q else 0.0
    if nwat == 2:
        q_con = jnp.maximum(z("liq_wat"), 0.0)
        return (1.0 - qv) * con.CP_AIR + qv * con.CP_VAPOR, q_con
    if nwat == 3:
        ql, qs = z("liq_wat"), z("ice_wat")
    elif nwat == 4:
        ql, qs = z("liq_wat") + z("rainwat"), 0.0
    elif nwat == 5:
        ql = z("liq_wat") + z("rainwat")
        qs = z("ice_wat") + z("snowwat")
    elif nwat == 6:
        ql = z("liq_wat") + z("rainwat")
        qs = z("ice_wat") + z("snowwat") + z("graupel")
    else:
        return jnp.asarray(con.CP_AIR), 0.0
    q_con = ql + qs
    cpm = ((1.0 - (qv + q_con)) * con.CP_AIR + qv * con.CP_VAPOR
           + ql * con.C_LIQ + qs * con.C_ICE)
    return cpm, q_con


def compute_aam(u, v, delp, g, ptop):
    """Vertically mass-integrated atmospheric angular momentum + moment
    factor (fv_dynamics.F90 compute_aam:1266). Returns (aam [T,n,n],
    m_fac, ps)."""
    from .fv_update_phys import cubed_to_latlon
    ua, _ = cubed_to_latlon(u, v, g)
    R = g.geom.radius
    omg = g.geom.omega
    lat = jnp.asarray(g.geom.interior("aglat"))
    r1 = R * jnp.cos(lat)
    r2 = r1 * r1
    dm = delp / con.GRAV
    aam = jnp.sum((r2[:, None] * omg + r1[:, None] * ua) * dm, axis=1)
    m_fac = jnp.sum(dm * r2[:, None], axis=1)
    ps = ptop + jnp.sum(delp, axis=1)
    return aam, m_fac, ps


def am_fixer(u, v, delp, aam0, g, ptop, reproduce=False, torque=None):
    """consv_am global angular-momentum fixer (fv_dynamics.F90:747-800).

    Computes the AAM change over the dynamics step relative to the
    pre-dynamics value aam0 (plus an optional mountain-torque map, the
    dt2*(ps2+ps)*zxg term of fv_dynamics.F90:765), converts it into the
    solid-body zonal-wind increment u00 = -R*<dAAM>/<m_fac>, and projects
    u00*cos(lat)*e_east back onto the D-grid edges with the precomputed
    l2c_u/l2c_v factors (fv_grid_utils.F90:404-423).

    Returns (u, v, u00)."""
    aam1, m_fac, _ = compute_aam(u, v, delp, g, ptop)
    d = aam1 - aam0
    if torque is not None:
        d = d + torque
    # g_sum mode-0 normalization (divide by global area) cancels in the
    # amdt/m_fac ratio, so area-weighted means are exact here.
    amdt = g_mean(d, g, reproduce=reproduce)
    u00 = -g.geom.radius * amdt / g_mean(m_fac, g, reproduce=reproduce)
    l2c_u = jnp.asarray(g.geom.interior("l2c_u"), u.dtype)
    l2c_v = jnp.asarray(g.geom.interior("l2c_v"), v.dtype)
    u = u + u00 * l2c_u[:, None]
    v = v + u00 * l2c_v[:, None]
    return u, v, u00


def energy_fixer_dtmp(te0, te1, pkz, delp, pk, ptop, consv, g,
                      hydrostatic=True, reproduce=False):
    """Global heating increment dtmp (fv_mapz.F90:740-772): consv times the
    mean energy loss divided by the mean heat capacity integral."""
    zsum1 = jnp.sum(pkz * delp, axis=1)
    if hydrostatic:
        zsum = ptop * (pk[:, 0] - pk[:, -1]) + zsum1
    else:
        zsum = zsum1
    return (consv * g_mean(te0 - te1, g, reproduce=reproduce)
            / g_mean(zsum, g, reproduce=reproduce))
