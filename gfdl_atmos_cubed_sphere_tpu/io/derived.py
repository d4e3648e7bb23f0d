"""Derived diagnostic fields (component #26, fv_diagnostics.F90 fv_diag
quantities): relative/absolute/potential vorticity, sea-level pressure,
pressure-level interpolation (the cs3_interpolator role), wind speed,
and surface-based CAPE/CIN via a pseudoadiabatic parcel ascent.
"""

import jax
import jax.numpy as jnp

from .. import constants as con
from ..physics import gfdl_mp as mp

H = 3


def relative_vorticity(u, v, g):
    """Cell-mean relative vorticity from D winds (the d_sw `wk` circulation
    form, sw_core.F90:1358-1372). u [6,K,n+1,n], v [6,K,n,n+1]."""
    n = u.shape[-1]
    ctr = slice(H, H + n)
    # dx is the y-wall metric [6,1,NW,NC]; slice walls 0..n, cell cols
    wslr = slice(H, H + n + 1)
    vt = u * g.dx[..., wslr, ctr]
    ut = v * g.dy[..., ctr, wslr]
    rarea = g.rarea[..., ctr, ctr]
    return rarea * (vt[..., :-1, :] - vt[..., 1:, :]
                    - ut[..., :, :-1] + ut[..., :, 1:])


def absolute_vorticity(u, v, g):
    f0 = g.f0[..., H:H + u.shape[-1], H:H + u.shape[-1]]
    return relative_vorticity(u, v, g) + f0


def potential_vorticity(u, v, pt, delp, g, ptop=100.0):
    """Ertel PV on model layers: -g (f + zeta) dtheta/dp (fv_diagnostics
    pv_entropy form, vertical term). pt: temperature."""
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    pk = pe ** con.KAPPA
    theta = pt * (1.0e5 ** con.KAPPA) / (0.5 * (pk[:, 1:] + pk[:, :-1]))
    dtheta = jnp.concatenate([theta[:, 1:2] - theta[:, 0:1],
                              0.5 * (theta[:, 2:] - theta[:, :-2]),
                              theta[:, -1:] - theta[:, -2:-1]], axis=1)
    va = absolute_vorticity(u, v, g)
    return -con.GRAV * va * dtheta / delp


def sea_level_pressure(ps, phis, t_bot):
    """Standard SLP reduction (fv_diagnostics get_pressure_given_height
    style): T extrapolated below ground with the 6.5 K/km lapse rate."""
    hs = phis if phis.ndim == 3 else phis[:, 0]
    gamma = 6.5e-3
    z = hs / con.GRAV
    t0 = t_bot + gamma * z                  # extrapolated sea-level T
    return ps * jnp.exp(z * con.GRAV / (con.RDGAS * 0.5 * (t_bot + t0)))


def interp_to_pressure_levels(field, delp, ptop, plevs, log_p=True):
    """Interpolate a layer field to target pressure levels (the
    cs3_interpolator role, linear in ln p). field/delp [6,K,n,n];
    plevs: 1-D target pressures (Pa). Returns [6, L, n, n] with NaN where
    the level is below the surface/above the top."""
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    pm = delp / (jnp.log(pe[:, 1:]) - jnp.log(pe[:, :-1]))
    x = jnp.log(pm) if log_p else pm
    K = field.shape[1]
    xt = jnp.log(jnp.asarray(plevs)) if log_p else jnp.asarray(plevs)

    def interp_one(xtv):
        # location: number of layers with pm < target
        cnt = jnp.sum((x < xtv).astype(field.dtype), axis=1)
        l = jnp.clip(cnt - 1.0, 0.0, float(K - 2))
        onehot = (l[:, None] == jnp.arange(K, dtype=field.dtype)
                  .reshape(1, K, 1, 1)).astype(field.dtype)
        onehot1 = (l[:, None] + 1.0 == jnp.arange(K, dtype=field.dtype)
                   .reshape(1, K, 1, 1)).astype(field.dtype)
        x0 = jnp.sum(onehot * x, axis=1)
        x1 = jnp.sum(onehot1 * x, axis=1)
        f0 = jnp.sum(onehot * field, axis=1)
        f1 = jnp.sum(onehot1 * field, axis=1)
        w = jnp.clip((xtv - x0) / jnp.where(x1 == x0, 1.0, x1 - x0), 0.0, 1.0)
        val = f0 + w * (f1 - f0)
        inside = (xtv >= x[:, 0]) & (xtv <= x[:, -1])
        return jnp.where(inside, val, jnp.nan)

    return jnp.stack([interp_one(xt[i]) for i in range(len(plevs))], axis=1)


def wind_speed(ua, va):
    return jnp.sqrt(ua ** 2 + va ** 2)


def cape_cin(pt, delp, qv, ptop):
    """Surface-based CAPE/CIN (fv_diagnostics getcape role, simplified):
    pseudoadiabatic parcel lifted from the lowest layer, buoyancy
    integrated upward with latent heating at saturation."""
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    pm = delp / (peln[:, 1:] - peln[:, :-1])
    tv_env = pt * (1.0 + con.ZVIR * qv)

    K = pt.shape[1]
    t_sfc = pt[:, -1]
    q_sfc = qv[:, -1]
    p_sfc = pm[:, -1]

    def step(carry, k):
        tp, qp, pprev = carry
        p = pm[:, k]
        # dry adiabatic cooling, then condense back to saturation
        tp = tp * (p / pprev) ** con.KAPPA
        qs, dq = mp.wqs(tp, p)
        excess = jnp.maximum(0.0, qp - qs)
        lat = con.HLV / con.CP_AIR
        cond = excess / (1.0 + lat * dq)
        tp = tp + lat * cond
        qp = qp - cond
        tvp = tp * (1.0 + con.ZVIR * qp)
        buoy = con.GRAV * (tvp - tv_env[:, k]) / tv_env[:, k]
        dz = con.RDGAS * tv_env[:, k] / con.GRAV * (
            peln[:, k + 1] - peln[:, k])
        return (tp, qp, p), buoy * dz

    ks = jnp.arange(K - 2, -1, -1)
    (_, _, _), contrib = jax.lax.scan(step, (t_sfc, q_sfc, p_sfc), ks)
    pos = jnp.maximum(contrib, 0.0).sum(axis=0)
    neg = jnp.minimum(contrib, 0.0).sum(axis=0)
    return pos, -neg


def layer_heights(delz=None, pt=None, peln=None, sphum=None, phis=None):
    """Height above ground of layer midpoints and bottom-up cumulative
    column (fv_diagnostics' wz construction).  Nonhydrostatic: from -delz;
    hydrostatic: dz = (Rd/g) Tv dlnp.  Inputs [.., K, n, n]; returns
    (z_mid, z_edge_below) each [.., K, n, n] with z measured upward from
    the surface."""
    if delz is not None:
        dz = -delz
    else:
        tv = pt if sphum is None else pt * (1.0 + mp.ZVIR * sphum)
        dz = con.RDGAS / con.GRAV * tv * (peln[:, 1:] - peln[:, :-1])
    # cumulative height of each layer's bottom interface, ground = 0
    zbot = jnp.cumsum(dz[:, ::-1], axis=1)[:, ::-1] - dz
    return zbot + 0.5 * dz, zbot


def updraft_helicity(vort, w, z_mid, dz, z_bot=2.0e3, z_top=5.0e3):
    """2-5 km updraft helicity UH = int vort*w dz over [z_bot, z_top]
    (fv_diagnostics.F90 updraft_helicity, public :111), with partial-layer
    overlap weighting.  vort/w/z_mid/dz: [.., K, n, n]; returns [.., n, n]
    in (m/s)^2."""
    lo = z_mid - 0.5 * dz
    hi = z_mid + 0.5 * dz
    overlap = jnp.clip(jnp.minimum(hi, z_top) - jnp.maximum(lo, z_bot),
                       0.0, None)
    return jnp.sum(vort * w * overlap, axis=1)


def radar_reflectivity(delp, pt, q, delz=None, peln=None):
    """Stoelinga (2005) simulated reflectivity with the constant-N0
    Marshall-Palmer intercepts the GFDL MP uses (gfdl_mp.F90 rad_ref:6466;
    registered as 'reflectivity' at fv_diagnostics.F90:1165).

    Z_e = 3.63e9 (rho q_r)^1.75 + 9.80e8 (rho q_s)^1.75
          + 4.33e10 (rho q_g)^1.75   [mm^6/m^3]
    with the dry-ice correction alpha=0.224 folded into the snow/graupel
    prefactors.  q: dict of tracers; returns (dbz [.., K, n, n],
    composite_max [.., n, n]), floored at -20 dBZ."""
    sph = q.get("sphum")
    if delz is not None:
        den = -delp / (con.GRAV * delz)
    else:
        tv = pt if sph is None else pt * (1.0 + mp.ZVIR * sph)
        den = delp / ((peln[:, 1:] - peln[:, :-1]) * con.RDGAS * tv)
    qmin = 1.0e-12
    z_e = jnp.zeros_like(delp)
    for name, fac in (("rainwat", 3.630803e9), ("snowwat", 9.80308e8),
                      ("graupel", 4.330624e10)):
        if name in q:
            z_e = z_e + fac * jnp.maximum(den * q[name], qmin) ** 1.75
    dbz = 10.0 * jnp.log10(jnp.maximum(z_e, 0.01))
    dbz = jnp.maximum(dbz, -20.0)
    return dbz, jnp.max(dbz, axis=1)


def echo_top(dbz, z_mid, threshold=18.5):
    """Highest altitude with dbz >= threshold (fv_diagnostics id_dbztop,
    fv_diagnostics.F90:1265); -1 where never reached."""
    hit = dbz >= threshold
    z = jnp.where(hit, z_mid, -1.0)
    return jnp.max(z, axis=1)


def layer_pressures(delp, ptop):
    """(pe [.., K+1, n, n], peln, p_lay) from delp — the shared pressure
    scaffolding of fv_diagnostics."""
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    p_lay = delp / (peln[:, 1:] - peln[:, :-1])
    return pe, peln, p_lay


def potential_temperature(pt, p_lay):
    """theta (fv_diagnostics id_theta): T (p00/p)^kappa."""
    return pt * jnp.exp(con.KAPPA * jnp.log(1.0e5 / p_lay))


def equivalent_potential_temperature(pt, p_lay, qv):
    """theta_e (fv_diagnostics id_theta_e, Bolton-style simplified):
    theta * exp(L qv / (cp T))."""
    th = potential_temperature(pt, p_lay)
    return th * jnp.exp(con.HLV * qv / (con.CP_AIR * pt))


def relative_humidity(pt, p_lay, qv):
    """RH in percent w.r.t. water above freezing / ice below (the rh
    diagnostic, fv_diagnostics.F90 id_rh)."""
    qsw, _ = mp.wqs(pt, p_lay)
    qsi, _ = mp.iqs(pt, p_lay)
    qsat = jnp.where(pt < mp.TICE, qsi, qsw)
    return 100.0 * qv / jnp.maximum(qsat, 1.0e-12)


def divergence(ua, va, g):
    """A-grid horizontal divergence diagnostic (id_divg): centered flux
    differences of the lat-lon winds over the cell metrics. ua/va
    [6,K,n,n]; one-sided at tile edges (diagnostic-quality)."""
    n = ua.shape[-1]
    ctr = slice(H, H + n)
    dxc = g.dx[..., H:H + n + 1, ctr]       # y-walls
    dyc = g.dy[..., ctr, H:H + n + 1]       # x-walls
    rarea = g.rarea[..., ctr, ctr]
    # interpolate A-grid winds to walls (interior), one-sided at edges
    ux = jnp.concatenate([ua[..., :, :1],
                          0.5 * (ua[..., :, 1:] + ua[..., :, :-1]),
                          ua[..., :, -1:]], axis=-1)
    vy = jnp.concatenate([va[..., :1, :],
                          0.5 * (va[..., 1:, :] + va[..., :-1, :]),
                          va[..., -1:, :]], axis=-2)
    fx = ux * dyc
    fy = vy * dxc
    return rarea * (fx[..., :, 1:] - fx[..., :, :-1]
                    + fy[..., 1:, :] - fy[..., :-1, :])


def interp_to_height(field, z_mid, targets):
    """Interpolate a layer field to fixed heights above ground (the wz
    interpolation behind w1km/w2500m/w5km/u100m..., fv_diagnostics.F90
    :1050-1110). z_mid increases upward with DEcreasing k index.
    targets: python sequence of heights (m AGL). Returns [6, L, n, n]."""
    K = field.shape[1]
    dtype = field.dtype
    outs = []
    for zt in targets:
        below = (z_mid <= zt).astype(dtype)       # layers under the target
        cnt = jnp.sum(below, axis=1)              # counted from the bottom
        # bracketing pair: layer index k1 = K - cnt (above), k0 = K - cnt -1?
        l_hi = jnp.clip(K - 1.0 - cnt, 0.0, float(K - 2))
        kidx = jnp.arange(K, dtype=dtype).reshape(1, K, 1, 1)
        oh_hi = (l_hi[:, None] == kidx).astype(dtype)
        oh_lo = (l_hi[:, None] + 1.0 == kidx).astype(dtype)
        z_hi = jnp.sum(oh_hi * z_mid, axis=1)
        z_lo = jnp.sum(oh_lo * z_mid, axis=1)
        f_hi = jnp.sum(oh_hi * field, axis=1)
        f_lo = jnp.sum(oh_lo * field, axis=1)
        w = jnp.clip((zt - z_lo) / jnp.where(z_hi == z_lo, 1.0, z_hi - z_lo),
                     0.0, 1.0)
        outs.append(f_lo + w * (f_hi - f_lo))
    return jnp.stack(outs, axis=1)


def bunkers_motion(ua, va, z_mid, dz):
    """Bunkers et al. (2000) right-mover storm motion (ustm/vstm,
    fv_diagnostics.F90 bunkers_vector): 0-6 km mean wind plus 7.5 m/s along
    the unit vector orthogonal to the 0-6 km shear."""
    w6 = jnp.clip(jnp.minimum(z_mid + 0.5 * dz, 6.0e3)
                  - jnp.maximum(z_mid - 0.5 * dz, 0.0), 0.0, None)
    wsum = jnp.maximum(jnp.sum(w6, axis=1), 1.0)
    um = jnp.sum(ua * w6, axis=1) / wsum
    vm = jnp.sum(va * w6, axis=1) / wsum
    # shear = mean(5.5-6km) - mean(0-0.5km)
    wlo = jnp.clip(jnp.minimum(z_mid + 0.5 * dz, 0.5e3)
                   - jnp.maximum(z_mid - 0.5 * dz, 0.0), 0.0, None)
    whi = jnp.clip(jnp.minimum(z_mid + 0.5 * dz, 6.0e3)
                   - jnp.maximum(z_mid - 0.5 * dz, 5.5e3), 0.0, None)
    slo = jnp.maximum(jnp.sum(wlo, axis=1), 1.0)
    shi = jnp.maximum(jnp.sum(whi, axis=1), 1.0)
    du = jnp.sum(ua * whi, axis=1) / shi - jnp.sum(ua * wlo, axis=1) / slo
    dv = jnp.sum(va * whi, axis=1) / shi - jnp.sum(va * wlo, axis=1) / slo
    mag = jnp.sqrt(du ** 2 + dv ** 2)
    mag = jnp.maximum(mag, 1.0e-3)
    return um + 7.5 * dv / mag, vm - 7.5 * du / mag


def storm_relative_helicity(ua, va, z_mid, dz, ustm, vstm,
                            z_bot=0.0, z_top=3.0e3):
    """SRH over [z_bot, z_top] (srh01/srh03/srh25, fv_diagnostics
    helicity_relative): int (V - C) . (k x dV/dz) dz, evaluated layerwise
    with the discrete cross-product form."""
    K = ua.shape[1]
    # layer-interface shear between adjacent midpoints (k decreasing up)
    du = ua[:, :-1] - ua[:, 1:]
    dv = va[:, :-1] - va[:, 1:]
    um = 0.5 * (ua[:, :-1] + ua[:, 1:]) - ustm[:, None]
    vm = 0.5 * (va[:, :-1] + va[:, 1:]) - vstm[:, None]
    zc = 0.5 * (z_mid[:, :-1] + z_mid[:, 1:])
    inside = ((zc >= z_bot) & (zc <= z_top)).astype(ua.dtype)
    return jnp.sum(inside * (um * dv - vm * du), axis=1)


def wind_shear(ua, va, z_mid, dz, z_top=6.0e3):
    """Bulk shear magnitude surface->z_top (shear06)."""
    lo = interp_to_height(ua, z_mid, (10.0,)), \
        interp_to_height(va, z_mid, (10.0,))
    hi = interp_to_height(ua, z_mid, (z_top,)), \
        interp_to_height(va, z_mid, (z_top,))
    return jnp.sqrt((hi[0][:, 0] - lo[0][:, 0]) ** 2
                    + (hi[1][:, 0] - lo[1][:, 0]) ** 2)


def interp_to_theta(field, theta, targets):
    """Interpolate a layer field onto isentropic (constant potential
    temperature) surfaces — the pv350K/pv550K support
    (fv_diagnostics.F90 interpolate_z-family on theta). theta generally
    decreases with the k index (k=0 is the model top), so the vertical
    coordinate is x = -theta, monotone increasing like pressure.
    Returns [6, L, n, n], NaN where the surface is outside the column."""
    x = -theta
    K = field.shape[1]
    xt = [-float(t) for t in targets]

    def interp_one(xtv):
        cnt = jnp.sum((x < xtv).astype(field.dtype), axis=1)
        l = jnp.clip(cnt - 1.0, 0.0, float(K - 2))
        onehot = (l[:, None] == jnp.arange(K, dtype=field.dtype)
                  .reshape(1, K, 1, 1)).astype(field.dtype)
        onehot1 = (l[:, None] + 1.0 == jnp.arange(K, dtype=field.dtype)
                   .reshape(1, K, 1, 1)).astype(field.dtype)
        x0 = jnp.sum(onehot * x, axis=1)
        x1 = jnp.sum(onehot1 * x, axis=1)
        f0 = jnp.sum(onehot * field, axis=1)
        f1 = jnp.sum(onehot1 * field, axis=1)
        w = jnp.clip((xtv - x0) / jnp.where(x1 == x0, 1.0, x1 - x0),
                     0.0, 1.0)
        val = f0 + w * (f1 - f0)
        inside = (xtv >= jnp.min(x, axis=1)) & (xtv <= jnp.max(x, axis=1))
        return jnp.where(inside, val, jnp.nan)

    return jnp.stack([interp_one(t) for t in xt], axis=1)


def box_max(field2d, size=7):
    """Windowed maximum over a size x size box per tile (the wind_max 7x7
    search of fv_diagnostics.F90:1977 used by the hurricane categories).
    field2d [6, n, n]; same-shape output."""
    import jax
    return jax.lax.reduce_window(
        field2d, -jnp.inf, jax.lax.max, (1, size, size), (1, 1, 1),
        "SAME")


def bulk_richardson(cape, ua, va, z_mid, dz):
    """Bulk Richardson Number (fv_diagnostics id_brn): CAPE over half the
    squared 0-6 km density-weighted shear (0-500 m mean removed)."""
    def layer_mean(f, zlo, zhi):
        wgt = jnp.clip((jnp.minimum(z_mid, zhi)
                        - jnp.maximum(z_mid - dz, zlo)), 0.0, None)
        return jnp.sum(f * wgt, axis=1) / jnp.maximum(
            jnp.sum(wgt, axis=1), 1.0)

    u6 = layer_mean(ua, 0.0, 6.0e3) - layer_mean(ua, 0.0, 500.0)
    v6 = layer_mean(va, 0.0, 6.0e3) - layer_mean(va, 0.0, 500.0)
    denom = 0.5 * (u6 ** 2 + v6 ** 2)
    return cape / jnp.maximum(denom, 10.0)
