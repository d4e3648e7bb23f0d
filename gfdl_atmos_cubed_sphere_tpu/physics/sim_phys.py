"""Idealized moist physics suite (the solo driver's GFDL_sim_phys).

Re-implements the behavior of /root/reference/driver/solo/fv_phys.F90
(`GFDL_sim_phys`:724, `pbl_diff`:1235, `trid_dif2`:1445,
`gray_radiation`:1590 — Frierson/Held/Zurita-Gotor 2006 gray LW,
`fv_nudge`:1480) and the bulk surface layer of
driver/solo/monin_obukhov_drag.F90 (`Mon_obkv`:61, do_fixed_cd path) +
ocean_rough.F90 (Charnock roughness :60).

TPU design: all columns are solved batched; the vertical recursions
(two-stream LW, implicit diffusion) are lax.scan over K with the horizontal
[T, y, x] as the vector lanes.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import constants as con

SBC = 5.6734e-8
VONKARM = 0.4


@dataclass(frozen=True)
class SimPhysConfig:
    solar_constant: float = 1367.0
    sw_abs: float = 0.3          # net cloud reflection + atmos absorption
    t0e: float = 8.0             # equatorial LW optical depth
    t0p: float = 1.5             # polar LW optical depth
    fl: float = 0.1              # Dargan strat/trop split
    diurnal_cycle: bool = False
    albedo: float = 0.0
    mu_min: float = 1.0e-5       # ~ molecular viscosity (pbl_diff)
    abl_s_fac: float = 0.2       # surface-layer fraction of the PBL
    ustar2: float = 1.0e-4
    charnock: float = 0.012      # ocean_rough charnock constant
    z0_min: float = 1.0e-5
    cd_fixed: float = 0.0        # > 0: fixed drag coefficient (do_fixed_cd)


def gray_radiation(temp, ts, delp, delz, lat, lon, ps, ptop,
                   cfg: SimPhysConfig, sec=0.0):
    """Frierson gray radiation (fv_phys.F90 gray_radiation:1590).

    temp [T,K,n,n]; ts/lat/lon/ps [T,n,n]; delz negative. Returns
    (t_dt [K/s], diag dict with olr/lwu/lwd/sw_surf)."""
    K = temp.shape[1]
    tau0 = cfg.t0e + (cfg.t0p - cfg.t0e) * jnp.sin(lat) ** 2

    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    sig = pe / ps[:, None]
    tau = tau0[:, None] * (sig * cfg.fl + (1.0 - cfg.fl) * sig ** 4)
    delt = tau[:, 1:] - tau[:, :-1]
    b = SBC * temp ** 4

    # downward two-stream (top-down recursion, :1664-1668)
    def dstep(dr, x):
        dts, bs = x
        dr1 = (dr + dts * (bs - 0.5 * dr)) / (1.0 + 0.5 * dts)
        return dr1, dr1

    z0 = jnp.zeros_like(b[:, 0])
    _, dr_rest = jax.lax.scan(dstep, z0,
                              (jnp.moveaxis(delt, 1, 0),
                               jnp.moveaxis(b, 1, 0)))
    dr = jnp.concatenate([z0[:, None], jnp.moveaxis(dr_rest, 0, 1)], axis=1)

    # upward (bottom-up, :1673-1678)
    def ustep(ur, x):
        dts, bs = x
        ur1 = (ur + dts * (bs - 0.5 * ur)) / (1.0 + 0.5 * dts)
        return ur1, ur1

    urK = SBC * ts ** 4
    _, ur_rest = jax.lax.scan(ustep, urK,
                              (jnp.moveaxis(delt, 1, 0)[::-1],
                               jnp.moveaxis(b, 1, 0)[::-1]))
    ur = jnp.concatenate([jnp.moveaxis(ur_rest[::-1], 0, 1),
                          urK[:, None]], axis=1)

    lw = ur - dr
    rho = -delp / (con.GRAV * delz)
    t_dt = (lw[:, :-1] - lw[:, 1:]) / (con.CP_AIR * rho * delz)

    # SW absorbed at the surface (no atmospheric SW absorption)
    sw_rad_coef = cfg.solar_constant * (1.0 - cfg.sw_abs)
    if cfg.diurnal_cycle:
        ang = 2.0 * jnp.pi * sec / 86400.0 + lon
        sw_surf = (sw_rad_coef * jnp.cos(lat)
                   * jnp.maximum(0.0, jnp.cos(ang)) * (1.0 - cfg.albedo))
    else:
        sw_surf = (sw_rad_coef / jnp.pi * jnp.maximum(0.0, jnp.cos(lat))
                   * (1.0 - cfg.albedo))
    diag = dict(olr=ur[:, 0], lwu=urK, lwd=dr[:, -1], sw_surf=sw_surf)
    return t_dt, diag


def ocean_roughness(ustar, cfg: SimPhysConfig):
    """Charnock + smooth-flow roughness length (ocean_rough.F90:60)."""
    visc = 1.5e-5
    return jnp.maximum(cfg.z0_min,
                       cfg.charnock * ustar ** 2 / con.GRAV
                       + 0.11 * visc / jnp.maximum(ustar, 1.0e-6))


def bulk_surface_drag(ua, va, ta, ts, z_bot, q_bot=None, cfg=SimPhysConfig()):
    """Bulk surface exchange coefficient (Mon_obkv:61 with a bulk-Ri
    stability factor in place of the full similarity iteration; the
    do_fixed_cd path is exact). Returns (cd, ch, ustar)."""
    wind = jnp.sqrt(ua ** 2 + va ** 2 + cfg.ustar2)
    if cfg.cd_fixed > 0.0:
        cd = jnp.full_like(wind, cfg.cd_fixed)
        ustar = jnp.sqrt(cd) * wind
        return cd, cd, ustar
    # iterate neutral log-law with Charnock roughness (2 passes converge)
    ustar = 0.03 * wind
    for _ in range(2):
        z0 = ocean_roughness(ustar, cfg)
        cdn = (VONKARM / jnp.log(z_bot / z0)) ** 2
        ustar = jnp.sqrt(cdn) * wind
    # bulk Richardson stability factor
    tv_a = ta
    tv_s = ts
    ri = con.GRAV * z_bot * (tv_a - tv_s) / (0.5 * (tv_a + tv_s) * wind ** 2)
    fac = jnp.where(ri >= 0.0,
                    1.0 / (1.0 + 10.0 * jnp.clip(ri, 0.0, 10.0)),
                    jnp.sqrt(1.0 - 16.0 * jnp.clip(ri, -10.0, 0.0)))
    cd = cdn * fac
    return cd, cd, jnp.sqrt(cd) * wind


def pbl_height(ua, va, ta, qv, ts, delz, ps, pm, cfg: SimPhysConfig):
    """Bulk-Richardson PBL top height (pbl_diff:1283-1296): the first level
    (scanning up) where Ri_b > 1. Returns pblh [T,n,n] (m)."""
    gh = jnp.concatenate(
        [-jnp.flip(jnp.cumsum(jnp.flip(delz, 1), 1), 1),
         jnp.zeros_like(delz[:, :1])], axis=1)          # interface heights
    zmid = gh[:, 1:] - 0.5 * delz
    zvir = con.RVGAS / con.RDGAS - 1.0
    if qv is None:
        qv = jnp.zeros_like(ta)
    tv_s = ts * (1.0 + zvir * qv[:, -1])
    tvm = ta * (1.0 + zvir * qv)
    theta_ratio = (ps[:, None] / pm) ** con.KAPPA
    tvm = tvm * theta_ratio
    rin = (con.GRAV * zmid * (tvm - tv_s[:, None])
           / (0.5 * (tv_s[:, None] + tvm)
              * (ua ** 2 + va ** 2 + cfg.ustar2)))
    # lowest interface ABOVE which Ri first exceeds 1 (bottom-up)
    stable = (rin > 1.0).astype(ta.dtype)
    below = jnp.cumsum(jnp.flip(stable, 1), 1)          # from bottom
    first = jnp.flip((below == 1.0) & (jnp.flip(stable, 1) == 1.0), 1)
    pblh = jnp.sum(jnp.where(first, gh[:, 1:], 0.0), axis=1)
    return pblh


def k_profile(gh_mid, pblh, mu, cfg: SimPhysConfig):
    """Dargan K-profile (pbl_diff:1302-1322): linear to abl_s_fac*pblh,
    quadratic decay to pblh, mu_min above / outside."""
    surf_h = cfg.abl_s_fac * pblh[:, None]
    kz = mu[:, None] * gh_mid
    outer = (mu[:, None] * surf_h
             * gh_mid / surf_h
             * (1.0 - (gh_mid - surf_h)
                / jnp.maximum(pblh[:, None] - surf_h, 1.0)) ** 2)
    nu = jnp.where(gh_mid <= surf_h, kz,
                   jnp.where(gh_mid <= pblh[:, None], outer, cfg.mu_min))
    nu = jnp.where((gh_mid > 6.0e3) | (pblh[:, None] <= 0.0),
                   cfg.mu_min, nu)
    return jnp.maximum(nu, cfg.mu_min)


def implicit_diffusion(x, nu_int, delz, delp, dt):
    """Implicit vertical diffusion (trid_dif2:1445): solve
    (I - dt*D) x' = x with flux coefficients nu at interior interfaces.

    x [T,K,n,n]; nu_int [T,K-1,n,n] at interfaces between layers;
    delz negative."""
    K = x.shape[1]
    dzm = -delz                                    # positive thickness
    dz_int = 0.5 * (dzm[:, :-1] + dzm[:, 1:])
    # exchange coefficient in mass units: rho*nu/dz_int, mapped to the
    # layer equations through delp/g
    rho_int = (delp[:, :-1] + delp[:, 1:]) / (
        con.GRAV * (dzm[:, :-1] + dzm[:, 1:]))
    cc = dt * rho_int * nu_int / dz_int * con.GRAV / delp[:, :-1]
    cd_ = dt * rho_int * nu_int / dz_int * con.GRAV / delp[:, 1:]

    # tridiagonal: a(k) x(k-1) + b(k) x(k) + c(k) x(k+1) = x0(k)
    a = jnp.concatenate([jnp.zeros_like(cd_[:, :1]), -cd_], axis=1)
    c = jnp.concatenate([-cc, jnp.zeros_like(cc[:, :1])], axis=1)
    b = 1.0 - a - c

    def fwd(carry, xk):
        cp_prev, dp_prev = carry
        ak, bk, ck, dk = xk
        m = bk - ak * cp_prev
        cp = ck / m
        dp = (dk - ak * dp_prev) / m
        return (cp, dp), (cp, dp)

    z = jnp.zeros_like(x[:, 0])
    xs = (jnp.moveaxis(a, 1, 0), jnp.moveaxis(b, 1, 0),
          jnp.moveaxis(c, 1, 0), jnp.moveaxis(x, 1, 0))
    _, (cp, dp) = jax.lax.scan(fwd, (z, z), xs)

    def bwd(carry, xk):
        cpk, dpk = xk
        xk_ = dpk - cpk * carry
        return xk_, xk_

    _, xout = jax.lax.scan(bwd, jnp.zeros_like(z), (cp[::-1], dp[::-1]))
    return jnp.moveaxis(xout[::-1], 0, 1)


def sim_phys(ua, va, ta, qv, delp, delz, ts, g, ptop, dt,
             cfg: SimPhysConfig = SimPhysConfig(), sec=0.0):
    """One step of the idealized physics suite (GFDL_sim_phys:724 subset):
    gray radiation + bulk surface drag + PBL diffusion. A-grid winds
    in/out; returns (ua, va, ta, qv, diag)."""
    lat = jnp.asarray(g.geom.interior("aglat"))
    lon = jnp.asarray(g.geom.interior("aglon"))
    ps = ptop + jnp.sum(delp, axis=1)
    pe = ptop + jnp.cumsum(delp, axis=1)
    pm = pe - 0.5 * delp

    t_dt, rad = gray_radiation(ta, ts, delp, delz, lat, lon, ps, ptop,
                               cfg, sec)
    ta = ta + dt * t_dt

    z_bot = -0.5 * delz[:, -1]
    cd, ch, ustar = bulk_surface_drag(ua[:, -1], va[:, -1], ta[:, -1],
                                      ts, z_bot, cfg=cfg)
    wind = jnp.sqrt(ua[:, -1] ** 2 + va[:, -1] ** 2 + cfg.ustar2)
    # implicit surface momentum sink: du/dt = -cd*|V|*u / dz_bot
    drag = 1.0 / (1.0 + dt * cd * wind / (-delz[:, -1]))
    ua = ua.at[:, -1].multiply(drag)
    va = va.at[:, -1].multiply(drag)
    # sensible heating of the lowest layer toward ts
    ta = ta.at[:, -1].add(dt * ch * wind / (-delz[:, -1])
                          * (ts - ta[:, -1]))

    # PBL mixing
    pblh = pbl_height(ua, va, ta, qv, ts, delz, ps, pm, cfg)
    gh = jnp.concatenate(
        [-jnp.flip(jnp.cumsum(jnp.flip(delz, 1), 1), 1),
         jnp.zeros_like(delz[:, :1])], axis=1)
    gh_mid = gh[:, 1:] - 0.5 * delz
    mu = VONKARM * ustar
    nu = k_profile(gh_mid, pblh, mu, cfg)
    nu_int = 0.5 * (nu[:, :-1] + nu[:, 1:])
    ua = implicit_diffusion(ua, nu_int, delz, delp, dt)
    va = implicit_diffusion(va, nu_int, delz, delp, dt)
    theta = ta * (1.0e5 / pm) ** con.KAPPA
    theta = implicit_diffusion(theta, nu_int, delz, delp, dt)
    ta = theta * (pm / 1.0e5) ** con.KAPPA
    if qv is not None:
        qv = implicit_diffusion(qv, nu_int, delz, delp, dt)

    diag = dict(pblh=pblh, ustar=ustar, cd=cd, **rad)
    return ua, va, ta, qv, diag


def fv_nudge(u, v, pt, u0, v0, pt0, dt, tau_winds=600.0, tau_temp=600.0):
    """Simple state nudging toward reference profiles (fv_phys.F90
    fv_nudge:1480): implicit relaxation x += (x0-x)*dt/(tau+dt)."""
    fw = dt / (tau_winds + dt)
    ft = dt / (tau_temp + dt)
    return (u + fw * (u0 - u), v + fw * (v0 - v), pt + ft * (pt0 - pt))
