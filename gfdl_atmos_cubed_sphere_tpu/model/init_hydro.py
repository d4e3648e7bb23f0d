"""Hydrostatic initialization utilities (component #24).

Re-implements /root/reference/tools/init_hydro.F90: p_var:45 (derive the
auxiliary pressures from delp, with optional dry-mass adjustment and
nonhydrostatic delz construction) and hydro_eq (isothermal hydrostatic
balance over terrain).
"""

import jax.numpy as jnp

from .. import constants as con


def p_var(delp, pt, ptop, q=None, delz=None, hydrostatic=True,
          adjust_dry_mass=False, dry_mass=98290.0, area=None,
          make_nh=False):
    """Given (ptop, delp), compute (ps, pe, peln, pk, pkz) and optionally
    adjust the global dry mass / rebuild delz (init_hydro.F90 p_var:45).

    delp/pt [6,K,n,n] (pt = temperature); q: tracer dict (for the dry-mass
    and virtual-T corrections). Returns a dict of derived fields (and the
    possibly-adjusted delp/delz)."""
    akap = con.KAPPA
    zvir = con.ZVIR

    if adjust_dry_mass and area is not None:
        # global dry-mass fixer (p_var:116-150, drymadj): uniform additive
        # correction to the lowest-layer pressure thickness
        qv = q.get("sphum") if q else None
        psd_col = ptop + jnp.sum(
            delp * (1.0 - qv) if qv is not None else delp, axis=1)
        psd_mean = jnp.sum(psd_col * area) / jnp.sum(area)
        dpd = dry_mass - psd_mean
        delp = delp.at[:, -1].add(dpd)

    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    pkz = (pk[:, 1:] - pk[:, :-1]) / (akap * (peln[:, 1:] - peln[:, :-1]))
    ps = pe[:, -1]

    out = dict(delp=delp, pe=pe, peln=peln, pk=pk, pkz=pkz, ps=ps)

    if not hydrostatic or make_nh:
        if delz is None or make_nh:
            # hydrostatic delz from the gas law (p_var:171-183)
            tv = pt * (1.0 + zvir * q["sphum"]) if (q and "sphum" in q) else pt
            delz = -con.RDGAS * tv / con.GRAV * (peln[:, 1:] - peln[:, :-1])
        out["delz"] = delz
        out["w"] = jnp.zeros_like(delp)
    return out


def hydro_eq(npz, ps0, phis, ak, bk, ptop, t0=300.0):
    """Isothermal hydrostatic state over terrain (init_hydro.F90 hydro_eq):
    ps from the hypsometric relation, uniform T. phis [6, n, n] (or
    [6,1,n,n]). Returns (delp, pt, ps)."""
    hs = phis if phis.ndim == 3 else phis[:, 0]
    ps = ps0 * jnp.exp(-hs / (con.RDGAS * t0))
    akl = jnp.asarray(ak).reshape(1, -1, 1, 1)
    bkl = jnp.asarray(bk).reshape(1, -1, 1, 1)
    pe = akl + bkl * ps[:, None]
    delp = pe[:, 1:] - pe[:, :-1]
    pt = jnp.full_like(delp, t0)
    return delp, pt, ps
