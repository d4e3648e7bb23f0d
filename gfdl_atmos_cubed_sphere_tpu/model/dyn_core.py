"""Hydrostatic acoustic-loop core (the 3-D generalization of sw_dynamics).

Re-implements /root/reference/model/dyn_core.F90 (dyn_core:94, geopk:2202,
p_grad_c:1635, one_grad_p:1909) for the hydrostatic Euler equations on
Lagrangian surfaces: per acoustic iteration
  c_sw (per level) -> geopk(C) -> p_grad_c -> halo(uc,vc, divg) ->
  d_sw (per level) -> geopk(D) -> one_grad_p.

Fields are [6, npz, y, x]; level-interface fields [6, npz+1, y, x]. The
reference's OpenMP k-loops are the batched level dimension here.
"""

import math
from dataclasses import dataclass, field
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as con
from ..ops import sw_core
from ..ops.sw_core import _cl, _cr, _rl, _rr
from ..ops.a2b_edge import a2b_ord4
from ..ops.fill_corners import fi, cube_edges

H = 3


@dataclass(frozen=True)
class DynConfig:
    """Hydrostatic-core subset of fv_core_nml (fv_arrays.F90 defaults)."""
    npx: int
    npz: int
    dt: float
    n_split: int = 5
    k_split: int = 1
    hord_mt: int = 10
    hord_vt: int = 10
    hord_tm: int = 10
    hord_dp: int = 10
    hord_tr: int = 8
    q_split: int = 0
    kord_mt: int = 8
    kord_tm: int = -8
    kord_tr: int = 8
    nord: int = 1
    dddmp: float = 0.0
    d2_bg: float = 0.0
    d4_bg: float = 0.16
    # sponge-layer del-2 strengths; the raw fv_arrays defaults (4./2.) are
    # "must specify" sentinels clamped by fv_control.F90:1032 to these values
    d2_bg_k1: float = 0.20
    d2_bg_k2: float = 0.015
    do_vort_damp: bool = True
    vtdm4: float = 0.02
    d_con: float = 0.0
    ke_bg: float = 0.0
    lim_fac: float = 1.0
    n_sponge: int = 1
    tau: float = 0.0
    rf_cutoff: float = 3000.0
    p_fac: float = 0.05
    a_imp: float = 1.0
    # pressure-gradient time off-centering (fv_arrays.F90 beta; beta > 0
    # selects grad1_p_update / split_p_grad)
    beta: float = 0.0
    # external (barotropic) mode damping coefficient (fv_arrays.F90:452)
    d_ext: float = 0.0
    # Riemann substeps for the explicit RIM_2D path (|a_imp| <= 0.5);
    # 0 = auto: 1 + |dt_acoustic| (fv_control.F90:1037-1038 sets
    # m_split = 1 + dt_atmos/(k_split*n_split*|p_split|), i.e. ~1 s each)
    m_split: int = 0
    scale_m: float = 0.0
    d2bg_zq: float = 0.0
    # NH pressure gradient on log-p instead of p**kappa interfaces
    # (fv_arrays.F90 use_logp; dyn_core.F90 pk3 <- peln branch)
    use_logp: bool = False
    hydrostatic: bool = True
    adiabatic: bool = True
    # inline saturation adjustment each acoustic iteration
    # (fv_arrays.F90:364 do_fast_phys; dyn_core.F90:1101)
    do_fast_phys: bool = False
    consv_te: float = 0.0
    # global angular-momentum fixer (fv_arrays.F90 consv_am;
    # fv_dynamics.F90:747-800 -> thermodynamics.am_fixer)
    consv_am: bool = False
    fill: bool = False
    fill_dp: bool = False     # mix_dp delp-floor fixer (dyn_core.F90:820)
    rf_fast: bool = False     # inline Rayleigh friction (dyn_core.F90:1058)
    # bitwise layout-invariant global sums in the energy fixer
    # (fv_control.F90:942 reproduce_sum -> parallel/reductions.py)
    reproduce_sum: bool = False
    is_ideal_case: bool = True
    # acoustic loop as lax.scan (fast compile) vs python-unrolled. Unrolled is
    # required under a GSPMD-sharded mesh: XLA mis-partitions the while-loop
    # body's edge update-slice chains (wrong values / NaN on >1 device,
    # correct unrolled or on one device). See parallel/mesh.py.
    use_scan: bool = True

    # ---- fv_core_nml breadth (fv_arrays.F90:207-906). Every option below
    # is parsed from real SHiELD/GFDL namelists by utils/config.py; ones
    # marked [stored] are accepted + validated but only consumed by the
    # subsystem named in the comment. ---------------------------------------
    nwat: int = 6             # number of water species (0/2/3/6 supported
                              # by neg_adj3/MP; others rejected in __post_init__)
    ncnst: int = 0            # total tracers (0 = from the q dict)
    pnats: int = 0            # [stored] non-advected tracers at the end
    dnats: int = 0            # [stored] dycore-skipped tracers
    dnrts: int = 0            # [stored] non-remapped tracers
    nord_tr: int = 0          # tracer damping order (tracer_2d)
    trdm2: float = 0.0        # tracer del-2 coefficient (tracer_2d)
    kord_wz: int = 9          # w/delz remap order (remap_nh)
    remap_t: bool = True      # remap T (vs theta) — fv_mapz mode
    remap_te: bool = False    # [stored] remap total energy variant
    z_tracer: bool = True     # layer-split tracer advection (tracer_2d IS
                              # the z_tracer=true design; False rejected)
    inline_q: bool = False    # advect q inside the acoustic loop ([stored];
                              # tracer_2d after the loop is the default path)
    range_warn: bool = False  # jit-internal range audits (io.diagnostics)
    fv_debug: bool = False    # [stored] extra prints in drivers
    print_freq: int = 0       # [stored] driver print interval (hours)
    write_3d_diags: bool = True   # [stored] diag manager concern
    nf_omega: int = 1         # del-2 smoothing passes on omega diagnostic
    use_old_omega: bool = True    # [stored] omega from pe vs dp/dt
    convert_ke: bool = False  # [stored] d_con applies to KE directly
    prevent_diss_cooling: bool = False  # [stored] clip diss heating sign
    delt_max: float = 1.0     # max dissipative heating rate (K/s, d_sw)
    do_diss_est: bool = False     # [stored] skeb dissipation estimate diag
    fv_sg_adj: int = -1       # 2dz subgrid mixing timescale (s) — consumed
                              # by ops/fv_sg.fv_sg_adjust via the drivers
    fv_sg_adj_weak: int = -1  # [stored] weak-mixing variant above sg_cutoff
    sg_cutoff: float = -1.0   # fv_sg pressure cutoff (Pa)
    n_zs_filter: int = 0      # terrain filter passes (utils/terrain)
    nord_zs_filter: int = 0   # terrain filter order (utils/terrain)
    full_zs_filter: bool = False  # [stored] filter at init vs restart
    na_init: int = 0          # adiabatic init loops (driver adiabatic_init)
    no_dycore: bool = False   # physics-only mode (driver skips dynamics)
    nudge: bool = False       # grid nudging master switch (physics/nudging)
    nudge_ic: bool = False    # [stored] nudge to a single IC
    nudge_qv: bool = False    # [stored] nudge specific humidity
    nudge_dz: bool = False    # [stored] nudge delz in nest BCs
    breed_vortex_inline: bool = False  # TC breeding (physics/nudging)
    tau_h2o: float = 0.0      # [stored] stratospheric h2o source timescale
    fast_tau_w_sec: float = 0.0   # implicit w sponge at the top (rf_fast)
    dry_mass: float = 98290.0     # target dry mass (io.restart adjustment)
    adjust_dry_mass: bool = False  # (io.restart)
    mountain: bool = False    # [stored] restart has terrain
    p_ref: float = 1.0e5      # reference pressure for pkz/sponge profiles
    check_negative: bool = False  # [stored] MP negative-tracer warnings
    do_held_suarez: bool = False  # Held-Suarez forcing (physics/held_suarez)
    do_f3d: bool = False      # [stored] 3-D Coriolis (shallow-atmosphere
                              # approximation is the only mode)
    fill_wz: bool = False     # [stored] fill w in remap
    fill_gfs: bool = False    # [stored] GFS-style filling in external IC
    filter_phys: bool = False  # [stored]
    dwind_2d: bool = False    # [stored] 2-D A->D wind update variant
    agrid_vel_rst: bool = False   # write A-grid winds to restarts (io)
    restart_from_agrid_winds: bool = False  # (io.restart)
    ignore_rst_cksum: bool = False  # [stored] (io.restart)
    warm_start: bool = False  # [stored] driver concern
    external_eta: bool = False    # ak/bk from file vs set_eta (grid.fv_eta)
    npz_rst: int = 0          # restart vertical remap target (io.restart)
    # nesting / regional group (fv_nest_nml analogs; model/boundary.py,
    # driver/nested.py, driver/regional_cube.py)
    nested: bool = False
    twowaynest: bool = False
    nestbctype: int = 1       # [stored] BC interpolation type
    nestupdate: int = 0       # [stored] two-way update strategy
    nsponge: int = 0          # [stored] nest sponge rows
    s_weight: float = 1.0e-6  # [stored] nest sponge weight
    regional: bool = False
    bc_update_interval: int = 3   # regional BC file cadence (hours)
    nrows_blend: int = 0      # Davies blend rows (fv_regional_bc)
    regional_bcs_from_gsi: bool = False  # [stored]
    write_restart_with_bcs: bool = False  # [stored]
    # planar doubly-periodic grid group (grid_type=4; driver/nested.py)
    dx_const: float = 1000.0
    dy_const: float = 1000.0
    deglat: float = 15.0
    umax: float = 350.0       # [stored] planar max wind for dt estimate
    # coarse-graining output group (utils/coarse_graining)
    write_coarse_restart_files: bool = False
    write_coarse_diagnostics: bool = False
    write_only_coarse_intermediate_restarts: bool = False  # [stored]
    write_coarse_agrid_vel_rst: bool = False  # [stored]
    write_coarse_dgrid_vel_rst: bool = False  # [stored]

    def __post_init__(self):
        if self.nwat not in (0, 2, 3, 6):
            raise ValueError(f"nwat={self.nwat}: only 0/2/3/6 supported "
                             "(fv_sg.neg_adj3 / gfdl_mp categories)")
        if not self.z_tracer:
            raise ValueError("z_tracer=.false. (non-layer-split tracer "
                             "advection) is not supported: tracer_2d is "
                             "the z_tracer design")
        if self.m_split < 0:
            raise ValueError("m_split must be >= 0")


def geopk(delp_p, pt_p, phis_p, akap, ptop):
    """Hydrostatic pressures + geopotential (dyn_core.F90 geopk:2202).

    delp_p, pt_p: [6, K, Y, X] padded; pt is virtual potential temperature.
    Returns pe, peln, pk [6, K+1, Y, X], gz [6, K+1, Y, X], pkz [6, K, Y, X].
    """
    from ..ops import pallas_col
    if pallas_col.use_pallas_col(delp_p):
        # single-HBM-pass fused column kernel (ops/pallas_col.py)
        return pallas_col.geopk_pallas(delp_p, pt_p, phis_p, akap, ptop)
    pe = ptop + jnp.cumsum(delp_p, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    # bottom-up: gz(k) = gz(k+1) + cp_air*pt(k)*(pk(k+1)-pk(k))
    incr = con.CP_AIR * pt_p * (pk[:, 1:] - pk[:, :-1])
    gz_above = jnp.cumsum(incr[:, ::-1], axis=1)[:, ::-1]
    gz = jnp.concatenate([gz_above, jnp.zeros_like(gz_above[:, :1])], axis=1)
    gz = gz + phis_p
    pkz = (pk[:, 1:] - pk[:, :-1]) / (akap * (peln[:, 1:] - peln[:, :-1]))
    return pe, peln, pk, gz, pkz


def p_grad_c(uc, vc, delpc_p, pkc, gz, g, dt2, npx, hydrostatic=True):
    """C-grid pressure-gradient wind update (dyn_core.F90 p_grad_c:1635).

    hydrostatic: wk = pk(k+1)-pk(k) with pkc = pe**kappa;
    nonhydrostatic: wk = delpc with pkc = full pressure (dyn_core.F90:1670).
    """
    f = fi
    wall_c = slice(f(1), f(npx) + 1)
    cell_c = slice(f(1), f(npx - 1) + 1)
    wk = (pkc[:, 1:] - pkc[:, :-1]) if hydrostatic else delpc_p
    gz1 = gz[:, :-1]
    gz2 = gz[:, 1:]
    pk1 = pkc[:, :-1]
    pk2 = pkc[:, 1:]
    termx = ((_cl(gz2) - _cr(gz1)) * (_cr(pk2) - _cl(pk1))
             + (_cl(gz1) - _cr(gz2)) * (_cl(pk2) - _cr(pk1)))
    uc = uc.at[..., cell_c, wall_c].add(
        (dt2 * g.rdxc * termx / (_cl(wk) + _cr(wk)))[..., cell_c, wall_c])
    termy = ((_rl(gz2) - _rr(gz1)) * (_rr(pk2) - _rl(pk1))
             + (_rl(gz1) - _rr(gz2)) * (_rl(pk2) - _rr(pk1)))
    vc = vc.at[..., wall_c, cell_c].add(
        (dt2 * g.rdyc * termy / (_rl(wk) + _rr(wk)))[..., wall_c, cell_c])
    return uc, vc


def _pg_terms(pk, gz, g, npx, ptk):
    """Shared B-grid setup of the D-grid pressure-gradient family:
    corner-interpolated (pk, gz) and the cross-difference hydrostatic
    gradient increments du/dv (the common kernel of one_grad_p:1909,
    grad1_p_update:2033, nh_p_grad:1697, split_p_grad:1795)."""
    f = fi
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    # batched corner interpolation (one kernel launch for pk + gz)
    Kp1 = pk.shape[1]
    bothB = a2b_ord4(jnp.concatenate([pk, gz], axis=1), g)
    pkB = bothB[:, :Kp1]
    gzB = bothB[:, Kp1:]
    pkB = pkB.at[:, 0].set(jnp.full_like(pkB[:, 0], ptk))
    wk = pkB[:, 1:] - pkB[:, :-1]

    cl_ = slice(f(1), f(npx - 1) + 1)
    cr_ = slice(f(2), f(npx) + 1)
    gz1, gz2 = gzB[:, :-1], gzB[:, 1:]
    pk1, pk2 = pkB[:, :-1], pkB[:, 1:]
    du = ((gz2[..., wsl, cl_] - gz1[..., wsl, cr_])
          * (pk2[..., wsl, cr_] - pk1[..., wsl, cl_])
          + (gz1[..., wsl, cl_] - gz2[..., wsl, cr_])
          * (pk2[..., wsl, cl_] - pk1[..., wsl, cr_])) / (
              wk[..., wsl, cl_] + wk[..., wsl, cr_])
    dv = ((gz2[..., cl_, wsl] - gz1[..., cr_, wsl])
          * (pk2[..., cr_, wsl] - pk1[..., cl_, wsl])
          + (gz1[..., cl_, wsl] - gz2[..., cr_, wsl])
          * (pk2[..., cl_, wsl] - pk1[..., cr_, wsl])) / (
              wk[..., cl_, wsl] + wk[..., cr_, wsl])
    return du, dv, (ctr, wsl)


def one_grad_p(u_acc, v_acc, pk, gz, g, dt, npx, ptk, divg2=None):
    """Hydrostatic D-grid pressure gradient (dyn_core.F90 one_grad_p:1909).

    pk, gz: [6, K+1, Y, X] padded cell-point interface fields; u_acc/v_acc
    are the d_sw outputs in circulation form (u*dx + ...). divg2: optional
    external-mode damping potential at interior B points [6, n+1, n+1]
    (d_ext path, one_grad_p's wk1/wk2 diffs). Returns final D winds
    (interior)."""
    du, dv, (ctr, wsl) = _pg_terms(pk, gz, g, npx, ptk)
    d2u = d2v = 0.0
    if divg2 is not None:
        # column-mean potential -> same del-phi increment on every level
        d2u = (divg2[..., :, :-1] - divg2[..., :, 1:])[:, None]
        d2v = (divg2[..., :-1, :] - divg2[..., 1:, :])[:, None]
    u_new = g.rdx[..., wsl, ctr] * (u_acc + d2u + dt * du)
    v_new = g.rdy[..., ctr, wsl] * (v_acc + d2v + dt * dv)
    return u_new, v_new


def grad1_p_update(u_acc, v_acc, pk, gz, g, dt, npx, ptk, du_old, dv_old,
                   beta, divg2=None):
    """Off-centered hydrostatic pressure gradient (dyn_core.F90
    grad1_p_update:2033, beta > 0): the wind gets beta of the PREVIOUS
    acoustic iteration's gradient increment plus (1-beta) of the current
    one; the increments persist across iterations (beta_d = 0 on the
    first iteration, dyn_core.F90:398-406). Returns (u, v, du, dv)."""
    du, dv, (ctr, wsl) = _pg_terms(pk, gz, g, npx, ptk)
    du = dt * du
    dv = dt * dv
    d2u = d2v = 0.0
    if divg2 is not None:
        # column-mean potential -> same del-phi increment on every level
        d2u = (divg2[..., :, :-1] - divg2[..., :, 1:])[:, None]
        d2v = (divg2[..., :-1, :] - divg2[..., 1:, :])[:, None]
    alpha = 1.0 - beta
    u_new = g.rdx[..., wsl, ctr] * (u_acc + beta * du_old + d2u + alpha * du)
    v_new = g.rdy[..., ctr, wsl] * (v_acc + beta * dv_old + d2v + alpha * dv)
    return u_new, v_new, du, dv


def external_mode_divg2(delp_p, divg_p, g, d_ext, npx):
    """External (barotropic) mode damping potential (dyn_core.F90:828-846):
    divg2 = d_ext * da_min_c * column mass-weighted mean of the B-grid
    divergence. delp_p padded cells [6,K,Y,X]; divg_p padded corner
    divergence [6,K,NW,NW]. Returns [6, n+1, n+1] interior corners."""
    from ..ops.a2b_edge import a2b_ord2
    f = fi
    wsl = slice(f(1), f(npx) + 1)
    delp_b = a2b_ord2(delp_p, g)[..., wsl, wsl]     # interior corners
    dv = divg_p[..., wsl, wsl]
    wsum = jnp.sum(delp_b, axis=1)
    return (d_ext * g.da_min_c) * jnp.sum(delp_b * dv, axis=1) / wsum


def _sponge_groups(cfg):
    """Per-level damping parameters (dyn_core.F90:675-733 sponge logic).

    Returns a list of (k_slice, overrides) groups: level 0 (and 1 if
    d2_bg_k2 > 0.01) get del-2 divergence damping; the rest use cfg values.
    """
    groups = []
    base = dict(nord=cfg.nord, d2_divg=min(0.20, cfg.d2_bg),
                nord_v=min(2, cfg.nord),
                damp_v=cfg.vtdm4 if cfg.do_vort_damp else 0.0,
                d_con=cfg.d_con)
    if cfg.npz == 1 or cfg.n_sponge < 0:
        groups.append((slice(0, cfg.npz), dict(base, d2_divg=cfg.d2_bg)))
        return groups
    top = dict(base, sponge=True)
    top.update(nord=0, d2_divg=(max(cfg.d2_bg, cfg.d2_bg_k1) if cfg.is_ideal_case
                                else max(0.01, cfg.d2_bg, cfg.d2_bg_k1)),
               d_con=0.0)
    if cfg.do_vort_damp:
        top.update(nord_v=0, damp_v=0.5 * top["d2_divg"])
    groups.append((slice(0, 1), top))
    k0 = 1
    if cfg.d2_bg_k2 > 0.01:
        lvl2 = dict(base, sponge=True)
        lvl2.update(nord=0, d2_divg=max(cfg.d2_bg, cfg.d2_bg_k2), d_con=0.0)
        if cfg.do_vort_damp:
            lvl2.update(nord_v=0, damp_v=0.5 * lvl2["d2_divg"])
        groups.append((slice(1, 2), lvl2))
        k0 = 2
        if cfg.d2_bg_k2 > 0.05:
            lvl3 = dict(base, sponge=True)
            lvl3.update(nord=0, d2_divg=max(cfg.d2_bg, 0.2 * cfg.d2_bg_k2),
                        d_con=0.0)
            groups.append((slice(2, 3), lvl3))
            k0 = 3
    groups.append((slice(k0, cfg.npz), base))
    return groups


def _sponge_level_params(cfg):
    """Flatten _sponge_groups into per-level damping profiles so the whole
    column runs through ONE d_sw call (instead of one call per group —
    4500+ ops/iteration saved; see PERFORMANCE.md). Returns kwargs for
    d_sw's merged-sponge path."""
    groups = _sponge_groups(cfg)
    K = cfg.npz
    d2 = np.zeros(K)
    dcon = np.zeros(K)
    nord_mask = np.zeros(K, bool)
    dv_base = np.zeros(K)       # (damp_v, nord_v=min(2,nord)) combo
    dv_sponge = np.zeros(K)     # (damp_v, nord_v=0) sponge combo
    dw_base = np.zeros(K)
    dw_sponge = np.zeros(K)
    nv_base = min(2, cfg.nord)
    for ksl, p in groups:
        d2[ksl] = p["d2_divg"]
        dcon[ksl] = p["d_con"]
        if p["nord"] == 0 and cfg.nord > 0:
            nord_mask[ksl] = True
        # vorticity/delp damping: the (nord_v=0, 0.5*d2) sponge combo
        if p["nord_v"] == 0 and nv_base > 0:
            dv_sponge[ksl] = p["damp_v"]
        else:
            dv_base[ksl] = p["damp_v"]
        # nonhydro w damping: ALL sponge levels use damp_w = d2_divg with
        # nord_w = 0, unconditionally (dyn_core.F90:709/720/730-731)
        if p.get("sponge") and nv_base > 0:
            dw_sponge[ksl] = p["d2_divg"]
        elif p.get("sponge"):
            dw_base[ksl] = p["d2_divg"]
        else:
            dw_base[ksl] = p["damp_v"]
    return dict(
        nord=cfg.nord, nord_v=nv_base, d2_bg=d2, d_con=dcon,
        nord_mask=nord_mask if nord_mask.any() else None,
        damp_v=dv_base, damp_v2=dv_sponge if dv_sponge.any() else None,
        nord_v2=0,
        damp_w=dw_base, damp_w2=dw_sponge if dw_sponge.any() else None,
        nord_w=nv_base, nord_w2=0)


def mix_dp(delp, pt, w, dpmin, hydrostatic=True):
    """delp floor fixer (dyn_core.F90 mix_dp:2119): any layer thinner than
    1% of its reference thickness borrows mass from the layer below (bottom
    layer borrows from above), mass-weight-mixing pt (and w) so the column
    stays conservative. Sequential in k (level k's deficit thins level k+1
    before k+1 is tested) => a top-down lax.scan over levels.

    delp, pt, w: [T, K, y, x]; dpmin: [K] static reference floor.
    """
    K = delp.shape[1]
    dpm = np.asarray(dpmin, np.float64)
    w_ = w if (w is not None and not hydrostatic) else jnp.zeros_like(delp)

    # xs: level k+1 fields + level-k floor, scanned k = 0 .. K-2
    mv = lambda a: jnp.moveaxis(a[:, 1:], 1, 0)
    xs = (mv(delp), mv(pt), mv(w_),
          jnp.asarray(dpm[:-1], delp.dtype).reshape(K - 1, 1, 1, 1))

    def step(carry, x):
        d_cur, p_cur, w_cur = carry
        d_nxt, p_nxt, w_nxt, floor = x
        bad = ~(d_cur >= floor)                       # catches NaN too
        dp = floor - d_cur
        p_out = jnp.where(bad, (p_cur * d_cur + p_nxt * dp) / floor, p_cur)
        w_out = jnp.where(bad, (w_cur * d_cur + w_nxt * dp) / floor, w_cur)
        d_out = jnp.where(bad, floor, d_cur)
        d_nxt = jnp.where(bad, d_nxt - dp, d_nxt)
        return (d_nxt, p_nxt, w_nxt), (d_out, p_out, w_out)

    carry0 = (delp[:, 0], pt[:, 0], w_[:, 0])
    (d_last, p_last, w_last), (d_up, p_up, w_up) = jax.lax.scan(
        step, carry0, xs)

    # bottom level borrows from (already-fixed) level K-2
    floor = jnp.asarray(dpm[-1], delp.dtype)
    bad = ~(d_last >= floor)
    dp = floor - d_last
    p_last = jnp.where(bad, (p_last * d_last + p_up[-1] * dp) / floor, p_last)
    w_last = jnp.where(bad, (w_last * d_last + w_up[-1] * dp) / floor, w_last)
    d_last = jnp.where(bad, floor, d_last)
    d_up = d_up.at[-1].set(jnp.where(bad, d_up[-1] - dp, d_up[-1]))

    cat = lambda up, last: jnp.concatenate(
        [jnp.moveaxis(up, 0, 1), last[:, None]], axis=1)
    delp = cat(d_up, d_last)
    pt = cat(p_up, p_last)
    if w is not None and not hydrostatic:
        w = cat(w_up, w_last)
    return delp, pt, w


def ray_fast_profile(ak, bk, dt, tau, rf_cutoff, ptop, p_ref=1.e5):
    """Static per-level profile for the inline Rayleigh friction
    (dyn_core.F90 Ray_fast:2485 setup block). Returns (rf[K], dp_ref[K],
    dm, k_rf); rf == 1 below the cutoff."""
    ak = np.asarray(ak, np.float64)
    bk = np.asarray(bk, np.float64)
    K = ak.size - 1
    ph = ak + bk * p_ref
    ph = np.maximum(ph, 1e-8)
    pfull = (ph[1:] - ph[:-1]) / np.log(ph[1:] / ph[:-1])
    dp_ref = np.diff(ak) + np.diff(bk) * 1.e5
    rf = np.ones(K)
    tau0 = tau * 86400.0
    for k in range(K):
        if pfull[k] < rf_cutoff:
            rff = dt / tau0 * np.sin(
                0.5 * np.pi * np.log(rf_cutoff / pfull[k])
                / np.log(rf_cutoff / ptop)) ** 2
            rf[k] = 1.0 / (1.0 + rff)
        else:
            break
    ks = max(int(np.sum(bk == 0.0)) - 1, 0)   # pure-pressure levels
    dm = 0.0
    k_rf = 0
    for k in range(ks):
        if pfull[k] < rf_cutoff + min(100.0, 10.0 * ptop):
            dm += dp_ref[k]
            k_rf = k + 1
        else:
            break
    return rf, dp_ref, dm, k_rf


def ray_fast(u, v, w, rf, dp_ref, dm, k_rf, hydrostatic=True):
    """Momentum-conserving inline Rayleigh damping (dyn_core.F90
    Ray_fast:2551-2599): damp u/v/w above rf_cutoff, deposit the removed
    (mass-weighted) momentum uniformly into the top k_rf pressure levels."""
    K = u.shape[1]
    sh = (1, K, 1, 1)
    rfb = jnp.asarray(rf, u.dtype).reshape(sh)
    dpb = jnp.asarray(dp_ref, u.dtype).reshape(sh)
    kmask = jnp.asarray(np.arange(K) < k_rf, u.dtype).reshape(sh)
    loss = (1.0 - rfb) * dpb
    if dm > 0.0 and k_rf > 0:
        dmu = jnp.sum(loss * u, axis=1, keepdims=True) / dm
        dmv = jnp.sum(loss * v, axis=1, keepdims=True) / dm
    else:
        dmu = dmv = 0.0
    u = u * rfb + kmask * dmu
    v = v * rfb + kmask * dmv
    if w is not None and not hydrostatic:
        w = w * rfb
    return u, v, w


def dyn_core_hydro(delp, pt, u, v, phis, g, cfg: DynConfig, akap, ptop,
                   n_split, dt_acoustic, ak=None, bk=None):
    """Run the acoustic loop; returns updated fields + accumulated tracer
    transport info (mfx/mfy/cx/cy on compute walls) + final pressures."""
    halo = g.halo
    f = fi
    npx = g.npx
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    dt = dt_acoustic
    dt2 = 0.5 * dt
    ptk = ptop ** akap
    phis_p = g.phis_p

    pl = _sponge_level_params(cfg)
    dpmin = rfp = None
    if ak is not None and cfg.fill_dp:
        dpmin = 0.01 * (np.diff(np.asarray(ak, np.float64))
                        + np.diff(np.asarray(bk, np.float64)) * 1.e5)
    if ak is not None and cfg.rf_fast and cfg.tau > 0.0:
        rfp = ray_fast_profile(ak, bk, abs(dt), cfg.tau, cfg.rf_cutoff, ptop)

    def body(carry, _):
        # Carry holds PADDED (delp, pt): the cell-group exchange issued
        # after d_sw/mix_dp serves both that iteration's geopk(D) and the
        # next iteration's c_sw — the reference's deferred-completion
        # grouped pack (dyn_core.F90:823-851). One cell-group exchange
        # per acoustic iteration instead of two.
        delp_p, pt_p, u, v, mfx, mfy, cx, cy, it, dup, dvp = carry
        # reconcile duplicated tile-edge walls every iteration: the one-sided
        # edge stencils are not exactly mirror-symmetric across tiles, and
        # unreconciled walls (~1e-6 rel after one iteration) break the
        # telescoping of mass fluxes => global mass drift. With this, delp
        # mass conserves to ~1e-14/step (cf. dyn_core.F90:1152-1170, which
        # reconciles only at it==n_split for comm cost).
        u, v = halo.reconcile_dgrid(u, v)
        u_p, v_p = halo.pad_dgrid(u, v, names=("u", "v"))

        from ..ops import pallas_csw
        if pallas_csw.use_pallas_csw(delp_p,
                                     cube_edges(g), False):
            # one Pallas program per (tile, level): whole C-grid half-step
            # in VMEM (ops/pallas_csw.py)
            cs = pallas_csw.c_sw_pallas(delp_p, pt_p, None, u_p, v_p, g,
                                        dt2, hydrostatic=True, nord=cfg.nord)
        else:
            cs = sw_core.c_sw(delp_p, pt_p, None, u_p, v_p, g, dt2,
                              hydrostatic=True, nord=cfg.nord, sw_mode=False)
        from ..ops import pallas_col
        if pallas_col.use_pallas_pg(cs.delpc):
            # fused geopk(C) + p_grad_c: pe/pk/gz never leave VMEM
            # (ops/pallas_col.pgradc_fused_pallas)
            uc, vc = pallas_col.pgradc_fused_pallas(
                cs.delpc, cs.ptc, phis_p, cs.uc, cs.vc, g, dt2, akap,
                ptop, npx)
        else:
            _, _, pkc, gzc, _ = geopk(cs.delpc, cs.ptc, phis_p, akap, ptop)
            uc, vc = p_grad_c(cs.uc, cs.vc, cs.delpc, pkc, gzc, g, dt2, npx)
        uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr],
                                    names=("uc", "vc"))
        divg_p = None
        if cfg.nord > 0:
            divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl], name="divg")

        # merged d_sw: the reference's per-sponge-group dispatch collapsed
        # into one full-K call with per-level damping profiles
        from ..ops import pallas_dsw
        dsw_kw = dict(
            dt=dt, hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
            hord_dp=cfg.hord_dp, hord_tm=cfg.hord_tm,
            dddmp=cfg.dddmp, d4_bg=cfg.d4_bg,
            hydrostatic=True, lim_fac=cfg.lim_fac,
            **{k: pl[k] for k in ("nord", "nord_v", "d2_bg", "d_con",
                                  "nord_mask", "damp_v", "damp_v2",
                                  "nord_v2")})
        if pallas_dsw.use_pallas_dsw(delp_p, cube_edges(g),
                                     cfg.dddmp, False, False):
            # whole D-grid step per (tile, level) in VMEM (ops/pallas_dsw.py)
            ds = pallas_dsw.d_sw_pallas(
                delp_p, pt_p, None, u_p, v_p, uc_p, vc_p, cs.ua, cs.va,
                divg_p, g, **dsw_kw)
        else:
            ds = sw_core.d_sw(
                delp_p, pt_p, None, u_p, v_p, uc_p, vc_p, cs.ua, cs.va,
                divg_p, g, sw_mode=False, **dsw_kw)

        divg2 = None
        if cfg.d_ext > 0.0 and divg_p is not None:
            # external-mode damping potential (dyn_core.F90:828-846)
            divg2 = external_mode_divg2(delp_p, divg_p, g, cfg.d_ext, npx)

        delp = ds.delp
        pt = ds.pt
        if dpmin is not None:
            delp, pt, _ = mix_dp(delp, pt, None, dpmin, hydrostatic=True)
        mfx, mfy = mfx + ds.fx, mfy + ds.fy
        cx, cy = cx + ds.crx, cy + ds.cry

        # the one cell-group exchange: serves geopk(D) now and the next
        # iteration's c_sw (see carry note above)
        delp_p, pt_p = halo.pad_cells((delp, pt), names=("delp", "pt"))
        if pallas_col.use_pallas_pg(delp_p):
            # slim D-stage geopk: one HBM round trip for (pk, gz)
            pk, gz = pallas_col.pkgz_pallas(delp_p, pt_p, phis_p, akap,
                                            ptop)
        else:
            _, _, pk, gz, _ = geopk(delp_p, pt_p, phis_p, akap, ptop)
        if cfg.beta > 0.0:
            beta_eff = jnp.where(it == 0, 0.0, cfg.beta)
            u, v, dup, dvp = grad1_p_update(ds.u, ds.v, pk, gz, g, dt, npx,
                                            ptk, dup, dvp, beta_eff,
                                            divg2=divg2)
        else:
            u, v = one_grad_p(ds.u, ds.v, pk, gz, g, dt, npx, ptk,
                              divg2=divg2)
        if rfp is not None:
            u, v, _ = ray_fast(u, v, None, *rfp)
        return (delp_p, pt_p, u, v, mfx, mfy, cx, cy, it + 1,
                dup, dvp), None

    T = delp.shape[0]
    K = delp.shape[1]
    NC, NW = n + 2 * H, n + 1 + 2 * H
    # 0*delp term: ties the zero capacitors to the sharded state so their
    # shard_map "varying" type matches the scan body outputs (scan-vma rule)
    zsh = lambda *s: jnp.zeros((T, K) + s, delp.dtype) + 0.0 * delp[:, :, :1, :1]
    # prologue exchange: the body carries padded (delp, pt)
    delp_p0, pt_p0 = halo.pad_cells((delp, pt), names=("delp", "pt"))
    carry0 = (delp_p0, pt_p0, u, v, zsh(n, n + 1), zsh(n + 1, n),
              zsh(NC, NW), zsh(NW, NC), jnp.int32(0), u * 0.0, v * 0.0)
    if cfg.use_scan:
        # lax.scan keeps compile time O(1) in n_split (single-device path;
        # under a GSPMD mesh use_scan=False — see parallel/mesh.py note)
        carry, _ = jax.lax.scan(body, carry0, None, length=n_split)
    else:
        carry = carry0
        for _ in range(n_split):
            carry, _ = body(carry, None)
    delp_p, pt_p, u, v, mfx, mfy, cx, cy = carry[:8]
    delp = delp_p[..., ctr, ctr]
    pt = pt_p[..., ctr, ctr]
    # prevent accumulation of rounding/one-sided-stencil differences at the
    # duplicated tile-edge walls (dyn_core.F90:1152-1170)
    u, v = halo.reconcile_dgrid(u, v)
    pe, peln, pk, gz, pkz = geopk(delp_p, pt_p, phis_p, akap, ptop)
    return SimpleNamespace(delp=delp, pt=pt, u=u, v=v,
                           mfx=mfx, mfy=mfy, cx=cx, cy=cy,
                           pe=pe, peln=peln, pk=pk, pkz=pkz, gz=gz)


def nh_p_grad(u_acc, v_acc, pp, pk3, gz, delp_p, g, dt, npx, ptk):
    """Nonhydrostatic dual pressure gradient (dyn_core.F90 nh_p_grad:1696).

    pp: nonhydro pressure perturbation at interfaces [6,K+1,Y,X] padded;
    pk3: hydrostatic pe**kappa interfaces; gz: geopotential interfaces
    (zh*grav); delp_p: padded layer thickness. u_acc/v_acc are d_sw outputs
    in circulation form. Returns final interior D winds."""
    f = fi
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)

    # one batched corner interpolation for all four operands (levels are
    # the kernel batch axis): 1 launch instead of 4
    Kp1 = pp.shape[1]
    K = delp_p.shape[1]
    allB = a2b_ord4(jnp.concatenate([pp, pk3, gz, delp_p], axis=1), g)
    ppB = allB[:, :Kp1]
    pkB = allB[:, Kp1:2 * Kp1]
    gzB = allB[:, 2 * Kp1:3 * Kp1]
    dpB = allB[:, 3 * Kp1:]
    ppB = ppB.at[:, 0].set(jnp.zeros_like(ppB[:, 0]))
    pkB = pkB.at[:, 0].set(jnp.full_like(pkB[:, 0], ptk))

    wk = pkB[:, 1:] - pkB[:, :-1]
    cl_ = slice(f(1), f(npx - 1) + 1)
    cr_ = slice(f(2), f(npx) + 1)

    gz1, gz2 = gzB[:, :-1], gzB[:, 1:]
    pk1, pk2 = pkB[:, :-1], pkB[:, 1:]
    pp1, pp2 = ppB[:, :-1], ppB[:, 1:]

    # u update (y-walls): pairs along x
    du1 = dt / (wk[..., wsl, cl_] + wk[..., wsl, cr_]) * (
        (gz2[..., wsl, cl_] - gz1[..., wsl, cr_])
        * (pk2[..., wsl, cr_] - pk1[..., wsl, cl_])
        + (gz1[..., wsl, cl_] - gz2[..., wsl, cr_])
        * (pk2[..., wsl, cl_] - pk1[..., wsl, cr_]))
    du2 = dt / (dpB[..., wsl, cl_] + dpB[..., wsl, cr_]) * (
        (gz2[..., wsl, cl_] - gz1[..., wsl, cr_])
        * (pp2[..., wsl, cr_] - pp1[..., wsl, cl_])
        + (gz1[..., wsl, cl_] - gz2[..., wsl, cr_])
        * (pp2[..., wsl, cl_] - pp1[..., wsl, cr_]))
    u_new = (u_acc + du1 + du2) * g.rdx[..., wsl, ctr]

    dv1 = dt / (wk[..., cl_, wsl] + wk[..., cr_, wsl]) * (
        (gz2[..., cl_, wsl] - gz1[..., cr_, wsl])
        * (pk2[..., cr_, wsl] - pk1[..., cl_, wsl])
        + (gz1[..., cl_, wsl] - gz2[..., cr_, wsl])
        * (pk2[..., cl_, wsl] - pk1[..., cr_, wsl]))
    dv2 = dt / (dpB[..., cl_, wsl] + dpB[..., cr_, wsl]) * (
        (gz2[..., cl_, wsl] - gz1[..., cr_, wsl])
        * (pp2[..., cr_, wsl] - pp1[..., cl_, wsl])
        + (gz1[..., cl_, wsl] - gz2[..., cr_, wsl])
        * (pp2[..., cl_, wsl] - pp1[..., cr_, wsl]))
    v_new = (v_acc + dv1 + dv2) * g.rdy[..., ctr, wsl]
    return u_new, v_new


def split_p_grad(u_acc, v_acc, pp, pk3, gz, delp_p, g, dt, npx, ptk,
                 du_old, dv_old, beta):
    """Off-centered nonhydrostatic dual pressure gradient (dyn_core.F90
    split_p_grad:1795, beta > 0): the HYDROSTATIC part is time-split
    (beta of the previous iteration's increment + (1-beta) of the current),
    the nonhydrostatic perturbation part is applied fully each iteration.
    Returns (u, v, du, dv) with the new hydrostatic increments carried to
    the next acoustic iteration (beta_d = 0 on the first,
    dyn_core.F90:398-406)."""
    f = fi
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)

    # one batched corner interpolation for all four operands (levels are
    # the kernel batch axis): 1 launch instead of 4
    Kp1 = pp.shape[1]
    K = delp_p.shape[1]
    allB = a2b_ord4(jnp.concatenate([pp, pk3, gz, delp_p], axis=1), g)
    ppB = allB[:, :Kp1]
    pkB = allB[:, Kp1:2 * Kp1]
    gzB = allB[:, 2 * Kp1:3 * Kp1]
    dpB = allB[:, 3 * Kp1:]
    ppB = ppB.at[:, 0].set(jnp.zeros_like(ppB[:, 0]))
    pkB = pkB.at[:, 0].set(jnp.full_like(pkB[:, 0], ptk))

    wk = pkB[:, 1:] - pkB[:, :-1]
    cl_ = slice(f(1), f(npx - 1) + 1)
    cr_ = slice(f(2), f(npx) + 1)
    gz1, gz2 = gzB[:, :-1], gzB[:, 1:]
    pk1, pk2 = pkB[:, :-1], pkB[:, 1:]
    pp1, pp2 = ppB[:, :-1], ppB[:, 1:]
    alpha = 1.0 - beta

    du1 = dt / (wk[..., wsl, cl_] + wk[..., wsl, cr_]) * (
        (gz2[..., wsl, cl_] - gz1[..., wsl, cr_])
        * (pk2[..., wsl, cr_] - pk1[..., wsl, cl_])
        + (gz1[..., wsl, cl_] - gz2[..., wsl, cr_])
        * (pk2[..., wsl, cl_] - pk1[..., wsl, cr_]))
    du2 = dt / (dpB[..., wsl, cl_] + dpB[..., wsl, cr_]) * (
        (gz2[..., wsl, cl_] - gz1[..., wsl, cr_])
        * (pp2[..., wsl, cr_] - pp1[..., wsl, cl_])
        + (gz1[..., wsl, cl_] - gz2[..., wsl, cr_])
        * (pp2[..., wsl, cl_] - pp1[..., wsl, cr_]))
    u_new = (u_acc + beta * du_old + alpha * du1 + du2) * g.rdx[..., wsl, ctr]

    dv1 = dt / (wk[..., cl_, wsl] + wk[..., cr_, wsl]) * (
        (gz2[..., cl_, wsl] - gz1[..., cr_, wsl])
        * (pk2[..., cr_, wsl] - pk1[..., cl_, wsl])
        + (gz1[..., cl_, wsl] - gz2[..., cr_, wsl])
        * (pk2[..., cl_, wsl] - pk1[..., cr_, wsl]))
    dv2 = dt / (dpB[..., cl_, wsl] + dpB[..., cr_, wsl]) * (
        (gz2[..., cl_, wsl] - gz1[..., cr_, wsl])
        * (pp2[..., cr_, wsl] - pp1[..., cl_, wsl])
        + (gz1[..., cl_, wsl] - gz2[..., cr_, wsl])
        * (pp2[..., cl_, wsl] - pp1[..., cr_, wsl]))
    v_new = (v_acc + beta * dv_old + alpha * dv1 + dv2) * g.rdy[..., ctr, wsl]
    return u_new, v_new, du1, dv1


def dyn_core_nh(delp, pt, u, v, w, delz, phis, g, cfg: DynConfig, akap, ptop,
                n_split, dt_acoustic, dp0, ak=None, bk=None,
                q=None, fast_cfg=None, zvir=0.0):
    """Nonhydrostatic acoustic loop (dyn_core.F90, hydrostatic=.false.):
    per iteration c_sw -> update_dz_c -> Riem_Solver_C -> p_grad_c ->
    d_sw -> update_dz_d -> Riem_Solver3 (SIM1) -> nh_p_grad
    [-> fast_phys saturation adjustment when fast_cfg is given
    (do_fast_phys hook, dyn_core.F90:1101-1109 / fast_phys.F90:58)].

    w, delz: [6, K, n, n] interior; q optional tracer dict carried through
    the loop for fast_phys. Returns updated fields + flux capacitors +
    final pressures (pe/peln/pk/pkz on padded frame) + q.
    """
    from ..ops import nh_core
    if fast_cfg is not None and q:
        from ..physics.gfdl_mp import fast_sat_adj
    else:
        fast_cfg = None

    halo = g.halo
    f = fi
    npx = g.npx
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(f(1), f(npx) + 1)
    dt = dt_acoustic
    dt2 = 0.5 * dt
    # top-interface value of the pk3 field the NH p-grad differentiates:
    # log(ptop) under use_logp, else ptop**kappa (dyn_core.F90 peln1/ptk)
    ptk = math.log(ptop) if cfg.use_logp else ptop ** akap
    phis_p = g.phis_p
    phis2 = phis_p[:, 0] if phis_p.ndim == 4 else phis_p
    zs_p = phis2 / con.GRAV                       # [6, Y, X] surface height
    pl = _sponge_level_params(cfg)
    dp0 = np.asarray(dp0, np.float64)   # static host profile
    dpmin = rfp = None
    if ak is not None and cfg.fill_dp:
        dpmin = 0.01 * (np.diff(np.asarray(ak, np.float64))
                        + np.diff(np.asarray(bk, np.float64)) * 1.e5)
    if ak is not None and cfg.rf_fast and cfg.tau > 0.0:
        rfp = ray_fast_profile(ak, bk, abs(dt), cfg.tau, cfg.rf_cutoff, ptop)
    ms = cfg.m_split if cfg.m_split > 0 else 1 + int(abs(dt))

    # initial height interfaces from delz (dyn_core.F90: zh saved from gz)
    def zh_from_delz(dz_int):
        incr = jnp.cumsum(dz_int[:, ::-1], axis=1)[:, ::-1]
        zs_i = zs_p[..., ctr, ctr]
        return jnp.concatenate([zs_i[:, None] - incr, zs_i[:, None]], axis=1)

    zh = zh_from_delz(delz)

    qkeys = tuple(sorted(q)) if fast_cfg is not None else ()
    rrg = -con.RDGAS / con.GRAV
    akx = akap / (1.0 - akap)

    def body(carry, _):
        # The carry holds PADDED (delp, pt, w, zh): the cell-group halo
        # exchange issued after d_sw/mix_dp in the previous iteration
        # serves both that iteration's Riemann solver and this
        # iteration's c_sw — the deferred-completion schedule of the
        # reference's grouped packs (fv_dynamics.F90:462-490 start,
        # dyn_core.F90:823-851 complete-at-use), with w/zh halos
        # regenerated locally by the columnar Riemann solve instead of
        # re-exchanged. Exchanges per acoustic iteration: dgrid(u,v),
        # cgrid(uc,vc), corner(divg), cell zh_int, cell group
        # (delp,pt,w) — the top-of-iteration cell group + zh pads of the
        # naive schedule are eliminated.
        (delp_p, pt_p, u, v, w_p, zh_p, ws_c, mfx, mfy, cx, cy, it,
         dup, dvp, qv_t) = carry
        u, v = halo.reconcile_dgrid(u, v)
        u_p, v_p = halo.pad_dgrid(u, v, names=("u", "v"))

        from ..ops import pallas_csw, pallas_dsw
        if pallas_csw.use_pallas_csw(delp_p,
                                     cube_edges(g), False):
            cs = pallas_csw.c_sw_pallas(delp_p, pt_p, w_p, u_p, v_p, g, dt2,
                                        hydrostatic=False, nord=cfg.nord)
        else:
            cs = sw_core.c_sw(delp_p, pt_p, w_p, u_p, v_p, g, dt2,
                              hydrostatic=False, nord=cfg.nord,
                              sw_mode=False)
        gz_c, ws3 = nh_core.update_dz_c(g, cs.ut, cs.vt, zh_p, zs_p, dp0,
                                        dt2, npx)
        pkc, gzc = nh_core.riem_solver_c(dt2, cs.delpc, cs.ptc, cs.wc, gz_c,
                                         phis2, ws3, akap, ptop, cfg.p_fac,
                                         a_imp=cfg.a_imp, ms=ms)
        uc, vc = p_grad_c(cs.uc, cs.vc, cs.delpc, pkc, gzc, g, dt2, npx,
                          hydrostatic=False)
        uc_p, vc_p = halo.pad_cgrid(uc[..., ctr, wsl], vc[..., wsl, ctr],
                                    names=("uc", "vc"))
        divg_p = None
        if cfg.nord > 0:
            divg_p = halo.pad_corner(cs.divg_d[..., wsl, wsl], name="divg")

        dsw_kw = dict(
            dt=dt, hord_mt=cfg.hord_mt, hord_vt=cfg.hord_vt,
            hord_dp=cfg.hord_dp, hord_tm=cfg.hord_tm,
            dddmp=cfg.dddmp, d4_bg=cfg.d4_bg,
            ke_bg=cfg.ke_bg, hydrostatic=False,
            lim_fac=cfg.lim_fac, **pl)
        if pallas_dsw.use_pallas_dsw(delp_p, cube_edges(g),
                                     cfg.dddmp, False, False):
            ds = pallas_dsw.d_sw_pallas(
                delp_p, pt_p, w_p, u_p, v_p, uc_p, vc_p, cs.ua, cs.va,
                divg_p, g, **dsw_kw)
        else:
            ds = sw_core.d_sw(
                delp_p, pt_p, w_p, u_p, v_p, uc_p, vc_p, cs.ua, cs.va,
                divg_p, g, sw_mode=False, **dsw_kw)

        delp = ds.delp
        pt = ds.pt
        w = ds.w
        if dpmin is not None:
            delp, pt, w = mix_dp(delp, pt, w, dpmin, hydrostatic=False)
        crx, cry = ds.crx, ds.cry
        xfx, yfx = ds.xfx, ds.yfx
        mfx, mfy = mfx + ds.fx, mfy + ds.fy
        cx, cy = cx + crx, cy + cry

        # START the cell-group exchange as soon as the fields settle
        # (dyn_core.F90:823-825): update_dz_d below depends only on the
        # d_sw fluxes + the OLD zh halos, so its stencil work is the
        # overlap window XLA schedules against the collective.
        delp_p, pt_p, w_p = halo.pad_cells(
            (delp, pt, w), names=("delp", "pt", "w"))

        # D-stage height advection on the pre-update zh
        damp_zh = cfg.vtdm4 if cfg.do_vort_damp else 0.0
        zh_int, _ = nh_core.update_dz_d(g, zh_p, crx, cry, xfx, yfx,
                                        zs_p[..., ctr, ctr], dp0, dt,
                                        cfg.hord_tm, npx,
                                        damp_zh, min(2, cfg.nord),
                                        lim_fac=cfg.lim_fac)
        zh_p2 = halo.pad_cell(zh_int, name="zh")
        rdt = 1.0 / dt
        ws_full = (zs_p - zh_p2[:, -1]) * rdt

        rs = nh_core.riem_solver3(dt, delp_p, pt_p, w_p, zh_p2, zs_p,
                                  ws_full, akap, ptop, cfg.p_fac,
                                  use_logp=cfg.use_logp,
                                  a_imp=cfg.a_imp, scale_m=cfg.scale_m,
                                  d2bg_zq=cfg.d2bg_zq, ms=ms)
        # The Riemann solve is purely columnar and its padded inputs are
        # halo-valid, so rs.w / rs.zh halo columns equal the neighbors'
        # interiors: carry them padded — no w or zh exchange next
        # iteration.
        w_p = rs.w
        zh_p = rs.zh
        gz_geo = rs.zh * con.GRAV
        if cfg.beta > 0.0:
            beta_eff = jnp.where(it == 0, 0.0, cfg.beta)
            u, v, dup, dvp = split_p_grad(ds.u, ds.v, rs.ppe, rs.pk3,
                                          gz_geo, delp_p, g, dt, npx,
                                          ptk, dup, dvp, beta_eff)
        else:
            u, v = nh_p_grad(ds.u, ds.v, rs.ppe, rs.pk3, gz_geo,
                             delp_p, g, dt, npx, ptk)
        if rfp is not None:
            # w damping is pointwise-columnar: apply to the PADDED w so
            # the carried halos stay valid under rf_fast
            u, v, w_p = ray_fast(u, v, w_p, *rfp, hydrostatic=False)
        if fast_cfg is not None:
            # inline saturation adjustment on theta_v (fast_phys hook):
            # recover pkz from the gas law, adjust T/q, restore theta_v.
            # Interior-only update: the carried pt halo stays one phase
            # stale under fast_phys, exactly the reference schedule (the
            # pt pack is started at dyn_core.F90:823, fast_phys runs at
            # :1105 after it).
            zh_i = zh_p[..., ctr, ctr]
            delz_in = zh_i[:, 1:] - zh_i[:, :-1]
            pkz = jnp.exp(akx * jnp.log(rrg * delp / delz_in * pt))
            qd = dict(zip(qkeys, qv_t))
            tvir = pt * pkz
            t_abs = tvir / (1.0 + zvir * qd["sphum"]) if zvir else tvir
            t_new, qd = fast_sat_adj(t_abs, delp, delz_in, qd, dt, ptop,
                                     cfg=fast_cfg, hydrostatic=False)
            tv_new = (t_new * (1.0 + zvir * qd["sphum"]) if zvir else t_new)
            pt = tv_new / pkz
            pt_p = pt_p.at[..., ctr, ctr].set(pt)
            qv_t = tuple(qd[k] for k in qkeys)
        ws_c = ws_full[..., ctr, ctr]
        return (delp_p, pt_p, u, v, w_p, zh_p, ws_c, mfx, mfy, cx, cy,
                it + 1, dup, dvp, qv_t), rs.pem

    T = delp.shape[0]
    K = delp.shape[1]
    NC, NW = n + 2 * H, n + 1 + 2 * H
    # 0*delp term: ties the zero capacitors to the sharded state so their
    # shard_map "varying" type matches the scan body outputs (scan-vma rule)
    zsh = lambda *s: jnp.zeros((T, K) + s, delp.dtype) + 0.0 * delp[:, :, :1, :1]
    qv0 = tuple(q[k] for k in qkeys)
    # prologue exchange: the body carries padded fields (see body docs)
    delp_p0, pt_p0, w_p0 = halo.pad_cells((delp, pt, w),
                                          names=("delp", "pt", "w"))
    zh_p0 = halo.pad_cell(zh, name="zh")
    carry0 = (delp_p0, pt_p0, u, v, w_p0, zh_p0,
              jnp.zeros_like(delp[:, 0]),
              zsh(n, n + 1), zsh(n + 1, n), zsh(NC, NW), zsh(NW, NC),
              jnp.int32(0), u * 0.0, v * 0.0, qv0)
    if cfg.use_scan:
        carry, pems = jax.lax.scan(body, carry0, None, length=n_split)
        pem_last = pems[-1]
    else:
        carry = carry0
        for _ in range(n_split):
            carry, pem_last = body(carry, None)
    delp_p, pt_p, u, v, w_p, zh_p, ws, mfx, mfy, cx, cy = carry[:11]
    qv_t = carry[-1]
    q_out = dict(q, **dict(zip(qkeys, qv_t))) if fast_cfg is not None else q
    u, v = halo.reconcile_dgrid(u, v)
    delp = delp_p[..., ctr, ctr]
    pt = pt_p[..., ctr, ctr]
    w = w_p[..., ctr, ctr]
    zh = zh_p[..., ctr, ctr]
    delz = zh[:, 1:] - zh[:, :-1]
    # final pressures for the remap (pe from the carried padded delp)
    pe = ptop + jnp.concatenate(
        [jnp.zeros_like(delp_p[:, :1]), jnp.cumsum(delp_p, axis=1)], axis=1)
    peln = jnp.log(pe)
    pk = jnp.exp(akap * peln)
    return SimpleNamespace(delp=delp, pt=pt, u=u, v=v, w=w, delz=delz, zh=zh,
                           ws=ws, mfx=mfx, mfy=mfy, cx=cx, cy=cy,
                           pe=pe, peln=peln, pk=pk, q=q_out)
