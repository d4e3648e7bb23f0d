"""Concurrent gnomonic cube nesting, phase 1 (one-way, hydrostatic).

The reference runs nests as concurrently executing grids on disjoint
pelists (fv_control.F90:364-478): each big step the parent state is
interpolated onto the nest's boundary halo (setup_nested_grid_BCs,
/root/reference/model/fv_nesting.F90:76; ind/wt tables from
setup_aligned_nest, /root/reference/tools/fv_grid_tools.F90:1630) and the
nest integrates with those lateral BCs; two-way feedback returns the
area-averaged nest solution (twoway_nesting, fv_nesting.F90:2219).

TPU-native formulation here:
- the nest grid is a real gnomonic patch aligned to the parent face
  (grid/patch.py), with full metric terms and `bounded` regular-stencil
  kernels;
- BC "halo exchange" = index-space bilinear interpolation of the parent
  state onto the nest's padded frames (boundary.coarse_to_fine_stagger;
  the aligned-nest equivalent of the reference's Herzog-weight 4-point
  scheme, exact at coincident points), swapped into a NestBCHalo inside
  one jitted step;
- nest C-grid wind BCs are derived by running the bounded d2a2c on the
  interpolated D-wind frames (the reference interpolates the parent's
  uc/vc state instead; both are O(dt) consistent estimates of the ring
  values);
- parent and nest steps live in ONE jitted function — XLA overlaps their
  execution since the nest depends on the parent only through the small
  BC frames (the analog of concurrent pelists).

Phase-1 scope: hydrostatic, dry/adiabatic nest, one-way by default with
optional scalar two-way feedback.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as con
from ..model.boundary import (coarse_to_fine_stagger, blend_interior,
                              twoway_feedback, twoway_feedback_dgrid)
from ..model.dyn_core import DynConfig
from ..model.fv_dynamics import fv_dynamics_hydro, fv_dynamics_nh
from ..model.grid_ops import build_grid_ops_patch
from ..grid.patch import aligned_nest_corners, build_patch_geometry
from ..ops.sw_core import _d2a2c_vect_bounded

H = 3


class CubeNest:
    """Aligned nest on parent `tile`, refinement R, covering parent cells
    [joffset, joffset + n_nest/R) x [ioffset, ...)."""

    def __init__(self, parent_g, tile, refinement, ioffset, joffset, n_nest,
                 dtype=jnp.float32):
        self.tile = tile
        self.R = refinement
        self.oi = ioffset
        self.oj = joffset
        self.n = n_nest
        crn = aligned_nest_corners(parent_g.geom, tile, refinement,
                                   ioffset, joffset, n_nest + 1, n_nest + 1)
        self.geom = build_patch_geometry(crn, radius=parent_g.geom.radius,
                                         omega=parent_g.geom.omega)
        self.g = build_grid_ops_patch(self.geom, dtype=dtype)

    # -- parent -> nest frame interpolation --------------------------------

    def _frame(self, parent_padded, wall):
        """Interpolate one parent-tile PADDED field onto the nest's padded
        frame. parent_padded [K, Yp, Xp] (tile slice); wall = (wy, wx)."""
        ny = self.n + (1 if wall[0] else 0) + 2 * H
        nx = self.n + (1 if wall[1] else 0) + 2 * H
        # source array index of parent cell/wall 0 is H; frame starts at
        # nest cell/wall -H, i.e. parent coordinate o - H/R
        return coarse_to_fine_stagger(
            parent_padded, self.R,
            offset_j=self.oj - H / self.R + H,
            offset_i=self.oi - H / self.R + H,
            fine_shape=(ny, nx), wall=wall)

    def frames_from_parent(self, parent_g, delp, pt, u, v, ptop, akap,
                           q=None, zvir=0.0):
        """Build the BC frame dict for one big step from the parent state
        (interior fields [6, K, ...]; pt = temperature). The theta_v frame
        is derived from the interpolated (T, delp) exactly as the interior
        derives its own (fv_dynamics.F90:275-399)."""
        t = self.tile
        halo = parent_g.halo
        delp_pp = halo.pad_cell(delp, name="delp")[t]
        pt_pp = halo.pad_cell(pt, name="pt")[t]
        u_pp, v_pp = halo.pad_dgrid(u, v, names=("u", "v"))
        u_pp, v_pp = u_pp[t], v_pp[t]

        delp_f = self._frame(delp_pp, (False, False))[None]
        t_f = self._frame(pt_pp, (False, False))[None]
        u_f = self._frame(u_pp, (True, False))[None]
        v_f = self._frame(v_pp, (False, True))[None]

        pe = ptop + jnp.cumsum(delp_f, axis=1)
        pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
        peln = jnp.log(pe)
        pk = jnp.exp(akap * peln)
        pkz = (pk[:, 1:] - pk[:, :-1]) / (akap * (peln[:, 1:] - peln[:, :-1]))
        tv_f = t_f
        if q is not None and zvir:
            q_pp = parent_g.halo.pad_cell(q["sphum"], name="q")[t]
            tv_f = t_f * (1.0 + zvir * self._frame(q_pp, (False, False))[None])
        ptv_f = tv_f / pkz

        _, _, uc_f, vc_f, _, _ = _d2a2c_vect_bounded(u_f, v_f, self.g)
        return dict(delp=delp_f, pt=ptv_f, u=u_f, v=v_f,
                    uc=uc_f, vc=vc_f, t_abs=t_f)

    def init_state_from_parent(self, parent_g, delp, pt, u, v):
        """Nest cold start: interior part of the interpolated frames."""
        t = self.tile
        halo = parent_g.halo
        ci = slice(H, H + self.n)
        wi = slice(H, H + self.n + 1)
        delp_f = self._frame(halo.pad_cell(delp, name="delp")[t],
                             (False, False))[None]
        pt_f = self._frame(halo.pad_cell(pt, name="pt")[t],
                           (False, False))[None]
        u_pp, v_pp = halo.pad_dgrid(u, v, names=("u", "v"))
        u_f = self._frame(u_pp[t], (True, False))[None]
        v_f = self._frame(v_pp[t], (False, True))[None]
        return SimpleNamespace(delp=delp_f[..., ci, ci], pt=pt_f[..., ci, ci],
                               u=u_f[..., wi, ci], v=v_f[..., ci, wi])

    # -- nonhydrostatic extensions (nh_utils.F90 nest_halo_nh:1764) --------

    def phis_frame(self, parent_g, phis):
        """Interpolate the parent surface geopotential onto the nest's
        padded frame (static; call once at setup)."""
        p2 = phis[:, 0] if phis.ndim == 4 else phis
        phis_pp = parent_g.halo.pad_cell(p2, name="phis")[self.tile]
        return self._frame(phis_pp[None], (False, False))[None]

    def frames_from_parent_nh(self, parent_g, delp, pt, u, v, w, delz,
                              phis_f, ptop, akap, q=None, zvir=0.0):
        """BC frames for the NH acoustic loop: the hydro set plus w and the
        height-interface frame zh reconstructed from the interpolated
        parent delz over the nest terrain (the nest_halo_nh role:
        nh_utils.F90:1764 sets gz/w nest BCs from delz)."""
        frames = self.frames_from_parent(parent_g, delp, pt, u, v, ptop,
                                         akap, q=q, zvir=zvir)
        t = self.tile
        halo = parent_g.halo
        w_pp = halo.pad_cell(w, name="w")[t]
        dz_pp = halo.pad_cell(delz, name="delz")[t]
        frames["w"] = self._frame(w_pp, (False, False))[None]
        delz_f = self._frame(dz_pp, (False, False))[None]
        zs = phis_f[:, 0] / con.GRAV
        incr = jnp.cumsum(delz_f[:, ::-1], axis=1)[:, ::-1]
        frames["zh"] = jnp.concatenate([zs[:, None] - incr, zs[:, None]],
                                       axis=1)
        frames["delz"] = delz_f
        return frames

    def init_state_from_parent_nh(self, parent_g, delp, pt, u, v, w, delz,
                                  q=None):
        """NH nest cold start (adds w/delz and optional tracers)."""
        st = self.init_state_from_parent(parent_g, delp, pt, u, v)
        t = self.tile
        ci = slice(H, H + self.n)
        halo = parent_g.halo
        st.w = self._frame(halo.pad_cell(w, name="w")[t],
                           (False, False))[None][..., ci, ci]
        st.delz = self._frame(halo.pad_cell(delz, name="delz")[t],
                              (False, False))[None][..., ci, ci]
        if q:
            st.q = {k: self._frame(halo.pad_cell(f, name=k)[t],
                                   (False, False))[None][..., ci, ci]
                    for k, f in q.items()}
        return st


def nested_step_hydro(parent_g, nest: CubeNest, cfg_p: DynConfig,
                      cfg_n: DynConfig, ak, bk, ptop, nrows_blend=4,
                      two_way=False, two_way_blend=1.0):
    """Returns a jittable step(parent_state, nest_state) -> (parent_state,
    nest_state) advancing both grids one big dt (concurrent-grid pod)."""
    akap = con.KAPPA
    n = nest.n
    R = nest.R

    def step(ps, ns):
        pd, pp, pu, pv = ps
        nd, nt, nu, nv = ns
        # ---- parent big step -------------------------------------------
        pres = fv_dynamics_hydro(pd, pp, pu, pv, None, parent_g, cfg_p,
                                 ak, bk, ptop)
        # ---- nest BCs from the updated parent state (t1 frames,
        # held fixed through the nest's acoustic loop; the reference
        # extrapolates BCs ahead similarly) ------------------------------
        frames = nest.frames_from_parent(parent_g, pres.delp, pres.pt,
                                         pres.u, pres.v, ptop, akap)
        t_f = frames.pop("t_abs")
        gn = SimpleNamespace(**vars(nest.g))
        from ..parallel.nest_halo import NestBCHalo
        gn.halo = NestBCHalo(n, H, frames)
        gn.phis_p = jnp.zeros_like(frames["delp"][:, :1])
        nres = fv_dynamics_hydro(nd, nt, nu, nv, None, gn, cfg_n,
                                 ak, bk, ptop)
        # ---- Davies relaxation of the outer rows toward the BCs --------
        ci = slice(H, H + n)
        wi = slice(H, H + n + 1)
        nd2 = blend_interior(nres.delp, frames["delp"][..., ci, ci],
                             nrows_blend)
        ntv2 = blend_interior(nres.pt, t_f[..., ci, ci], nrows_blend)
        nu2 = blend_interior(nres.u, frames["u"][..., wi, ci], nrows_blend,
                             wall=(True, False))
        nv2 = blend_interior(nres.v, frames["v"][..., ci, wi], nrows_blend,
                             wall=(False, True))
        pd2, pp2, pu2, pv2 = pres.delp, pres.pt, pres.u, pres.v
        if two_way:
            # scalar two-way feedback (twoway_nesting:2219): area-averaged
            # nest delp/T replace the parent footprint
            area_f = jnp.asarray(nest.g.area[0, :, H:-H, H:-H])
            t = nest.tile
            pd2 = pd2.at[t].set(twoway_feedback(
                pd2[t], nd2[0], R, nest.oj, nest.oi,
                blend=two_way_blend, area_f=area_f))
            pp2 = pp2.at[t].set(twoway_feedback(
                pp2[t], ntv2[0], R, nest.oj, nest.oi,
                blend=two_way_blend, area_f=area_f))
        return (pd2, pp2, pu2, pv2), (nd2, ntv2, nu2, nv2)

    return step


def nested_step_nh(parent_g, nest: CubeNest, cfg_p: DynConfig,
                   cfg_n: DynConfig, ak, bk, ptop, dp0, phis_parent,
                   nrows_blend=4, two_way=False, two_way_blend=1.0,
                   mp_cfg=None):
    """Nonhydrostatic concurrent nesting (phase 2): full NH BC set
    (w + height interfaces, nh_utils.F90 nest_halo_nh:1764), moist nest
    with tracers, and two-way feedback of BOTH scalars (area-averaged,
    twoway_nesting:2219) and D-grid winds (wall-averaged,
    update_twowaynest remap). State tuples:
      parent (delp, pt, u, v, w, delz, q) — pt TEMPERATURE
      nest   (delp, pt, u, v, w, delz, q)
    Returns a jittable step(parent_state, nest_state)."""
    akap = con.KAPPA
    n = nest.n
    R = nest.R
    phis_f = nest.phis_frame(parent_g, jnp.asarray(phis_parent))
    zvir = con.RVGAS / con.RDGAS - 1.0

    def step(ps, ns):
        pd, pp, pu, pv, pw, pdz, pq = ps
        nd, nt, nu, nv, nw, ndz, nq = ns
        moist = bool(pq) and not cfg_p.adiabatic
        # ---- parent big step -------------------------------------------
        pres = fv_dynamics_nh(pd, pp, pu, pv, pw, pdz, pq, parent_g,
                              cfg_p, ak, bk, ptop, dp0, mp_cfg=mp_cfg)
        # ---- nest BC frames from the updated parent --------------------
        frames = nest.frames_from_parent_nh(
            parent_g, pres.delp, pres.pt, pres.u, pres.v, pres.w,
            pres.delz, phis_f, ptop, akap, q=pres.q,
            zvir=(zvir if moist else 0.0))
        t_f = frames.pop("t_abs")
        delz_f = frames.pop("delz")
        gn = SimpleNamespace(**vars(nest.g))
        from ..parallel.nest_halo import NestBCHalo
        gn.halo = NestBCHalo(n, H, frames)
        gn.phis_p = phis_f
        nres = fv_dynamics_nh(nd, nt, nu, nv, nw, ndz, nq, gn, cfg_n,
                              ak, bk, ptop, dp0, mp_cfg=mp_cfg)
        # ---- Davies relaxation toward the BC data ----------------------
        ci = slice(H, H + n)
        wi = slice(H, H + n + 1)
        nd2 = blend_interior(nres.delp, frames["delp"][..., ci, ci],
                             nrows_blend)
        nt2 = blend_interior(nres.pt, t_f[..., ci, ci], nrows_blend)
        nu2 = blend_interior(nres.u, frames["u"][..., wi, ci], nrows_blend,
                             wall=(True, False))
        nv2 = blend_interior(nres.v, frames["v"][..., ci, wi], nrows_blend,
                             wall=(False, True))
        nw2 = blend_interior(nres.w, frames["w"][..., ci, ci], nrows_blend)
        ndz2 = blend_interior(nres.delz, delz_f[..., ci, ci], nrows_blend)
        nq2 = nres.q
        pd2, pp2 = pres.delp, pres.pt
        pu2, pv2, pw2, pdz2, pq2 = pres.u, pres.v, pres.w, pres.delz, pres.q
        if two_way:
            area_f = jnp.asarray(nest.g.area[0, :, H:-H, H:-H])
            t = nest.tile

            def fb(pf, nf):
                return pf.at[t].set(twoway_feedback(
                    pf[t], nf[0], R, nest.oj, nest.oi,
                    blend=two_way_blend, area_f=area_f))

            pd2 = fb(pd2, nd2)
            pp2 = fb(pp2, nt2)
            pw2 = fb(pw2, nw2)
            pdz2 = fb(pdz2, ndz2)
            if pq2:
                pq2 = dict(pq2)
                for k in pq2:
                    if k in (nq2 or {}):
                        pq2[k] = fb(pq2[k], nq2[k])
            pu_t, pv_t = twoway_feedback_dgrid(
                pu2[t], pv2[t], nu2[0], nv2[0], R, nest.oj, nest.oi,
                blend=two_way_blend)
            pu2 = pu2.at[t].set(pu_t)
            pv2 = pv2.at[t].set(pv_t)
        return ((pd2, pp2, pu2, pv2, pw2, pdz2, pq2),
                (nd2, nt2, nu2, nv2, nw2, ndz2, nq2))

    return step


def telescoped_step_hydro(parent_g, nest1: CubeNest, nest2: CubeNest,
                          cfg_p: DynConfig, cfg_1: DynConfig,
                          cfg_2: DynConfig, ak, bk, ptop, nrows_blend=4):
    """Two-level telescoping nests (the reference's multi-level
    `mpp_define_nest_domains` tree, fv_control.F90:594; grids run
    concurrently with BCs cascading parent -> nest1 -> nest2). nest2 is
    built ON nest1's patch geometry (CubeNest(nest1.g, tile=0, ...)),
    and its BC frames are interpolated from nest1's post-step state with
    nest1's own BC-frame halo — the same coarse-to-fine machinery at
    both levels. Returns step(parent_state, nest1_state, nest2_state)."""
    akap = con.KAPPA
    from ..parallel.nest_halo import NestBCHalo

    def one_level(nest, gp, pres, ns, cfg_n):
        frames = nest.frames_from_parent(gp, pres.delp, pres.pt,
                                         pres.u, pres.v, ptop, akap)
        t_f = frames.pop("t_abs")
        gn = SimpleNamespace(**vars(nest.g))
        gn.halo = NestBCHalo(nest.n, H, frames)
        gn.phis_p = jnp.zeros_like(frames["delp"][:, :1])
        nres = fv_dynamics_hydro(ns[0], ns[1], ns[2], ns[3], None, gn,
                                 cfg_n, ak, bk, ptop)
        ci = slice(H, H + nest.n)
        wi = slice(H, H + nest.n + 1)
        nd2 = blend_interior(nres.delp, frames["delp"][..., ci, ci],
                             nrows_blend)
        nt2 = blend_interior(nres.pt, t_f[..., ci, ci], nrows_blend)
        nu2 = blend_interior(nres.u, frames["u"][..., wi, ci],
                             nrows_blend, wall=(True, False))
        nv2 = blend_interior(nres.v, frames["v"][..., ci, wi],
                             nrows_blend, wall=(False, True))
        return frames, t_f, (nd2, nt2, nu2, nv2)

    def step(ps, ns1, ns2):
        pres = fv_dynamics_hydro(ps[0], ps[1], ps[2], ps[3], None,
                                 parent_g, cfg_p, ak, bk, ptop)
        frames1, t_f1, ns1_out = one_level(nest1, parent_g, pres, ns1,
                                           cfg_1)
        # cascade: nest2's BC frames come from nest1's post-step blended
        # state through nest1's BC-frame halo. The cascade halo carries
        # the TEMPERATURE frame in the "pt" slot so pad_cell(T) pastes
        # the nest1 T interior into a T rim (frames1["pt"] is theta_v,
        # the acoustic-loop convention).
        gp2 = SimpleNamespace(**vars(nest1.g))
        gp2.halo = NestBCHalo(nest1.n, H, dict(frames1, pt=t_f1))
        n1res_b = SimpleNamespace(delp=ns1_out[0], pt=ns1_out[1],
                                  u=ns1_out[2], v=ns1_out[3])
        _, _, ns2_out = one_level(nest2, gp2, n1res_b, ns2, cfg_2)
        return ((pres.delp, pres.pt, pres.u, pres.v), ns1_out, ns2_out)

    return step
