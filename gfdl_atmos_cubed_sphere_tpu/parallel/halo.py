"""Halo exchange for the single-array (whole-cube-on-device) execution mode.

Replaces FMS ``mpp_update_domains`` / ``start|complete_group_halo_update``
(/root/reference/tools/fv_mp_mod.F90:646-879) for the case where all 6 tiles
live in one array ``[6, ..., ny, nx]``. Halos are materialized transiently as
padded operand arrays via a single XLA gather with precomputed static indices
(derived from the numeric cube topology); there are no persistent ghost cells
in the state (SURVEY.md §7 design stance).

The multi-device path (shard_map + ppermute) reuses the same index maps per
tile edge; see parallel/mesh.py.

`copy_corners` reproduces /root/reference/model/tp_core.F90:245-320: before a
directional advection sweep, tile-corner halo blocks are filled from the
tile's own halo strips (transposed) so that 1-D stencils can sweep straight
through the corners.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.topology import CubeTopology


class HaloExchanger:
    """Precomputed halo gather maps for one (n, h) configuration.

    GSPMD caveat: the strip-only pads (slice + concatenate assembly, the
    single-chip fast path) are mis-partitioned by the auto-sharding
    partitioner on a >1-device mesh (wrong values — same XLA issue class
    as the use_scan note in model/dyn_core.py). Under plain-jit GSPMD
    execution call `set_gspmd_safe(True)` (or use the shard_map backend,
    parallel/shard_halo.py, which bypasses GSPMD entirely): pads then use
    the single full gather, which partitions correctly.
    """

    #: class-wide switch: True disables strip-assembled pads
    GSPMD_SAFE = False

    @classmethod
    def set_gspmd_safe(cls, flag=True):
        cls.GSPMD_SAFE = bool(flag)

    def __init__(self, topo: CubeTopology, h: int):
        self.topo = topo
        self.n = topo.n
        self.h = h
        n = self.n
        # cell-centered scalars
        t, j, i, valid = topo.cell_halo_spec(h)
        self._cell_flat = jnp.asarray(t * (n * n) + j * n + i)
        # corner-point (B-grid) scalars
        t, j, i, valid = topo.corner_halo_spec(h)
        m = n + 1
        self._corner_flat = jnp.asarray(t * (m * m) + j * m + i)
        # D-grid vector (u on y-walls, v on x-walls)
        self._dgrid = self._vector_spec(h, "D")
        # C-grid vector (uc on x-walls, vc on y-walls)
        self._cgrid = self._vector_spec(h, "C")
        # Strip-only gather maps: the padded interior is an identity copy of
        # the input, so only the 4 halo strips (P*P - n*n elements, ~17x
        # fewer) need the topology gather; the output is assembled with two
        # concatenates around the untouched input array.
        self._cell_strips = self._strip_maps(self._cell_flat, None,
                                             self._ident_cell(n))
        self._corner_strips = self._strip_maps(self._corner_flat, None,
                                               self._ident_corner(n))
        self._vec_strips = {}
        for gname, spec in (("D", self._dgrid), ("C", self._cgrid)):
            for comp in ("u", "v"):
                idx, sign = spec[comp]
                self._vec_strips[(gname, comp)] = self._strip_maps(
                    idx, sign, None)

    @staticmethod
    def _ident_cell(n):
        jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        return (np.arange(6)[:, None, None] * (n * n) + jj * n + ii)

    @staticmethod
    def _ident_corner(n):
        m = n + 1
        jj, ii = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
        return (np.arange(6)[:, None, None] * (m * m) + jj * m + ii)

    def _strip_maps(self, flat, sign, ident):
        # Slice the full [6, Py, Qx] gather map into 4 halo-strip maps,
        # verifying the padded interior is an identity copy of the input
        # (for vectors: identity into one component with +1 signs). Returns
        # None when it is not -- callers then fall back to the full gather.
        h = self.h
        f = np.asarray(flat)
        sg = None if sign is None else np.asarray(sign)
        Py, Qx = f.shape[1], f.shape[2]
        inter = f[:, h:Py - h, h:Qx - h]
        if ident is None:
            # vector interior: exact identity into one source component.
            # interior block is (Py-2h) x (Qx-2h); its source must be a
            # row-major contiguous block with unit strides, +1 signs, and a
            # per-tile start offset matching a whole component layout.
            A, B = Py - 2 * h, Qx - 2 * h
            jj, ii = np.meshgrid(np.arange(A), np.arange(B), indexing="ij")
            base = inter[:, :1, :1]
            ok = (np.array_equal(inter, base + jj * B + ii)
                  and (sg is None
                       or np.all(sg[:, h:Py - h, h:Qx - h] == 1.0)))
            if not ok:
                return None
        else:
            if not np.array_equal(inter, ident):
                return None
        out = []
        for sl in ((slice(0, h), slice(None)),
                   (slice(Py - h, Py), slice(None)),
                   (slice(h, Py - h), slice(0, h)),
                   (slice(h, Py - h), slice(Qx - h, Qx))):
            idx = jnp.asarray(f[(slice(None),) + sl])
            ss = None
            if sg is not None:
                sgp = sg[(slice(None),) + sl]
                if not np.all(sgp == 1.0):
                    ss = jnp.asarray(sgp.astype(np.float32))
            out.append((idx, ss))
        return out

    def _vector_spec(self, h, grid):
        n = self.n
        specs = self.topo.vector_halo_spec(h, grid)
        ly = (n + 1) * n          # y-wall component length (u / vc)
        out = {}
        for name, s in specs.items():
            # comp 0 = y-wall field, 1 = x-wall field; flat offset within tile
            inner = jnp.asarray(
                np.where(s["comp"] == 0,
                         s["jidx"] * n + s["iidx"],
                         ly + s["jidx"] * (n + 1) + s["iidx"])
                + s["tidx"] * ((n + 1) * n * 2))
            out[name] = (inner, jnp.asarray(s["sign"].astype(np.float32)))
        return out

    # -- scalar pads ---------------------------------------------------

    def pad_cell(self, q, name=None):
        """[6, ..., n, n] -> [6, ..., n+2h, n+2h] (corner blocks garbage)."""
        if self._cell_strips is not None and not self.GSPMD_SAFE:
            return self._gather_strips(q, self._cell_strips,
                                       self.n * self.n, q)
        return self._gather(q, self._cell_flat, self.n * self.n)


    def pad_cells(self, fields, names=None):
        """Grouped-pack API (see parallel/shard_halo.py): default
        per-field fallback."""
        names = names or (None,) * len(tuple(fields))
        return tuple(self.pad_cell(q, name=nm)
                     for q, nm in zip(fields, names))

    def pad_corner(self, q, name=None):
        m = self.n + 1
        if self._corner_strips is not None and not self.GSPMD_SAFE:
            return self._gather_strips(q, self._corner_strips, m * m, q)
        return self._gather(q, self._corner_flat, m * m)

    def _gather_strips(self, src, strips, L, interior, src2=None, L2=0):
        """Halo pad via strip-only gathers plus concatenate assembly; the
        interior of the padded output is the untouched `interior` array."""
        batch = src.shape[1:-2]

        def flatten(a, La):
            return jnp.moveaxis(a.reshape(a.shape[0], *batch, La), 0, -2)

        qf = flatten(src, L)
        if src2 is not None:
            qf = jnp.concatenate([qf, flatten(src2, L2)], -1)
        qf = qf.reshape(*batch, -1)

        def g_(part):
            idx, sign = part
            o = qf[..., idx]
            if sign is not None:
                o = o * sign
            return jnp.moveaxis(o, -3, 0)

        top, bot, left, right = (g_(p) for p in strips)
        mid = jnp.concatenate([left, interior, right], -1)
        return jnp.concatenate([top, mid, bot], -2)

    def _gather(self, q, flat_idx, L):
        batch = q.shape[1:-2]
        qf = jnp.moveaxis(q.reshape(q.shape[0], *batch, L), 0, -2)
        qf = qf.reshape(*batch, q.shape[0] * L)
        out = qf[..., flat_idx]                      # [batch..., 6, P, P]
        return jnp.moveaxis(out, -3, 0)

    # -- vector pads -----------------------------------------------------

    def _pad_vector(self, u, v, spec, gname=None):
        """u: y-wall [6, ..., n+1, n]; v: x-wall [6, ..., n, n+1] (or the
        C-grid equivalents with u<->x-wall). Returns padded (u, v) with
        cross-edge component rotation and sign flips."""
        n = self.n
        batch = u.shape[1:-2]
        ly = (n + 1) * n
        if gname is not None:
            su = self._vec_strips.get((gname, "u"))
            sv = self._vec_strips.get((gname, "v"))
            if su is not None and sv is not None and not self.GSPMD_SAFE:
                up = self._gather_strips(u, su, ly, u, src2=v, L2=ly)
                vp = self._gather_strips(u, sv, ly, v, src2=v, L2=ly)
                return up, vp
        src = jnp.concatenate(
            [u.reshape(u.shape[0], *batch, ly), v.reshape(v.shape[0], *batch, ly)],
            axis=-1)
        src = jnp.moveaxis(src, 0, -2).reshape(*batch, u.shape[0] * 2 * ly)
        outs = []
        for name in ("u", "v"):
            idx, sign = spec[name]
            o = src[..., idx] * sign
            outs.append(jnp.moveaxis(o, -3, 0))
        return tuple(outs)

    def reconcile_dgrid(self, u, v):
        """Overwrite the duplicated D-wind walls on each tile's N/E edges with
        the owning (W/S side) tile's values — the mpp_get_boundary consistency
        fix of dyn_core.F90:1152-1170. u: [6, ..., n+1, n]; v: [6, ..., n, n+1]
        interior (unpadded) arrays."""
        if not hasattr(self, "_own_spec"):
            # keep as numpy: creating device constants lazily inside a jit
            # trace and caching them on self leaks tracers across traces
            self._own_spec = {
                k: tuple(np.asarray(a) for a in v_)
                for k, v_ in self.topo.dgrid_edge_owner_spec().items()}
        n = self.n
        batched = u.ndim == 4

        def pick(comp, tid, jj, ii, sg):
            # comp 0 -> neighbor u (wall row, cell col); 1 -> neighbor v
            # (cell row, wall col). JAX clamps the out-of-range indices of the
            # unselected component; jnp.where discards them.
            if batched:
                uu = u[tid, :, jj, ii]          # [6, n, K]
                vv = v[tid, :, jj, ii]
                w = jnp.where((comp == 0)[..., None], uu, vv)
                return w * sg[..., None]
            uu = u[tid, jj, ii]
            vv = v[tid, jj, ii]
            return jnp.where(comp == 0, uu, vv) * sg

        un = pick(*self._own_spec["u_n"])
        ve = pick(*self._own_spec["v_e"])
        if batched:
            u = u.at[:, :, n, :].set(jnp.moveaxis(un, 1, -1))
            v = v.at[:, :, :, n].set(jnp.moveaxis(ve, 1, -1))
        else:
            u = u.at[:, n, :].set(un)
            v = v.at[:, :, n].set(ve)
        return u, v

    def pad_dgrid(self, u, v, names=None):
        """D-grid winds: u [6,...,n+1,n], v [6,...,n,n+1] ->
        padded [6,...,n+1+2h,n+2h], [6,...,n+2h,n+1+2h]."""
        return self._pad_vector(u, v, self._dgrid, gname="D")

    def pad_cgrid(self, uc, vc, names=None):
        """C-grid winds: uc x-wall [6,...,n,n+1], vc y-wall [6,...,n+1,n]."""
        # internal spec convention (topology.vector_halo_spec grid="C"):
        # 'u' output = uc (x-wall), 'v' output = vc (y-wall); source comp 0 is
        # the y-wall field which for C grid is vc.
        n = self.n
        batch = uc.shape[1:-2]
        ly = (n + 1) * n
        su = self._vec_strips.get(("C", "u"))
        sv = self._vec_strips.get(("C", "v"))
        if su is not None and sv is not None and not self.GSPMD_SAFE:
            uc_p = self._gather_strips(vc, su, ly, uc, src2=uc, L2=ly)
            vc_p = self._gather_strips(vc, sv, ly, vc, src2=uc, L2=ly)
            return uc_p, vc_p
        src = jnp.concatenate(
            [vc.reshape(vc.shape[0], *batch, ly),
             uc.reshape(uc.shape[0], *batch, ly)], axis=-1)
        src = jnp.moveaxis(src, 0, -2).reshape(*batch, uc.shape[0] * 2 * ly)
        idx, sign = self._cgrid["u"]
        uc_p = jnp.moveaxis(src[..., idx] * sign, -3, 0)
        idx, sign = self._cgrid["v"]
        vc_p = jnp.moveaxis(src[..., idx] * sign, -3, 0)
        return uc_p, vc_p


from functools import lru_cache


@lru_cache(maxsize=32)
def _corner_fill_idx(n, h, direction):
    """Corner-block source index maps, transcribed 1:1 from the Fortran
    formulas in tp_core.F90:258-318. Returns a list of
    (jslice, islice, src_j [h,h], src_i [h,h]) in padded coordinates.
    Fortran cell index if in [1-h, n+h]; padded index = if - 1 + h."""
    npx = npy = n + 1
    out = []

    def block(i_f, j_f, src):
        jj, ii = np.meshgrid(j_f, i_f, indexing="ij")
        si, sj = src(ii, jj)                 # formulas give (i', j') in f idx
        jsl = slice(j_f[0] - 1 + h, j_f[-1] + h)
        isl = slice(i_f[0] - 1 + h, i_f[-1] + h)
        return (jsl, isl, (sj - 1 + h).astype(np.int32),
                (si - 1 + h).astype(np.int32))

    lo = np.arange(1 - h, 1)                 # f halo indices 1-h..0
    hi_i = np.arange(npx, npx + h)
    hi_j = np.arange(npy, npy + h)
    if direction == 1:   # XDir (tp_core.F90:258-287)
        out.append(block(lo, lo, lambda i, j: (j, 1 - i)))                  # sw
        out.append(block(hi_i, lo, lambda i, j: (npy - j, i - npx + 1)))    # se
        out.append(block(hi_i, hi_j, lambda i, j: (j, 2 * npx - 1 - i)))    # ne
        out.append(block(lo, hi_j, lambda i, j: (npy - j, i - 1 + npx)))    # nw
    else:                # YDir (tp_core.F90:289-318)
        out.append(block(lo, lo, lambda i, j: (1 - j, i)))                  # sw
        out.append(block(hi_i, lo, lambda i, j: (npy + j - 1, npx - i)))    # se
        out.append(block(hi_i, hi_j, lambda i, j: (i, 2 * npy - 1 - j)))    # ne
        out.append(block(lo, hi_j, lambda i, j: (j + 1 - npx, npy - i)))    # nw
    return out


@lru_cache(maxsize=32)
def _corner_block_plan(n, h, direction):
    """Decompose each corner-block source map into (source slice, transpose,
    flip-rows, flip-cols) so copy_corners needs no gathers. The index maps
    from _corner_fill_idx are affine dihedral transforms of contiguous
    blocks; detect which of the 8 orientations each one is."""
    plans = []
    for jsl, isl, sj, si in _corner_fill_idx(n, h, direction):
        j0, i0 = int(sj.min()), int(si.min())
        want = sj * 1000 + si            # unique tag per source cell
        blk0 = (np.arange(j0, j0 + h)[:, None] * 1000
                + np.arange(i0, i0 + h)[None, :])
        found = None
        for trans in (False, True):
            for fj in (False, True):
                for fi in (False, True):
                    t = blk0.T if trans else blk0
                    if fj:
                        t = t[::-1, :]
                    if fi:
                        t = t[:, ::-1]
                    if np.array_equal(t, want):
                        found = (trans, fj, fi)
                        break
                if found:
                    break
            if found:
                break
        assert found is not None, "corner map is not a dihedral transform"
        plans.append((jsl, isl, slice(j0, j0 + h), slice(i0, i0 + h), found))
    return plans


def _corner_block(q, jsrc, isrc, orient):
    trans, fj, fi = orient
    blk = q[..., jsrc, isrc]
    if trans:
        blk = jnp.swapaxes(blk, -1, -2)
    # reversals as width-1 slice concats: the blocks are h x h (h = 3), and
    # Mosaic has no `rev` lowering, so [..., ::-1] would break the Pallas
    # mega-kernels that run copy_corners in-kernel (ops/pallas_dsw.py)
    if fj:
        m = blk.shape[-2]
        blk = jnp.concatenate([blk[..., i:i + 1, :]
                               for i in range(m - 1, -1, -1)], axis=-2)
    if fi:
        m = blk.shape[-1]
        blk = jnp.concatenate([blk[..., :, i:i + 1]
                               for i in range(m - 1, -1, -1)], axis=-1)
    return blk


_IN_KERNEL_CORNERS = False


class in_kernel_corners:
    """Context manager: route copy_corners through the point-DUS variant
    while tracing a Pallas kernel body (Mosaic rejects the lane-direction
    strip concats of the fast XLA formulation — 'result/input offset
    mismatch on non-concat dimension')."""

    def __enter__(self):
        global _IN_KERNEL_CORNERS
        self._prev = _IN_KERNEL_CORNERS
        _IN_KERNEL_CORNERS = True

    def __exit__(self, *exc):
        global _IN_KERNEL_CORNERS
        _IN_KERNEL_CORNERS = self._prev
        return False


def _copy_corners_dus(q, h, direction):
    """Mosaic-safe corner fill: per-point two-stage iota-masked selects on
    the top/bottom h-row strips (static-slice .at[].set lowers to scatter
    under current Pallas TPU; a lane-select against zero then a masked
    select survives Mosaic canonicalization — same pattern as
    sw_core._dsw_corner_solve use_select=True), stitched back with one
    sublane concat. Only used inside Pallas kernel bodies where every
    operand is VMEM-resident."""
    P = q.shape[-1]
    n = P - 2 * h
    top = q[..., :h, :]
    bot = q[..., P - h:, :]
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    zero = jnp.zeros((), q.dtype)
    for jsl, isl, sj, si in _corner_fill_idx(n, h, direction):
        for jj in range(h):
            for ii in range(h):
                dj = jsl.start + jj
                di = isl.start + ii
                val = q[..., int(sj[jj, ii]):int(sj[jj, ii]) + 1,
                        int(si[jj, ii]):int(si[jj, ii]) + 1]
                row_val = jnp.where(ix == di, val, zero)
                if dj < h:
                    top = jnp.where((iy == dj) & (ix == di), row_val, top)
                else:
                    r = dj - (P - h)
                    bot = jnp.where((iy == r) & (ix == di), row_val, bot)
    return jnp.concatenate([top, q[..., h:P - h, :], bot], axis=-2)


def copy_corners(q, h, direction):
    """Fill the 4 corner halo blocks of a padded cell array for a directional
    sweep (tp_core.F90:245-320). q: [..., P, P] padded with halo h,
    direction: 1 = x-sweep, 2 = y-sweep. Returns updated array.

    Implemented as strip reconstruction: the 4 corner blocks are oriented
    copies of tiny interior slices, stitched into the top/bottom h-row strips
    and concatenated with the untouched middle rows — one full-array pass
    instead of four full-array dynamic-update-slices with gathers."""
    if _IN_KERNEL_CORNERS:
        return _copy_corners_dus(q, h, direction)
    P = q.shape[-1]
    n = P - 2 * h
    blocks = {}
    for jsl, isl, jsrc, isrc, orient in _corner_block_plan(n, h, direction):
        blocks[(jsl.start, isl.start)] = _corner_block(q, jsrc, isrc, orient)
    top = jnp.concatenate(
        [blocks[(0, 0)], q[..., :h, h:P - h], blocks[(0, P - h)]], axis=-1)
    bot = jnp.concatenate(
        [blocks[(P - h, 0)], q[..., P - h:, h:P - h],
         blocks[(P - h, P - h)]], axis=-1)
    return jnp.concatenate([top, q[..., h:P - h, :], bot], axis=-2)
