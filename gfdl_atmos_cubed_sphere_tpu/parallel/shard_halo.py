"""shard_map + ppermute halo backend: one device per cube tile.

The multi-chip execution mode of the framework (the analog of the
reference's one-MPI-rank-per-tile minimal layout, fv_mp_mod.F90
domain_decomp:386-520 + mpp_update_domains): state arrays [6, K, n, n] are
sharded over a mesh axis "tile", the entire model step runs inside
`jax.shard_map`, and halos move as 4 point-to-point `lax.ppermute`
edge strips per exchange — riding ICI instead of the GSPMD all-gathers the
whole-array mode generates. This also sidesteps the GSPMD while-loop
mis-partitioning issue (parallel/mesh.py), so lax.scan acoustic loops are
safe here.

All index maps are the same CubeTopology affine-contact specs the gather
halo uses (parallel/halo.py) — restricted to edge strips and reordered by
SENDER: for direction d, sender s extracts the strip its served receiver
t = dst_d(s) needs (already in the receiver's halo orientation, sign flips
applied), then one collective permute delivers every strip.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.topology import CubeTopology

H = 3
EDGES = ("W", "E", "S", "N")


def _regions_cell(n, h):
    P = n + 2 * h
    return {"W": (slice(h, h + n), slice(0, h)),
            "E": (slice(h, h + n), slice(h + n, P)),
            "S": (slice(0, h), slice(h, h + n)),
            "N": (slice(h + n, P), slice(h, h + n))}


def _regions_corner(n, h):
    P = n + 1 + 2 * h
    return {"W": (slice(h, h + n + 1), slice(0, h)),
            "E": (slice(h, h + n + 1), slice(h + n + 1, P)),
            "S": (slice(0, h), slice(h, h + n + 1)),
            "N": (slice(h + n + 1, P), slice(h, h + n + 1))}


def _regions_ywall(n, h):
    # y-wall component (u / vc): padded [n+1+2h, n+2h]
    PJ, PI = n + 1 + 2 * h, n + 2 * h
    return {"W": (slice(h, h + n + 1), slice(0, h)),
            "E": (slice(h, h + n + 1), slice(h + n, PI)),
            "S": (slice(0, h), slice(h, h + n)),
            "N": (slice(h + n + 1, PJ), slice(h, h + n))}


def _regions_xwall(n, h):
    # x-wall component (v / uc): padded [n+2h, n+1+2h]
    PJ, PI = n + 2 * h, n + 1 + 2 * h
    return {"W": (slice(h, h + n), slice(0, h)),
            "E": (slice(h, h + n), slice(h + n + 1, PI)),
            "S": (slice(0, h), slice(h, h + n + 1)),
            "N": (slice(h + n, PJ), slice(h, h + n + 1))}


class ShardHalo:
    """Per-tile halo exchange via lax.ppermute. Drop-in replacement for
    parallel/halo.HaloExchanger *inside a shard_map body* whose mesh has a
    6-way "tile" axis. All local arrays carry NO leading tile axis (shape
    [..., ny, nx]); use shard_step() below to adapt the [6, ...] API."""

    def __init__(self, topo: CubeTopology, h: int = H, axis_name: str = "tile"):
        self.topo = topo
        self.n = topo.n
        self.h = h
        self.axis = axis_name
        n = self.n
        T = topo.ntiles

        # Each direction's neighbor relation on the cube is 2-to-1 (e.g.
        # tile 0 is the W neighbor of both tiles 1 and 2), so a direction
        # needs TWO collective-permute rounds with unique sources each; a
        # receiver appears in exactly one round (the other round delivers
        # ppermute's zero-fill, summed away).
        # direction -> list of rounds, each (perm pairs, dst-of-sender [T])
        self._rounds = {}
        for e in EDGES:
            srcs = [topo.contacts[(t, e)].tile for t in range(T)]
            by_src = {}
            for t in range(T):
                by_src.setdefault(srcs[t], []).append(t)
            nrounds = max(len(v) for v in by_src.values())
            rounds = []
            for r in range(nrounds):
                perm = []
                dst = np.arange(T)         # self = dummy (not in perm)
                for s, ts in by_src.items():
                    if r < len(ts):
                        perm.append((s, ts[r]))
                        dst[s] = ts[r]
                rounds.append((perm, dst))
            self._rounds[e] = rounds

        # ---- cell-centered sender specs: [6(sender), rj, ri] ----------
        tC, jC, iC, _ = topo.cell_halo_spec(h)
        self._cell = self._sender_pack(
            _regions_cell(n, h), lambda t, R: (jC[t][R], iC[t][R]))

        # ---- corner-point sender specs --------------------------------
        tB, jB, iB, _ = topo.corner_halo_spec(h)
        self._corner = self._sender_pack(
            _regions_corner(n, h), lambda t, R: (jB[t][R], iB[t][R]))

        # ---- vector sender specs (comp select + sign) -----------------
        self._dgrid = self._vector_pack(topo.vector_halo_spec(h, "D"), "D")
        self._cgrid = self._vector_pack(topo.vector_halo_spec(h, "C"), "C")

        # ---- reconcile (owner walls) ----------------------------------
        own = topo.dgrid_edge_owner_spec()
        self._own = {}
        for key, edge in (("u_n", "N"), ("v_e", "E")):
            comp, tidx, jidx, iidx, sign = own[key]
            per_round = []
            for perm, dst in self._rounds[edge]:
                per_round.append(dict(
                    perm=perm,
                    comp=jnp.asarray(comp[dst]), sign=jnp.asarray(sign[dst]),
                    ju=jnp.asarray(np.clip(jidx[dst], 0, n)),
                    iu=jnp.asarray(np.clip(iidx[dst], 0, n - 1)),
                    jv=jnp.asarray(np.clip(jidx[dst], 0, n - 1)),
                    iv=jnp.asarray(np.clip(iidx[dst], 0, n))))
            self._own[key] = per_round

    # -- spec builders -----------------------------------------------------

    def _sender_pack(self, regions, take):
        """For each direction, per ppermute round, stack the receiver-region
        index arrays in SENDER order:
        pack[e] = ([(perm, j[6,...], i[6,...]), ...], region)."""
        out = {}
        for e in EDGES:
            rounds = []
            for perm, dst in self._rounds[e]:
                js, is_ = [], []
                for s in range(self.topo.ntiles):
                    jj, ii = take(int(dst[s]), regions[e])
                    js.append(jj)
                    is_.append(ii)
                rounds.append((perm, jnp.asarray(np.stack(js)),
                               jnp.asarray(np.stack(is_))))
            out[e] = (rounds, regions[e])
        return out

    def _vector_pack(self, specs, grid):
        n, h = self.n, self.h
        packs = {}
        for name in ("u", "v"):
            sp = specs[name]
            ywall_out = (name == "u") if grid == "D" else (name == "v")
            regions = (_regions_ywall(n, h) if ywall_out
                       else _regions_xwall(n, h))
            out = {}
            for e in EDGES:
                R = regions[e]
                rounds = []
                for perm, dst in self._rounds[e]:
                    comp = np.stack([sp["comp"][int(dst[s])][R]
                                     for s in range(self.topo.ntiles)])
                    sign = np.stack([sp["sign"][int(dst[s])][R]
                                     for s in range(self.topo.ntiles)])
                    jj = np.stack([sp["jidx"][int(dst[s])][R]
                                   for s in range(self.topo.ntiles)])
                    ii = np.stack([sp["iidx"][int(dst[s])][R]
                                   for s in range(self.topo.ntiles)])
                    rounds.append(dict(
                        perm=perm,
                        comp=jnp.asarray(comp), sign=jnp.asarray(sign),
                        jy=jnp.asarray(np.clip(jj, 0, n)),    # y-wall field
                        iy=jnp.asarray(np.clip(ii, 0, n - 1)),
                        jx=jnp.asarray(np.clip(jj, 0, n - 1)),  # x-wall
                        ix=jnp.asarray(np.clip(ii, 0, n))))
                out[e] = (rounds, R)
            packs[name] = out
        return packs

    # -- runtime helpers ---------------------------------------------------

    def _my(self, arr):
        """Slice a [6, ...] sender-ordered constant to this shard's row."""
        ti = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_index_in_dim(arr, ti, 0, keepdims=False)

    def _exchange_scalar(self, q, pack):
        """q: local [..., ny, nx]. Returns padded [..., PJ, PI]."""
        h = self.h
        padded = jnp.pad(q, [(0, 0)] * (q.ndim - 2) + [(h, h), (h, h)],
                         mode="edge")
        for e in EDGES:
            rounds, R = pack[e]
            recv = 0.0
            for rd in rounds:
                perm, jsnd, isnd = rd
                vals = q[..., self._my(jsnd), self._my(isnd)]
                recv = recv + jax.lax.ppermute(vals, self.axis, perm)
            padded = padded.at[(Ellipsis,) + R].set(recv)
        return padded

    def pad_cell(self, q, name=None):
        return self._exchange_scalar(q, self._cell)

    def pad_cells(self, fields, names=None):
        """Grouped-pack exchange: stack same-shape cell fields on a new
        leading axis and run ONE ppermute set for the whole group — the
        analog of the reference's grouped async halo packs
        (fv_dynamics.F90:462-490, 13 packs with deferred completion).
        One large collective per edge/round instead of len(fields) small
        ones: fewer ICI transactions, and XLA's async collective-permute
        scheduling gets a single long transfer to overlap with compute."""
        del names
        fields = tuple(fields)
        if len(fields) == 1:
            return (self.pad_cell(fields[0]),)
        stacked = jnp.stack(fields, axis=0)
        padded = self._exchange_scalar(stacked, self._cell)
        return tuple(padded[i] for i in range(len(fields)))

    def pad_corner(self, q, name=None):
        return self._exchange_scalar(q, self._corner)

    def _exchange_vector(self, ysrc, xsrc, packs, bases):
        """ysrc/xsrc: local y-wall / x-wall SOURCE fields (comp 0/1 of the
        spec). bases: {name: array to pad} matching packs[name]'s output
        shape. Returns padded arrays in ('u', 'v') pack order."""
        h = self.h
        outs = []
        for name in ("u", "v"):
            base = bases[name]
            padded = jnp.pad(base, [(0, 0)] * (base.ndim - 2)
                             + [(h, h), (h, h)], mode="edge")
            for e in EDGES:
                rounds, R = packs[name][e]
                recv = 0.0
                for sp in rounds:
                    comp = self._my(sp["comp"])
                    sign = self._my(sp["sign"]).astype(base.dtype)
                    vy = ysrc[..., self._my(sp["jy"]), self._my(sp["iy"])]
                    vx = xsrc[..., self._my(sp["jx"]), self._my(sp["ix"])]
                    vals = jnp.where(comp == 0, vy, vx) * sign
                    recv = recv + jax.lax.ppermute(vals, self.axis,
                                                   sp["perm"])
                padded = padded.at[(Ellipsis,) + R].set(recv)
            outs.append(padded)
        return tuple(outs)

    def pad_dgrid(self, u, v, names=None):
        """u: [..., n+1, n] y-wall winds; v: [..., n, n+1]."""
        return self._exchange_vector(u, v, self._dgrid,
                                     {"u": u, "v": v})

    def pad_cgrid(self, uc, vc, names=None):
        """uc: [..., n, n+1] x-wall winds; vc: [..., n+1, n]. The C-grid
        spec's 'u' output is the x-wall field (uc); comp 0 sources the
        neighbor's y-wall field (vc)."""
        uc_p, vc_p = self._exchange_vector(vc, uc, self._cgrid,
                                           {"u": uc, "v": vc})
        return uc_p, vc_p

    def reconcile_dgrid(self, u, v):
        """Overwrite this tile's duplicated N u-row / E v-col with the
        owning neighbor's values (dyn_core.F90:1152-1170)."""
        n = self.n
        out = []
        for key in ("u_n", "v_e"):
            recv = 0.0
            for sp in self._own[key]:
                comp = self._my(sp["comp"])
                sign = self._my(sp["sign"]).astype(u.dtype)
                vy = u[..., self._my(sp["ju"]), self._my(sp["iu"])]
                vx = v[..., self._my(sp["jv"]), self._my(sp["iv"])]
                vals = jnp.where(comp == 0, vy, vx) * sign
                recv = recv + jax.lax.ppermute(vals, self.axis, sp["perm"])
            out.append(recv)
        u = u.at[..., n, :].set(out[0])
        v = v.at[..., :, n].set(out[1])
        return u, v


# ---------------------------------------------------------------------------
# shard_map wrapper: run unchanged model code tile-parallel
# ---------------------------------------------------------------------------

def localize_g(g, shalo: ShardHalo):
    """Build the per-shard metric namespace: every [6, ...] array sliced to
    this shard's tile (leading axis kept at length 1 so model code indexing
    is unchanged), halo replaced by the ppermute ShardHalo. Call INSIDE the
    shard_map body."""
    ti = jax.lax.axis_index(shalo.axis)
    gl = SimpleNamespace()
    for name, val in vars(g).items():
        if name == "halo":
            continue
        if isinstance(val, jnp.ndarray) and val.ndim >= 1 and val.shape[0] == 6:
            val = jax.lax.dynamic_index_in_dim(val, ti, 0, keepdims=True)
        setattr(gl, name, val)
    gl.halo = shalo
    return gl


def tile_mesh(axis_name="tile"):
    """A 6-device mesh over the first 6 local devices (one per cube tile —
    the reference's minimal 1-rank-per-tile layout)."""
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 6:
        devs = jax.devices("cpu")       # virtual-CPU fallback (dry runs)
    if len(devs) < 6:
        raise ValueError(f"need >= 6 devices for tile mesh, have {len(devs)}")
    return Mesh(np.asarray(devs[:6]), (axis_name,))


def hybrid_mesh(ly=1, lx=1, axis_name="tile"):
    """A (tile, y, x) mesh over 6*ly*lx devices — the analog of the
    reference's layout = (lx, ly) per-tile decomposition
    (fv_mp_mod.F90 domain_decomp:386-413, 6*lx*ly ranks)."""
    from jax.sharding import Mesh
    need = 6 * ly * lx
    devs = jax.devices()
    if len(devs) < need:
        devs = jax.devices("cpu")       # virtual-CPU fallback (dry runs)
    if len(devs) < need:
        raise ValueError(f"need >= {need} devices for (6,{ly},{lx}) mesh, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(6, ly, lx),
                (axis_name, "y", "x"))


def shard_step(g, fn, mesh=None, axis_name="tile"):
    """Wrap `fn(gl, *state) -> state_pytree` so it runs tile-parallel.

    fn receives the localized metric namespace (with the ppermute halo) and
    per-shard state arrays shaped [1, ...]; the returned callable takes and
    returns whole-cube [6, ...] pytrees. jit the result.

    The mesh may have extra ("y", "x") axes beyond the 6-way tile axis
    (build one with hybrid_mesh): those are left as AUTO axes — the cube
    topology (rotated contacts, corner fills, one-sided edge stencils) is
    handled manually by the tile-axis ppermutes, while XLA's SPMD
    partitioner decomposes each tile's interior stencils over (y, x),
    inserting the regular intra-tile halo collectives itself. This is the
    reference's layout(1)xlayout(2) intra-tile decomposition
    (fv_mp_mod.F90:386-413) without duplicating its index bookkeeping:
    irregular communication is manual, regular communication is
    compiler-generated. Verified bit-roundoff-exact against single-device
    at f64 on a (6, x=2) 12-device mesh.
    """
    mesh = mesh if mesh is not None else tile_mesh(axis_name)
    from jax.sharding import PartitionSpec
    shalo = ShardHalo(g.geom.topology, H, axis_name)
    spec = PartitionSpec(axis_name)

    def body(*state):
        gl = localize_g(g, shalo)
        return fn(gl, *state)

    # a bare PartitionSpec is a valid pytree PREFIX for both the argument
    # tuple and the output tree: everything sharded over the tile axis.
    # axis_names marks ONLY the tile axis manual; any other mesh axes stay
    # auto (GSPMD) per the docstring.
    return jax.shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec,
                         axis_names={axis_name})
