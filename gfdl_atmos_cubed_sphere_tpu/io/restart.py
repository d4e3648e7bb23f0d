"""Checkpoint / restart (component #21).

Re-implements the roles of /root/reference/tools/fv_restart.F90 and
tools/fv_io.F90: state save/resume plus import/export of the reference's
`fv_core.res` NetCDF layout (fv_io.F90:272-332 registers ak, bk, u, v,
[W, DZ], T, delp, phis per tile; fv_tracer.res per tracer :425-434).

Native checkpoints are .npz archives of the state pytree (atomic rename,
with a checksum manifest standing in for mpp_chksum validation,
fv_mp_mod.F90:34); NetCDF3 export/import via scipy gives interop with
reference restart tooling.
"""

import hashlib
import json
import os

import numpy as np

STATE_FIELDS = ("u", "v", "w", "delz", "pt", "delp", "phis", "ps")


def _checksum(a):
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def save_state(path, state, ak=None, bk=None, tracers=None, step=0,
               time_seconds=0.0):
    """Write a native checkpoint: state dict of arrays (+ tracers dict)."""
    payload = {}
    manifest = {"step": step, "time_seconds": time_seconds, "checksums": {}}
    for k, v in state.items():
        if v is None:
            continue
        arr = np.asarray(v)
        payload[k] = arr
        manifest["checksums"][k] = _checksum(arr)
    for name, qv in (tracers or {}).items():
        key = f"tracer__{name}"
        payload[key] = np.asarray(qv)
        manifest["checksums"][key] = _checksum(payload[key])
    if ak is not None:
        payload["ak"] = np.asarray(ak)
        payload["bk"] = np.asarray(bk)
    payload["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    if str(path).endswith(".fvio"):
        # native async C++ writer (io/native_io.py; the FMS-I/O analog):
        # the model thread returns as soon as the arrays are copied
        from .native_io import AsyncWriter
        tmp = path + ".tmp"
        with AsyncWriter(tmp) as w:
            for k, v in payload.items():
                w.write(k, v)
        os.replace(tmp, path)
        return
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_state(path, verify_checksums=True):
    """Read a native checkpoint -> (state dict, tracers dict, manifest)."""
    if str(path).endswith(".fvio"):
        from .native_io import read_fvio
        z = read_fvio(path)
        manifest = json.loads(bytes(z.pop("__manifest__")).decode())
        state, tracers = {}, {}
        for k, arr in z.items():
            if verify_checksums and k in manifest["checksums"]:
                if _checksum(arr) != manifest["checksums"][k]:
                    raise ValueError(f"checksum mismatch for {k} in {path}")
            if k.startswith("tracer__"):
                tracers[k[len("tracer__"):]] = arr
            else:
                state[k] = arr
        return state, tracers, manifest
    with np.load(path) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
        state, tracers = {}, {}
        for k in z.files:
            if k in ("__manifest__",):
                continue
            arr = z[k]
            if verify_checksums and k in manifest["checksums"]:
                if _checksum(arr) != manifest["checksums"][k]:
                    raise ValueError(f"checksum mismatch for {k} in {path}")
            if k.startswith("tracer__"):
                tracers[k[len("tracer__"):]] = arr
            else:
                state[k] = arr
    return state, tracers, manifest


# ---- reference fv_core.res NetCDF interop ---------------------------------

def save_coarse_state(path, state, q, g, factor, ak=None, bk=None,
                      strategy="model_level_area_weighted", **kw):
    """Write a coarse-grained restart alongside the native one
    (coarse_grained_restart_files.F90:48): coarsen the prognostic state by
    `factor` with the chosen strategy, then save through the normal
    checkpoint writer."""
    from ..utils.coarse_graining import coarse_grain_restart
    cs, cq = coarse_grain_restart(state, q, g, factor, strategy=strategy)
    save_state(path, cs, ak=ak, bk=bk, tracers=cq, **kw)
    return cs, cq


def export_fv_core_res(path, state, ak, bk, tracers=None):
    """Write the reference fv_core.res-style NetCDF (one file, all 6 tiles
    stacked on a 'tile' dim; the reference writes one file per tile)."""
    from scipy.io import netcdf_file
    u = np.asarray(state["u"])
    T, K, ny, nx = u.shape[0], u.shape[1], u.shape[2], np.asarray(
        state["v"]).shape[3]
    with netcdf_file(path, "w") as f:
        f.createDimension("tile", T)
        f.createDimension("zaxis_1", K)
        f.createDimension("zedge", K + 1)
        f.createDimension("yaxis_1", ny)          # n+1 (u rows)
        f.createDimension("yaxis_2", ny - 1)      # n
        f.createDimension("xaxis_1", nx)          # n+1 (v cols)
        f.createDimension("xaxis_2", nx - 1)      # n

        def put(name, arr, dims):
            var = f.createVariable(name, "d", dims)
            var[:] = np.asarray(arr, np.float64)

        put("ak", ak, ("zedge",))
        put("bk", bk, ("zedge",))
        put("u", state["u"], ("tile", "zaxis_1", "yaxis_1", "xaxis_2"))
        put("v", state["v"], ("tile", "zaxis_1", "yaxis_2", "xaxis_1"))
        put("T", state["pt"], ("tile", "zaxis_1", "yaxis_2", "xaxis_2"))
        put("delp", state["delp"], ("tile", "zaxis_1", "yaxis_2", "xaxis_2"))
        if state.get("w") is not None:
            put("W", state["w"], ("tile", "zaxis_1", "yaxis_2", "xaxis_2"))
        if state.get("delz") is not None:
            put("DZ", state["delz"], ("tile", "zaxis_1", "yaxis_2", "xaxis_2"))
        if state.get("phis") is not None:
            ph = np.asarray(state["phis"])
            if ph.ndim == 4:
                ph = ph[:, 0]
            put("phis", ph, ("tile", "yaxis_2", "xaxis_2"))
        for name, qv in (tracers or {}).items():
            put(name, qv, ("tile", "zaxis_1", "yaxis_2", "xaxis_2"))


def import_fv_core_res(path):
    """Read an export back -> (state dict, ak, bk, tracers)."""
    from scipy.io import netcdf_file
    known = {"u", "v", "T", "delp", "W", "DZ", "phis", "ak", "bk"}
    state, tracers = {}, {}
    with netcdf_file(path, "r", mmap=False) as f:
        for name, var in f.variables.items():
            arr = np.array(var[:])
            if name == "T":
                state["pt"] = arr
            elif name == "W":
                state["w"] = arr
            elif name == "DZ":
                state["delz"] = arr
            elif name in ("ak", "bk"):
                state[name] = arr
            elif name in known:
                state[name] = arr
            else:
                tracers[name] = arr
    ak = state.pop("ak", None)
    bk = state.pop("bk", None)
    return state, ak, bk, tracers


def remap_restart(state, tracers, ak_r, bk_r, ak, bk, g, kord=4,
                  hydrostatic=True):
    """Vertical remap of a restart state from the file's (ak_r, bk_r)
    coordinate (npz_rst levels) onto the run's (ak, bk) coordinate
    (fv_io.F90 remap_restart:624 / rst_remap:860, triggered by the
    `npz_rst` namelist flag, fv_restart.F90:277).

    state: dict with interior fields delp/pt/u/v [, w, delz] shaped
    [6, K_r, ...]; tracers: dict of [6, K_r, n, n] (or None). pt is
    TEMPERATURE. Returns (state, tracers) on the run coordinate, following
    the reference recipe: ps from the restart column mass; tracers remapped
    on p (iv=0); winds on wall-averaged p (iv=-1); virtual temperature on
    log-p (iv=1, geopotential-conserving); delz via specific volume
    (iv=1); all with monotone kord=4.
    """
    import jax.numpy as jnp

    from ..ops import fv_mapz
    from ..ops.sw_core import _rl, _cl
    from ..ops.fill_corners import fi
    from ..model import thermodynamics as thermo

    delp_r = jnp.asarray(state["delp"])
    K_r = delp_r.shape[1]
    Kn = len(np.asarray(ak)) - 1
    n = delp_r.shape[-1]
    npx = n + 1
    H = 3
    ctr = slice(H, H + n)
    f = fi
    wsl = slice(f(1), f(npx) + 1)
    kl = lambda a: jnp.moveaxis(a, 1, -1)          # k-minor for the remap ops
    kf = lambda a: jnp.moveaxis(a, -1, 1)
    e1 = lambda v: jnp.asarray(v, delp_r.dtype).reshape((1,) * 3 + (-1,))

    ps = jnp.asarray(ak_r)[0] + jnp.sum(delp_r, axis=1)
    pe1 = e1(ak_r) + e1(bk_r) * ps[..., None]      # [6, y, x, K_r+1]
    pe2 = e1(ak) + e1(bk) * ps[..., None]
    delp_new = kf(pe2[..., 1:] - pe2[..., :-1])

    zvir = thermo.ZVIR
    q_r = tracers or {}
    has_sphum = "sphum" in q_r
    tv = jnp.asarray(state["pt"])
    if has_sphum:
        tv = tv * (1.0 + zvir * jnp.asarray(q_r["sphum"]))

    new_q = None
    if q_r:
        names = list(q_r.keys())
        qs_stack = jnp.stack([kl(jnp.asarray(q_r[k])) for k in names], axis=1)
        qk = fv_mapz.map1_ppm_ext(qs_stack, pe1[:, None], pe2[:, None], iv=0,
                              kord=kord)
        new_q = {nm: kf(qk[:, i]) for i, nm in enumerate(names)}

    out = {"delp": delp_new}
    if not hydrostatic and "w" in state and state["w"] is not None:
        out["w"] = kf(fv_mapz.map1_ppm_ext(kl(jnp.asarray(state["w"])), pe1, pe2,
                                       iv=-1, kord=kord))
        if "delz" in state and state["delz"] is not None:
            # remap -delz/delp ("specific volume"), then scale back
            spv = -kl(jnp.asarray(state["delz"])) / kl(delp_r)
            spv2 = fv_mapz.map1_ppm_ext(spv, pe1, pe2, iv=1, kord=kord)
            out["delz"] = -kf(spv2) * delp_new

    # geopotential-conserving virtual-T remap on log-p
    tv_new = kf(fv_mapz.map1_ppm_ext(kl(tv), jnp.log(pe1), jnp.log(pe2), iv=1,
                                 kord=kord))
    pt_new = tv_new
    if has_sphum:
        pt_new = tv_new / (1.0 + zvir * new_q["sphum"])
    out["pt"] = pt_new

    # winds: edge pressures from wall-averaged ps (rst_remap:984-999, :1117)
    ps_pad = g.halo.pad_cell(ps[:, None])
    ps_u = 0.5 * (ps_pad[..., wsl, ctr] + _rl(ps_pad)[..., wsl, ctr])[:, 0]
    pu1 = e1(ak_r) + e1(bk_r) * ps_u[..., None]
    pu2 = e1(ak) + e1(bk) * ps_u[..., None]
    out["u"] = kf(fv_mapz.map1_ppm_ext(kl(jnp.asarray(state["u"])), pu1, pu2,
                                   iv=-1, kord=kord))
    ps_v = 0.5 * (ps_pad[..., ctr, wsl] + _cl(ps_pad)[..., ctr, wsl])[:, 0]
    pv1 = e1(ak_r) + e1(bk_r) * ps_v[..., None]
    pv2 = e1(ak) + e1(bk) * ps_v[..., None]
    out["v"] = kf(fv_mapz.map1_ppm_ext(kl(jnp.asarray(state["v"])), pv1, pv2,
                                   iv=-1, kord=kord))

    for k2 in ("phis", "ps"):
        if k2 in state:
            out[k2] = state[k2]
    return out, new_q


def make_nh_state(pt, delp, ptop, sphum=None):
    """make_nh startup conversion (fv_restart.F90:707-724): initialize the
    nonhydrostatic fields from a hydrostatic restart — w = 0 and delz
    from the hydrostatic relation delz = (Rd/g) Tv (ln pe_k - ln pe_k+1)
    (negative; heights decrease with k). pt: TEMPERATURE [T,K,n,n]."""
    import jax.numpy as jnp
    from .. import constants as con
    pe = ptop + jnp.cumsum(delp, axis=1)
    pe = jnp.concatenate([jnp.full_like(pe[:, :1], ptop), pe], axis=1)
    peln = jnp.log(pe)
    tv = pt if sphum is None else pt * (1.0 + con.ZVIR * sphum)
    delz = (con.RDGAS / con.GRAV) * tv * (peln[:, :-1] - peln[:, 1:])
    return jnp.zeros_like(pt), delz


def add_thermal_noise(pt, amplitude, seed=0):
    """add_noise startup option (fv_restart.F90:617-638): add uniform
    [0, amplitude) random noise to the temperature field and return
    (pt_new, rms_added) — the reference logs sqrt(sum(pert*amp^2)/n)."""
    import jax
    import jax.numpy as jnp
    pert = jax.random.uniform(jax.random.PRNGKey(seed), pt.shape,
                              dtype=pt.dtype)
    rms = jnp.sqrt(jnp.mean(pert * amplitude ** 2))
    return pt + pert * amplitude, float(rms)


def reset_eta(state, tracers, ak_old, bk_old, g, npz=None, npz_type=None,
              kord=4, hydrostatic=True):
    """reset_eta startup option (fv_arrays.F90 reset_eta; the reference
    re-derives the standard ak/bk tables on restart and remaps the state
    onto them): rebuild (ak, bk) from set_eta for the requested (or
    current) npz and vertically remap the restart state. Returns
    (state, tracers, ak, bk, ptop)."""
    from ..grid.fv_eta import set_eta
    K = state["delp"].shape[1] if npz is None else int(npz)
    kw = {} if npz_type is None else dict(npz_type=npz_type)
    ks, ptop, ak, bk = set_eta(K, **kw)
    st2, tr2 = remap_restart(state, tracers, ak_old, bk_old, ak, bk, g,
                             kord=kord, hydrostatic=hydrostatic)
    return st2, tr2, ak, bk, ptop
