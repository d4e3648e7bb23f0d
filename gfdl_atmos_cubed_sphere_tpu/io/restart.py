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
