"""Regional lateral-BC files for gnomonic limited-area patches.

The reference regional mode reads time-levelled lateral BCs from
`fv_core.res_*_BC` NetCDF files into per-side boundary buffers
(/root/reference/model/fv_regional_bc.F90 regional_bc_data:1574, the
north/south/east/west `fv_regional_BC_t` side blocks :100-180), keeping
two time levels with t1->t0 rotation at every `bc_update_interval`
(:1306). This module is the TPU-native equivalent: NetCDF3 files (scipy
interop, like io/restart.py) holding the four boundary-side strips of
each prognostic field at one validity time; the driver holds two time
levels and rebuilds NestBCHalo frames by linear time interpolation.

Strip geometry on the padded patch frame [.., n+2H, n+2H(+1)]:
  south/north: full-width rows    [.., W, nx_pad]
  west/east:   interior-row cols  [.., n+2H-2W, W]
with W = H + nrows_blend rows (halo ring + Davies blend zone).
"""

import os

import numpy as np

H = 3


def frame_to_strips(frame, width):
    """frame [T, K, NY, NX] -> dict of 4 side strips (numpy)."""
    a = np.asarray(frame)
    return {
        "south": a[..., :width, :],
        "north": a[..., -width:, :],
        "west": a[..., width:-width, :width],
        "east": a[..., width:-width, -width:],
    }


def strips_to_frame(strips, interior, width):
    """Rebuild a full padded frame: BC strips on the rim, `interior`
    (edge-clamped to the pad) elsewhere. interior [T, K, ny, nx]."""
    import jax.numpy as jnp
    pad = [(0, 0)] * (interior.ndim - 2) + [(H, H), (H, H)]
    fr = jnp.pad(interior, pad, mode="edge")
    w = width
    fr = fr.at[..., :w, :].set(jnp.asarray(strips["south"]))
    fr = fr.at[..., -w:, :].set(jnp.asarray(strips["north"]))
    fr = fr.at[..., w:-w, :w].set(jnp.asarray(strips["west"]))
    fr = fr.at[..., w:-w, -w:].set(jnp.asarray(strips["east"]))
    return fr


def write_bc_file(path, t_seconds, frames, width):
    """Write one validity time of regional BCs: frames is a dict
    name -> full padded frame [T, K, NY, NX]; only the side strips are
    stored (fv_regional_bc.F90 side-block layout)."""
    from scipy.io import netcdf_file
    f = netcdf_file(path, "w")
    f.createDimension("one", 1)
    tvar = f.createVariable("time_seconds", "d", ("one",))
    tvar[:] = float(t_seconds)
    wvar = f.createVariable("strip_width", "i", ("one",))
    wvar[:] = int(width)
    for name, frame in frames.items():
        strips = frame_to_strips(frame, width)
        for side, arr in strips.items():
            dims = []
            for di, dn in enumerate(arr.shape):
                dname = f"{name}_{side}_d{di}"
                f.createDimension(dname, dn)
                dims.append(dname)
            v = f.createVariable(f"{name}_{side}", "f", tuple(dims))
            v[:] = np.asarray(arr, np.float32)
    f.close()


def read_bc_file(path):
    """Returns (t_seconds, width, {name: {side: numpy strip}})."""
    from scipy.io import netcdf_file
    f = netcdf_file(path, "r", mmap=False)
    t = float(f.variables["time_seconds"][0])
    width = int(f.variables["strip_width"][0])
    out = {}
    for vn, var in f.variables.items():
        if vn in ("time_seconds", "strip_width"):
            continue
        name, side = vn.rsplit("_", 1)
        out.setdefault(name, {})[side] = np.array(var[:], np.float64)
    f.close()
    return t, width, out


class RegionalBCSeries:
    """Directory of bc_*.nc files; serves time-interpolated side strips
    with the two-level t1->t0 rotation (fv_regional_bc.F90:1306)."""

    def __init__(self, bc_dir):
        files = sorted(fn for fn in os.listdir(bc_dir)
                       if fn.startswith("bc_") and fn.endswith(".nc"))
        if not files:
            raise FileNotFoundError(f"no bc_*.nc files in {bc_dir}")
        self.entries = []
        self.width = None
        for fn in files:
            t, w, strips = read_bc_file(os.path.join(bc_dir, fn))
            self.entries.append((t, strips))
            self.width = w
        self.entries.sort(key=lambda e: e[0])

    def strips_at(self, t_seconds):
        """Linear interpolation between the bracketing time levels
        (clamped at the ends)."""
        ts = [e[0] for e in self.entries]
        if t_seconds <= ts[0]:
            return self.entries[0][1]
        if t_seconds >= ts[-1]:
            return self.entries[-1][1]
        import bisect
        i1 = bisect.bisect_right(ts, t_seconds)
        i0 = i1 - 1
        t0, s0 = self.entries[i0]
        t1, s1 = self.entries[i1]
        wgt = (t_seconds - t0) / (t1 - t0)
        out = {}
        for name in s0:
            out[name] = {side: (1.0 - wgt) * s0[name][side]
                         + wgt * s1[name][side] for side in s0[name]}
        return out
