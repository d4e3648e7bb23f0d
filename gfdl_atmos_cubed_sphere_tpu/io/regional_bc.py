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


# ---------------------------------------------------------------------------
# Reference-layout BC files: the operational `gfs_bndy.tile7.NNN.nc` files
# written by chgres and read by regional_bc_data
# (/root/reference/model/fv_regional_bc.F90:1574, read_regional_bc_file
# :3095). Layout facts transcribed from the reader:
#   * one file per boundary hour, dims `lev` (+ per-variable lon/lat dims);
#   * variables named `{root}_{bottom,top,left,right}` where bottom is the
#     j-start strip, top the j-end strip, left the i-start strip and right
#     the i-end strip of the DATA domain (compute + nhalo_data=4 halo);
#   * cell-centered roots: ps (2-D), t, delp, delz, w, zh + every tracer;
#     bottom/top strips span the full i extent (n + 2*nhalo_data columns)
#     and nhalo_data+nrows_blend rows; left/right span the n interior rows;
#   * wind roots u_s/v_s (j-wall stagger, one extra row on bottom/top) and
#     u_w/v_w (i-wall stagger, one extra column on left/right), stored as
#     EARTH-RELATIVE components and projected onto the local grid on read.
# Our padded frames carry H=3 halo rows; on read the outermost
# (nhalo_data - H) file rows are dropped.
# ---------------------------------------------------------------------------

NHALO_DATA = 4      # fv_regional_bc.F90 nhalo_data


def _wall_earth_basis(geom, which):
    """(e_lon, e_lat) 3-vectors at wall midpoints of the padded patch.
    which='y': j-walls (u_s/v_s points); 'x': i-walls (u_w/v_w)."""
    g = np.asarray(geom.arrays["grid_xyz"], np.float64)   # [1, NCP, NCP, 3]
    if which == "y":
        mid = 0.5 * (g[:, :, :-1] + g[:, :, 1:])
    else:
        mid = 0.5 * (g[:, :-1, :] + g[:, 1:, :])
    mid = mid / np.linalg.norm(mid, axis=-1, keepdims=True)
    lon = np.arctan2(mid[..., 1], mid[..., 0])
    lat = np.arcsin(np.clip(mid[..., 2], -1.0, 1.0))
    e_lon = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], -1)
    e_lat = np.stack([-np.sin(lat) * np.cos(lon),
                      -np.sin(lat) * np.sin(lon), np.cos(lat)], -1)
    return e_lon, e_lat


def _dgrid_from_earth(geom, ue_s, vn_s, ue_w, vn_w):
    """Project earth-relative wall winds onto the D-grid: u = w . es1 at
    j-walls, v = w . ew2 at i-walls (the regional_bc_data rotation,
    fv_regional_bc.F90:2360-2430)."""
    es1 = np.asarray(geom.arrays["es"], np.float64)[..., 0, :]
    ew2 = np.asarray(geom.arrays["ew"], np.float64)[..., 1, :]
    ely, elaty = _wall_earth_basis(geom, "y")
    elx, elatx = _wall_earth_basis(geom, "x")
    wy = ue_s[..., None] * ely + vn_s[..., None] * elaty
    wx = ue_w[..., None] * elx + vn_w[..., None] * elatx
    u = np.einsum("...c,...c->...", wy, es1)
    v = np.einsum("...c,...c->...", wx, ew2)
    return u, v


def _earth_from_dgrid(geom, u, v):
    """Inverse of _dgrid_from_earth for synthesizing reference-layout
    files from D-grid frames: rebuild the tangent wind at each wall from
    the along-wall component plus the interpolated cross component (in
    the non-orthogonal (es1, en1)/(ew2, en2) basis), then take earth
    components. u [.., NY+1, NX] j-walls; v [.., NY, NX+1] i-walls."""
    es1 = np.asarray(geom.arrays["es"], np.float64)[..., 0, :]
    en1 = np.asarray(geom.arrays["en1"], np.float64)
    ew2 = np.asarray(geom.arrays["ew"], np.float64)[..., 1, :]
    en2 = np.asarray(geom.arrays["en2"], np.float64)

    def recon(a, b, e_a, e_b):
        # w = alpha e_a + beta e_b with w.e_a = a, w.e_b = b
        g12 = np.einsum("...c,...c->...", e_a, e_b)
        det = np.maximum(1.0 - g12 ** 2, 1.0e-12)
        alpha = (a - g12 * b) / det
        beta = (b - g12 * a) / det
        return alpha[..., None] * e_a + beta[..., None] * e_b

    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    # cross components interpolated to the other stagger
    v_at_y = np.empty(u.shape)
    v_mid = 0.25 * (v[..., :-1, :-1] + v[..., :-1, 1:]
                    + v[..., 1:, :-1] + v[..., 1:, 1:])
    v_at_y[..., 1:-1, :] = v_mid
    v_at_y[..., 0, :] = 0.5 * (v[..., 0, :-1] + v[..., 0, 1:])
    v_at_y[..., -1, :] = 0.5 * (v[..., -1, :-1] + v[..., -1, 1:])
    u_at_x = np.empty(v.shape)
    u_mid = 0.25 * (u[..., :-1, :-1] + u[..., 1:, :-1]
                    + u[..., :-1, 1:] + u[..., 1:, 1:])
    u_at_x[..., :, 1:-1] = u_mid
    u_at_x[..., :, 0] = 0.5 * (u[..., :-1, 0] + u[..., 1:, 0])
    u_at_x[..., :, -1] = 0.5 * (u[..., :-1, -1] + u[..., 1:, -1])

    wy = recon(u, v_at_y, es1, en1)
    wx = recon(v, u_at_x, ew2, en2)
    ely, elaty = _wall_earth_basis(geom, "y")
    elx, elatx = _wall_earth_basis(geom, "x")
    ue_s = np.einsum("...c,...c->...", wy, ely)
    vn_s = np.einsum("...c,...c->...", wy, elaty)
    ue_w = np.einsum("...c,...c->...", wx, elx)
    vn_w = np.einsum("...c,...c->...", wx, elatx)
    return ue_s, vn_s, ue_w, vn_w


def _ref_strips(frame, nb, wall=None):
    """Cut the four reference-layout strips out of a padded frame,
    replicating the outermost row/column (nhalo_data - H) extra times to
    reach the file's 4-deep halo. wall: None (cell), 'y' (j-wall rows on
    bottom/top get +1), 'x' (i-wall columns on left/right get +1)."""
    a = np.asarray(frame)
    extra = NHALO_DATA - H
    pad = [(0, 0)] * (a.ndim - 2) + [(extra, extra), (extra, extra)]
    a = np.pad(a, pad, mode="edge")
    w = NHALO_DATA + nb
    rows = w + (1 if wall == "y" else 0)
    cols = w + (1 if wall == "x" else 0)
    ny = a.shape[-2]
    # interior j rows (between the bottom/top strips) for left/right
    ji = slice(NHALO_DATA, ny - NHALO_DATA)
    return {
        "bottom": a[..., :rows, :],
        "top": a[..., -rows:, :],
        "left": a[..., ji, :cols],
        "right": a[..., ji, -cols:],
    }


def write_gfs_bndy_file(path, geom, frames, bc_hour, nrows_blend=0,
                        ak=None, bk=None):
    """Synthesize a reference-layout gfs_bndy.tile7.NNN.nc from padded
    frames: cell roots written as-is, D-grid (u, v) frames converted to
    earth-relative u_s/v_s/u_w/v_w (the chgres convention)."""
    from scipy.io import netcdf_file
    nb = int(nrows_blend)
    f = netcdf_file(path, "w")
    f.createDimension("one", 1)
    hvar = f.createVariable("bc_hour", "i", ("one",))
    hvar[:] = int(bc_hour)
    klev = None
    for name, frame in frames.items():
        if name in ("u", "v"):
            continue
        if frame.ndim >= 3 and frame.shape[-3] > 1:
            klev = frame.shape[-3]
    if klev is None:
        klev = 1
    f.createDimension("lev", klev)
    f.createDimension("levp", klev + 1)
    if ak is not None:
        va = f.createVariable("ak", "d", ("levp",))
        va[:] = np.asarray(ak, np.float64)
        vb = f.createVariable("bk", "d", ("levp",))
        vb[:] = np.asarray(bk, np.float64)

    def put(root, strips):
        for side, arr in strips.items():
            a = np.asarray(arr, np.float32)
            a = a.reshape(a.shape[-3:]) if a.ndim > 3 else a
            dims = []
            for di, dn in enumerate(a.shape):
                dname = f"{root}_{side}_d{di}"
                f.createDimension(dname, dn)
                dims.append(dname)
            v = f.createVariable(f"{root}_{side}", "f", tuple(dims))
            v[:] = a

    for name, frame in frames.items():
        if name in ("u", "v"):
            continue
        root = "t" if name == "pt" else name
        put(root, _ref_strips(frame, nb))
    if "u" in frames and "v" in frames:
        ue_s, vn_s, ue_w, vn_w = _earth_from_dgrid(
            geom, frames["u"], frames["v"])
        put("u_s", _ref_strips(ue_s, nb, wall="y"))
        put("v_s", _ref_strips(vn_s, nb, wall="y"))
        put("u_w", _ref_strips(ue_w, nb, wall="x"))
        put("v_w", _ref_strips(vn_w, nb, wall="x"))
    f.close()


def read_gfs_bndy_file(path, geom, npz, nrows_blend=0):
    """Ingest a reference-layout gfs_bndy file: returns (bc_hour,
    {name: {side: strip}}) in this module's strip format (our H=3 frame
    geometry, sides south/north/west/east), with the earth-relative wall
    winds projected onto the patch D-grid. Cell roots are renamed to the
    internal names (t -> pt)."""
    from scipy.io import netcdf_file
    nb = int(nrows_blend)
    f = netcdf_file(path, "r", mmap=False)
    bc_hour = (int(f.variables["bc_hour"][0])
               if "bc_hour" in f.variables else 0)
    n = geom.n
    NY = NX = n + 2 * H
    w = NHALO_DATA + nb
    W = H + nb
    extra = NHALO_DATA - H

    raw = {}
    for vn, var in f.variables.items():
        if "_" not in vn:
            continue
        root, side = vn.rsplit("_", 1)
        if side in ("bottom", "top", "left", "right"):
            raw.setdefault(root, {})[side] = np.array(var[:], np.float64)

    def assemble(root, wall=None):
        """Reference strips -> full padded frame (zeros off the rim)."""
        sv = raw[root]
        b = sv["bottom"]
        K = b.shape[0] if b.ndim == 3 else 1
        shp = (1, K, NY + (1 if wall == "y" else 0),
               NX + (1 if wall == "x" else 0))
        fr = np.zeros(shp)
        rows = w + (1 if wall == "y" else 0)
        cs = slice(extra, extra + NX + (1 if wall == "x" else 0))
        fr[..., :rows - extra, :] = sv["bottom"][..., extra:, cs]
        fr[..., -(rows - extra):, :] = sv["top"][..., :rows - extra, cs]
        cols = w + (1 if wall == "x" else 0)
        ji = slice(H, H + n + (1 if wall == "y" else 0))
        jsrc = slice(None) if wall != "y" else slice(None)
        fr[..., ji, :cols - extra] = sv["left"][..., jsrc, extra:]
        fr[..., ji, -(cols - extra):] = sv["right"][..., jsrc,
                                                    :cols - extra]
        return fr

    out = {}
    rename = {"t": "pt"}
    for root in raw:
        if root in ("u_s", "v_s", "u_w", "v_w"):
            continue
        fr = assemble(root)
        out[rename.get(root, root)] = frame_to_strips(fr, W)
    if all(r in raw for r in ("u_s", "v_s", "u_w", "v_w")):
        ue_s = assemble("u_s", wall="y")
        vn_s = assemble("v_s", wall="y")
        ue_w = assemble("u_w", wall="x")
        vn_w = assemble("v_w", wall="x")
        u, v = _dgrid_from_earth(geom, ue_s[:, :], vn_s[:, :],
                                 ue_w[:, :], vn_w[:, :])
        out["u"] = frame_to_strips(u, W)
        out["v"] = frame_to_strips(v, W)
    f.close()
    return bc_hour, out


def gfs_bndy_series(bc_dir, geom, npz, nrows_blend=0):
    """RegionalBCSeries from a directory of reference-layout
    gfs_bndy.tile7.NNN.nc files (regional_bc_data's file-name scheme,
    fv_regional_bc.F90:1690): validity time = bc_hour * 3600 s. Lets a
    reference-generated regional case drive RegionalCubeRun directly."""
    import re as _re
    files = sorted(fn for fn in os.listdir(bc_dir)
                   if _re.fullmatch(r"gfs_bndy\.tile7\.\d+(_gsi)?\.nc", fn))
    if not files:
        raise FileNotFoundError(f"no gfs_bndy.tile7.*.nc files in {bc_dir}")
    series = object.__new__(RegionalBCSeries)
    series.entries = []
    series.width = H + int(nrows_blend)
    for fn in files:
        hour_s = _re.search(r"\.(\d+)(_gsi)?\.nc$", fn).group(1)
        bc_hour, strips = read_gfs_bndy_file(
            os.path.join(bc_dir, fn), geom, npz, nrows_blend=nrows_blend)
        t = (bc_hour if bc_hour else int(hour_s)) * 3600.0
        series.entries.append((t, strips))
    series.entries.sort(key=lambda e: e[0])
    return series
