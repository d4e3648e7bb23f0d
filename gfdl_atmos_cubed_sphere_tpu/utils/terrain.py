"""Terrain generation + filtering (component #25).

Re-implements the filtering core of /root/reference/tools/fv_surf_map.F90:
del2_cubed_sphere:812 and del4_cubed_sphere:915 (cell-centered diffusion
of the surface height on the cube with sin_sg-weighted wall fluxes) and
the FV3_zs_filter:464 combination used by `surfdrv`; plus a simple
analytic terrain synthesizer for idealized cases.
"""

import jax.numpy as jnp
import numpy as np

from .. import constants as con

H = 3


def del2_terrain(phis, g, cd, nmax=1):
    """nmax passes of del-2 diffusion of a cell field (del2_cubed_sphere:812).

    phis [6, n, n] or [6, 1, n, n]; cd: diffusion coefficient (m^2); the
    reference uses cd ~ 0.12-0.25 * da_min."""
    squeeze = phis.ndim == 3
    q = phis[:, None] if squeeze else phis          # [6, 1, n, n]
    n = g.n
    ctr = slice(H, H + n)
    wsl = slice(H, H + n + 1)                       # walls 0..n (padded idx)
    cl = slice(H - 1, H + n)                        # cell left of each wall
    cr = slice(H, H + n + 1)                        # cell right of each wall
    for _ in range(nmax):
        qp = g.halo.pad_cell(q)
        sgx = 0.5 * (g.sin_sg3[..., ctr, cl] + g.sin_sg1[..., ctr, cr])
        fx = (g.dy[..., ctr, wsl] * sgx * g.rdxc[..., ctr, wsl]
              * (qp[..., ctr, cl] - qp[..., ctr, cr]))
        sgy = 0.5 * (g.sin_sg4[..., cl, ctr] + g.sin_sg2[..., cr, ctr])
        fy = (g.dx[..., wsl, ctr] * sgy * g.rdyc[..., wsl, ctr]
              * (qp[..., cl, ctr] - qp[..., cr, ctr]))
        q = q + cd * g.rarea[..., ctr, ctr] * (
            fx[..., :, :-1] - fx[..., :, 1:]
            + fy[..., :-1, :] - fy[..., 1:, :])
    return q[:, 0] if squeeze else q


def del4_terrain(phis, g, nmax=1):
    """del-4 (biharmonic) filter pass (del4_cubed_sphere:915): del-2 of the
    del-2 increment, applied anti-diffusively."""
    cd = 0.16 * float(np.asarray(g.da_min))
    q = phis
    for _ in range(nmax):
        d2 = del2_terrain(q, g, cd, 1) - q
        q = q - (del2_terrain(d2, g, cd, 1) - d2)
    return q


def fv3_zs_filter(phis, g, n_del2_weak=12, n_del2_strong=0, n_del4=2):
    """The operational terrain-filter combination (FV3_zs_filter:464):
    strong del-2 passes, del-4 passes, then weak del-2 passes."""
    cd_weak = 0.12 * float(np.asarray(g.da_min))
    cd_strong = 0.20 * float(np.asarray(g.da_min))
    q = phis
    if n_del2_strong:
        q = del2_terrain(q, g, cd_strong, n_del2_strong)
    if n_del4:
        q = del4_terrain(q, g, n_del4)
    if n_del2_weak:
        q = del2_terrain(q, g, cd_weak, n_del2_weak)
    return q


def synthetic_terrain(geom, h0=2000.0, lat0=0.7, lon0=1.0, r0=0.4,
                      kind="gaussian"):
    """Idealized terrain (surfdrv stand-in for tests): a Gaussian hill or
    cosine bell in great-circle distance from (lon0, lat0). Returns phis
    [6, 1, n, n] (geopotential)."""
    lon = geom.interior("aglon")
    lat = geom.interior("aglat")
    cosd = (np.sin(lat0) * np.sin(lat)
            + np.cos(lat0) * np.cos(lat) * np.cos(lon - lon0))
    r = np.arccos(np.clip(cosd, -1.0, 1.0))
    if kind == "gaussian":
        zs = h0 * np.exp(-(r / r0) ** 2)
    else:
        zs = h0 * np.cos(np.pi * np.minimum(r / r0, 1.0) / 2.0) ** 2
    return (zs * con.GRAV)[:, None]
