"""Physics coupling: A-grid tendencies -> model state (component #18).

Re-implements /root/reference/model/fv_update_phys.F90 (fv_update_phys:67)
and the wind transforms of model/fv_grid_utils.F90: c2l_ord2:2470
(D-grid -> A-grid lat-lon winds, the `cubed_to_latlon` path used at
fv_dynamics.F90:803) and update_dwinds_phys:3291 (A-grid lat-lon wind
tendencies -> D-grid covariant wind update via 3D cartesian vectors and
the edge one-sided unit vectors es/ew).
"""

import jax.numpy as jnp
import numpy as np

H = 3


def _interior(geom, name):
    return jnp.asarray(geom.interior(name))


def cubed_to_latlon(u, v, g):
    """D winds -> A-grid (lat-lon) ua, va (c2l_ord2:2470, grid_type<4):
    vorticity-conserving covariant average then a11..a22 rotation."""
    geom = g.geom
    dx = _interior(geom, "dx")          # y-walls [6, n+1, n]
    dy = _interior(geom, "dy")          # x-walls [6, n, n+1]
    a11 = _interior(geom, "a11")[:, None]
    a12 = _interior(geom, "a12")[:, None]
    a21 = _interior(geom, "a21")[:, None]
    a22 = _interior(geom, "a22")[:, None]
    wu = u * dx[:, None]
    wv = v * dy[:, None]
    u1 = 2.0 * (wu[..., :-1, :] + wu[..., 1:, :]) / (dx[:, None, :-1, :]
                                                     + dx[:, None, 1:, :])
    v1 = 2.0 * (wv[..., :, :-1] + wv[..., :, 1:]) / (dy[:, None, :, :-1]
                                                     + dy[:, None, :, 1:])
    ua = a11 * u1 + a12 * v1
    va = a21 * u1 + a22 * v1
    return ua, va


def update_dwinds_phys(u, v, u_dt, v_dt, g, dt):
    """Scatter A-grid lat-lon wind tendencies onto the D grid
    (update_dwinds_phys:3291). u_dt/v_dt: [6, K, n, n] (interior);
    returns updated (u, v)."""
    geom = g.geom
    halo = g.halo
    n = g.n
    npx = g.npx
    dt5 = 0.5 * dt
    im2 = (npx - 1) // 2

    # 3D cartesian tendency vector at cells, with 1 halo row (pad + slice)
    vlon = jnp.asarray(geom.arrays["vlon"])[:, None]     # [6,1,NC,NC,3]
    vlat = jnp.asarray(geom.arrays["vlat"])[:, None]
    ud_p = halo.pad_cell(u_dt)
    vd_p = halo.pad_cell(v_dt)
    v3 = ud_p[..., None] * vlon + vd_p[..., None] * vlat  # [6,K,NC,NC,3]

    rim = slice(H - 1, H + n + 1)
    ctr = slice(H, H + n)
    # edge sums (interior wall ranges + 1 halo col/row where needed)
    ue = v3[..., H - 1:H + n, rim, :] + v3[..., H:H + n + 1, rim, :]
    # ue rows = y-walls 0..n, cols = cells -1..n
    ve = v3[..., rim, H - 1:H + n, :] + v3[..., rim, H:H + n + 1, :]
    # ve rows = cells -1..n, cols = x-walls 0..n

    # tile-edge 1D tangential interpolation (update_dwinds_phys:3379-3458)
    jj = np.arange(n)
    shift_up = jj > im2 - 1          # j > jm2 in 1-based = j-1 > jm2-1
    evw = jnp.asarray(geom.arrays["edge_vect_w"])        # [6, n]
    eve = jnp.asarray(geom.arrays["edge_vect_e"])
    evs = jnp.asarray(geom.arrays["edge_vect_s"])
    evn = jnp.asarray(geom.arrays["edge_vect_n"])

    def blend_col(vec, ev, icol):
        """Blend ve at x-wall column icol along cell rows with neighbor rows
        (toward the tile center sides)."""
        col = vec[..., 1:-1, icol, :]            # cell rows 0..n-1
        up = vec[..., :-2, icol, :]              # rows -1..n-2 (j-1)
        dn = vec[..., 2:, icol, :]               # rows 1..n (j+1)
        nb = jnp.where(jnp.asarray(shift_up)[:, None], up, dn)
        w = ev[:, None, :, None]
        return w * nb + (1.0 - w) * col

    def blend_row(vec, ev, jrow):
        row = vec[..., jrow, 1:-1, :]
        lf = vec[..., jrow, :-2, :]
        rt = vec[..., jrow, 2:, :]
        nb = jnp.where(jnp.asarray(shift_up)[:, None], lf, rt)
        w = ev[:, None, :, None]
        return w * nb + (1.0 - w) * row

    ve = ve.at[..., 1:-1, 0, :].set(blend_col(ve, evw, 0))
    ve = ve.at[..., 1:-1, n, :].set(blend_col(ve, eve, n))
    ue = ue.at[..., 0, 1:-1, :].set(blend_row(ue, evs, 0))
    ue = ue.at[..., n, 1:-1, :].set(blend_row(ue, evn, n))

    # project on the covariant edge unit vectors (es dir-1 for u, ew dir-2
    # for v) and update
    es1 = jnp.asarray(geom.arrays["es"])[:, None, :, :, 0, :]  # [6,1,n+1+2H?...]
    ew2 = jnp.asarray(geom.arrays["ew"])[:, None, :, :, 1, :]
    # es is y-wall [6, NWp, NCp, 2, 3] stored padded? slice interior walls
    nw = es1.shape[2]
    off = (nw - (n + 1)) // 2
    es1 = es1[:, :, off:off + n + 1, off:off + n]
    ew2 = ew2[:, :, off:off + n, off:off + n + 1]

    du = dt5 * jnp.sum(ue[..., :, 1:-1, :] * es1, axis=-1)
    dv = dt5 * jnp.sum(ve[..., 1:-1, :, :] * ew2, axis=-1)
    return u + du, v + dv


def del2_phys(qdt, delp, g, cd):
    """Del-2 filter of a mass-weighted physics tendency with a damping mask
    peaked at the cube panel edges/corners (fv_update_phys.F90
    del2_phys:770; enabled by fv_core_nml del2_cofac through the
    fv_update_phys n_dt hook at :323-333).

    qdt/delp: [6, K, n, n] interior; cd: the del2_cofac coefficient
    (0 < cd < 0.25 of da_min). Returns the filtered tendency.
    """
    geom = g.geom
    halo = g.halo
    n = g.n
    npx = g.npx
    dtype = qdt.dtype

    damp = 0.25 * cd * float(np.asarray(g.da_min))
    ii = np.arange(npx, dtype=np.float64)
    f1 = (1.0 - np.sin(ii / (npx - 1) * np.pi)) ** 2
    mask_c = damp * (f1[:, None] + f1[None, :])           # [npy, npx] corners
    mask_x = jnp.asarray(mask_c[:-1, :] + mask_c[1:, :], dtype)   # [n, n+1]
    mask_y = jnp.asarray(mask_c[:, :-1] + mask_c[:, 1:], dtype)   # [n+1, n]

    dy = _interior(geom, "dy")[:, None]                   # x-walls [6,1,n,n+1]
    sina_u = _interior(geom, "sina_u")[:, None]
    rdxc = _interior(geom, "rdxc")[:, None]
    dx = _interior(geom, "dx")[:, None]                   # y-walls [6,1,n+1,n]
    sina_v = _interior(geom, "sina_v")[:, None]
    rdyc = _interior(geom, "rdyc")[:, None]
    rarea = _interior(geom, "rarea")[:, None]

    qp = halo.pad_cell(qdt * delp)                        # mass-weighted
    qW = qp[..., H:H + n, H - 1:H + n]
    qE = qp[..., H:H + n, H:H + n + 1]
    fx = mask_x * dy * sina_u * (qW - qE) * rdxc
    qS = qp[..., H - 1:H + n, H:H + n]
    qN = qp[..., H:H + n + 1, H:H + n]
    fy = mask_y * dx * sina_v * (qS - qN) * rdyc

    from ..ops.fill_corners import cube_edges
    if cube_edges(g):
        # one-sided sin_sg factors at the cube panel edges (del2_phys
        # :843-862); sin_sg components on the padded cell frame
        sg1, sg2 = g.sin_sg1, g.sin_sg2          # [6, 1, NC, NC] padded
        sg3, sg4 = g.sin_sg3, g.sin_sg4
        west = 0.5 * (sg1[:, :, H:H + n, H] + sg3[:, :, H:H + n, H - 1])
        east = 0.5 * (sg1[:, :, H:H + n, H + n]
                      + sg3[:, :, H:H + n, H + n - 1])
        fx = fx.at[..., 0].set(mask_x[:, 0] * dy[..., 0] * (qW - qE)[..., 0]
                               * rdxc[..., 0] * west)
        fx = fx.at[..., -1].set(mask_x[:, -1] * dy[..., -1]
                                * (qW - qE)[..., -1] * rdxc[..., -1] * east)
        south = 0.5 * (sg2[:, :, H, H:H + n] + sg4[:, :, H - 1, H:H + n])
        north = 0.5 * (sg2[:, :, H + n, H:H + n]
                       + sg4[:, :, H + n - 1, H:H + n])
        fy = fy.at[..., 0, :].set(mask_y[0] * dx[..., 0, :]
                                  * (qS - qN)[..., 0, :] * rdyc[..., 0, :]
                                  * south)
        fy = fy.at[..., -1, :].set(mask_y[-1] * dx[..., -1, :]
                                   * (qS - qN)[..., -1, :] * rdyc[..., -1, :]
                                   * north)

    return qdt + rarea * (fx[..., :, :-1] - fx[..., :, 1:]
                          + fy[..., :-1, :] - fy[..., 1:, :]) / delp


def fv_update_phys(dt, pt, delp, u, v, q, u_dt, v_dt, t_dt, q_dt, g,
                   del2_cofac=0.0):
    """Apply physics tendencies (fv_update_phys.F90:67, simplified moist
    handling): T and tracers updated directly, winds via
    update_dwinds_phys. Tendencies are per-second on the A grid.
    del2_cofac > 0 filters the wind/temperature tendencies first
    (fv_update_phys.F90:323-333)."""
    if del2_cofac > 0.0:
        u_dt = del2_phys(u_dt, delp, g, del2_cofac)
        v_dt = del2_phys(v_dt, delp, g, del2_cofac)
        t_dt = del2_phys(t_dt, delp, g, del2_cofac)
    pt = pt + dt * t_dt
    q_new = dict(q or {})
    for k, dq in (q_dt or {}).items():
        q_new[k] = q_new.get(k, 0.0) + dt * dq
    u, v = update_dwinds_phys(u, v, u_dt, v_dt, g, dt)
    return pt, u, v, q_new
