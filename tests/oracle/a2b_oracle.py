"""Loop-literal NumPy oracle for a2b_ord4 (A-grid -> B-grid interpolation).

Transcribed statement-for-statement from /root/reference/model/a2b_edge.F90
a2b_ord4:47-327 for a full cube face: is=js=1, ie=je=npx-1, ng=3,
grid_type<3, bounded_domain=.false., all four corner flags true. The
cube-corner 3-way extrapolation (extrap_corner:449) is expressed through
the precomputed leg weights x1/(x2-x1) (the same great-circle quantities
grid_ops.py precomputes), so this oracle pins the stencil/edge algebra —
the drift-prone part — not the spherical geometry."""
import numpy as np

# a2b_edge.F90:30-40, 53-54
R3 = 1.0 / 3.0
A1, A2 = 0.5625, -0.0625
B1, B2 = 7.0 / 12.0, -1.0 / 12.0
C1, C2 = 2.0 / 3.0, -1.0 / 6.0


class F2:
    """2-D array with Fortran-style inclusive bounds (jlo:jhi, ilo:ihi)
    indexed [j, i] to match the repo's [y, x] layout (the Fortran arrays
    are (i, j); loops below keep the reference's index names)."""

    def __init__(self, jlo, jhi, ilo, ihi):
        self.jlo, self.ilo = jlo, ilo
        self.a = np.zeros((jhi - jlo + 1, ihi - ilo + 1), np.float64)

    @classmethod
    def from_np(cls, arr, jlo, ilo):
        f = cls(jlo, jlo + arr.shape[0] - 1, ilo, ilo + arr.shape[1] - 1)
        f.a[:] = arr
        return f

    def __getitem__(self, ji):
        j, i = ji
        return self.a[j - self.jlo, i - self.ilo]

    def __setitem__(self, ji, v):
        j, i = ji
        self.a[j - self.jlo, i - self.ilo] = v


def a2b_ord4_face(qin_p, dxa_p, dya_p, edge_w, edge_e, edge_s, edge_n,
                  corner_w, h=3):
    """qin_p/dxa_p/dya_p: repo padded [P, P] cell arrays (halo h).
    edge_*: [n+1] wall factors (f-index 0..npx stored 0-based).
    corner_w: [4, 3] extrap leg weights, corner order sw/se/ne/nw, leg
    order as ops.a2b_edge.corner_legs.
    Returns qout [NW, NW] padded corner array (halo rim zero)."""
    P = qin_p.shape[-1]
    n = P - 2 * h
    npx = npy = n + 1
    ng = h

    qin = F2.from_np(np.asarray(qin_p, np.float64), 1 - ng, 1 - ng)
    dxa = F2.from_np(np.asarray(dxa_p, np.float64), 1 - ng, 1 - ng)
    dya = F2.from_np(np.asarray(dya_p, np.float64), 1 - ng, 1 - ng)
    qout = F2(1 - ng, npy + ng, 1 - ng, npx + ng)
    qx = F2(1 - ng, npy + ng, 1, npx)
    qy = F2(1, npy, 1 - ng, npx + ng)
    qxx = F2(1 - ng, npy + ng, 1 - ng, npx + ng)
    qyy = F2(1 - ng, npy + ng, 1 - ng, npx + ng)

    # edge factors stored over corner index 0..n: wall f-index j -> j-1
    ew = lambda j: edge_w[j - 1]
    ee = lambda j: edge_e[j - 1]
    es = lambda i: edge_s[i - 1]
    en = lambda i: edge_n[i - 1]

    is_, ie, js, je = 1, npx - 1, 1, npy - 1
    is1, js1 = 1, 1
    is2, js2 = 2, 2
    ie1, je1 = npx - 1, npy - 1

    # ---- corners: 3-way extrapolation (a2b_edge.F90:105-133) -------------
    from gfdl_atmos_cubed_sphere_tpu.ops.a2b_edge import corner_legs
    legs = corner_legs(npx)
    cpos = {"sw": (1, 1), "se": (1, npx), "ne": (npy, npx), "nw": (npy, 1)}
    for ci, name in enumerate(("sw", "se", "ne", "nw")):
        acc = 0.0
        for li, (j1, i1, j2, i2) in enumerate(legs[name]):
            q1 = qin[j1, i1]
            q2 = qin[j2, i2]
            acc += q1 + corner_w[ci, li] * (q1 - q2)
        jq, iq = cpos[name]
        qout[jq, iq] = R3 * acc

    # ---- X-interior (a2b_edge.F90:135-140) -------------------------------
    for j in range(max(1, js - 2), min(npy - 1, je + 2) + 1):
        for i in range(max(3, is_), min(npx - 2, ie + 1) + 1):
            qx[j, i] = (B2 * (qin[j, i - 2] + qin[j, i + 1])
                        + B1 * (qin[j, i - 1] + qin[j, i]))

    # West edges (:142-158)
    q2v = {}
    for j in range(js1, je1 + 1):
        q2v[j] = ((qin[j, 0] * dxa[j, 1] + qin[j, 1] * dxa[j, 0])
                  / (dxa[j, 0] + dxa[j, 1]))
    for j in range(js2, je1 + 1):
        qout[j, 1] = ew(j) * q2v[j - 1] + (1.0 - ew(j)) * q2v[j]
    for j in range(max(1, js - 2), min(npy - 1, je + 2) + 1):
        g_in = dxa[j, 2] / dxa[j, 1]
        g_ou = dxa[j, -1] / dxa[j, 0]
        qx[j, 1] = 0.5 * (((2.0 + g_in) * qin[j, 1] - qin[j, 2]) / (1.0 + g_in)
                          + ((2.0 + g_ou) * qin[j, 0] - qin[j, -1]) / (1.0 + g_ou))
        qx[j, 2] = (3.0 * (g_in * qin[j, 1] + qin[j, 2])
                    - (g_in * qx[j, 1] + qx[j, 3])) / (2.0 + 2.0 * g_in)

    # East edges (:160-176)
    for j in range(js1, je1 + 1):
        q2v[j] = ((qin[j, npx - 1] * dxa[j, npx] + qin[j, npx] * dxa[j, npx - 1])
                  / (dxa[j, npx - 1] + dxa[j, npx]))
    for j in range(js2, je1 + 1):
        qout[j, npx] = ee(j) * q2v[j - 1] + (1.0 - ee(j)) * q2v[j]
    for j in range(max(1, js - 2), min(npy - 1, je + 2) + 1):
        g_in = dxa[j, npx - 2] / dxa[j, npx - 1]
        g_ou = dxa[j, npx + 1] / dxa[j, npx]
        qx[j, npx] = 0.5 * (
            ((2.0 + g_in) * qin[j, npx - 1] - qin[j, npx - 2]) / (1.0 + g_in)
            + ((2.0 + g_ou) * qin[j, npx] - qin[j, npx + 1]) / (1.0 + g_ou))
        qx[j, npx - 1] = (3.0 * (qin[j, npx - 2] + g_in * qin[j, npx - 1])
                          - (g_in * qx[j, npx] + qx[j, npx - 2])) / (2.0 + 2.0 * g_in)

    # ---- Y-interior (:193-197) -------------------------------------------
    for j in range(max(3, js), min(npy - 2, je + 1) + 1):
        for i in range(max(1, is_ - 2), min(npx - 1, ie + 2) + 1):
            qy[j, i] = (B2 * (qin[j - 2, i] + qin[j + 1, i])
                        + B1 * (qin[j - 1, i] + qin[j, i]))

    # South edges (:199-215)
    q1v = {}
    for i in range(is1, ie1 + 1):
        q1v[i] = ((qin[0, i] * dya[1, i] + qin[1, i] * dya[0, i])
                  / (dya[0, i] + dya[1, i]))
    for i in range(is2, ie1 + 1):
        qout[1, i] = es(i) * q1v[i - 1] + (1.0 - es(i)) * q1v[i]
    for i in range(max(1, is_ - 2), min(npx - 1, ie + 2) + 1):
        g_in = dya[2, i] / dya[1, i]
        g_ou = dya[-1, i] / dya[0, i]
        qy[1, i] = 0.5 * (((2.0 + g_in) * qin[1, i] - qin[2, i]) / (1.0 + g_in)
                          + ((2.0 + g_ou) * qin[0, i] - qin[-1, i]) / (1.0 + g_ou))
        qy[2, i] = (3.0 * (g_in * qin[1, i] + qin[2, i])
                    - (g_in * qy[1, i] + qy[3, i])) / (2.0 + 2.0 * g_in)

    # North edges (:217-233)
    for i in range(is1, ie1 + 1):
        q1v[i] = ((qin[npy - 1, i] * dya[npy, i] + qin[npy, i] * dya[npy - 1, i])
                  / (dya[npy - 1, i] + dya[npy, i]))
    for i in range(is2, ie1 + 1):
        qout[npy, i] = en(i) * q1v[i - 1] + (1.0 - en(i)) * q1v[i]
    for i in range(max(1, is_ - 2), min(npx - 1, ie + 2) + 1):
        g_in = dya[npy - 2, i] / dya[npy - 1, i]
        g_ou = dya[npy + 1, i] / dya[npy, i]
        qy[npy, i] = 0.5 * (
            ((2.0 + g_in) * qin[npy - 1, i] - qin[npy - 2, i]) / (1.0 + g_in)
            + ((2.0 + g_ou) * qin[npy, i] - qin[npy + 1, i]) / (1.0 + g_ou))
        qy[npy - 1, i] = (3.0 * (qin[npy - 2, i] + g_in * qin[npy - 1, i])
                          - (g_in * qy[npy, i] + qy[npy - 2, i])) / (2.0 + 2.0 * g_in)

    # ---- qxx / qyy / averaging (:252-283) --------------------------------
    for j in range(max(3, js), min(npy - 2, je + 1) + 1):
        for i in range(max(2, is_), min(npx - 1, ie + 1) + 1):
            qxx[j, i] = (A2 * (qx[j - 2, i] + qx[j + 1, i])
                         + A1 * (qx[j - 1, i] + qx[j, i]))
    for i in range(max(2, is_), min(npx - 1, ie + 1) + 1):     # js == 1
        qxx[2, i] = C1 * (qx[1, i] + qx[2, i]) + C2 * (qout[1, i] + qxx[3, i])
    for i in range(max(2, is_), min(npx - 1, ie + 1) + 1):     # je+1 == npy
        qxx[npy - 1, i] = (C1 * (qx[npy - 2, i] + qx[npy - 1, i])
                           + C2 * (qout[npy, i] + qxx[npy - 2, i]))

    for j in range(max(2, js), min(npy - 1, je + 1) + 1):
        for i in range(max(3, is_), min(npx - 2, ie + 1) + 1):
            qyy[j, i] = (A2 * (qy[j, i - 2] + qy[j, i + 1])
                         + A1 * (qy[j, i - 1] + qy[j, i]))
        qyy[j, 2] = C1 * (qy[j, 1] + qy[j, 2]) + C2 * (qout[j, 1] + qyy[j, 3])
        qyy[j, npx - 1] = (C1 * (qy[j, npx - 2] + qy[j, npx - 1])
                           + C2 * (qout[j, npx] + qyy[j, npx - 2]))
        for i in range(max(2, is_), min(npx - 1, ie + 1) + 1):
            qout[j, i] = 0.5 * (qxx[j, i] + qyy[j, i])

    # repo padded corner layout [NW, NW]: corner f-index c -> c - 1 + h
    NW = n + 1 + 2 * h
    out = np.zeros((NW, NW))
    for jq in range(1, npy + 1):
        for iq in range(1, npx + 1):
            out[jq - 1 + h, iq - 1 + h] = qout[jq, iq]
    return out
