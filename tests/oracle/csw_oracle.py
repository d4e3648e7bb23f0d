"""Loop-literal NumPy oracle for the C-grid half step.

Transcribed statement-for-statement from /root/reference/model/sw_core.F90:
  c_sw:79-493 (full-tile cube path: grid_type 0, bounded_domain=.false.,
  all four corners on-tile, dord4=.true. as dyn_core.F90:445 passes),
  d2a2c_vect:3006-3345, divergence_corner:1740-1860,
  fill2_4corners:3434, fill_4corners:3496, edge_interpolate4:3349.
Deliberately slow scalar code; its only job is to pin the vectorized JAX
c_sw (ops/sw_core.py) at ~1e-12 f64."""
import numpy as np

BIG = 1.0e30
A1, A2 = 0.5625, -0.0625
C1, C2, C3 = -2.0 / 14.0, 11.0 / 14.0, 5.0 / 14.0


class FA2:
    """2-D array with Fortran-style inclusive bounds (i, j)."""

    def __init__(self, lo_i, hi_i, lo_j, hi_j, fill=0.0):
        self.li, self.hi = lo_i, hi_i
        self.lj, self.hj = lo_j, hi_j
        self.a = np.full((hi_j - lo_j + 1, hi_i - lo_i + 1), fill)

    @classmethod
    def from_np(cls, arr, lo_i, lo_j):
        """arr: numpy [nj, ni] with (j, i) layout."""
        f = cls(lo_i, lo_i + arr.shape[1] - 1, lo_j, lo_j + arr.shape[0] - 1)
        f.a[:, :] = np.asarray(arr, np.float64)
        return f

    def __getitem__(self, ij):
        i, j = ij
        assert self.li <= i <= self.hi and self.lj <= j <= self.hj, \
            (i, j, self.li, self.hi, self.lj, self.hj)
        return self.a[j - self.lj, i - self.li]

    def __setitem__(self, ij, v):
        i, j = ij
        assert self.li <= i <= self.hi and self.lj <= j <= self.hj, \
            (i, j, self.li, self.hi, self.lj, self.hj)
        self.a[j - self.lj, i - self.li] = v

    def to_np(self, lo_i, hi_i, lo_j, hi_j):
        return self.a[lo_j - self.lj:hi_j - self.lj + 1,
                      lo_i - self.li:hi_i - self.li + 1].copy()


def edge_interpolate4(ua4, dxa4):
    t1 = dxa4[0] + dxa4[1]
    t2 = dxa4[2] + dxa4[3]
    return 0.5 * (((t1 + dxa4[1]) * ua4[1] - dxa4[1] * ua4[0]) / t1
                  + ((t2 + dxa4[2]) * ua4[2] - dxa4[2] * ua4[3]) / t2)


def fill_4corners(q, direction, npx, npy):
    if direction == 1:
        q[-1, 0] = q[0, 2]
        q[0, 0] = q[0, 1]
        q[npx + 1, 0] = q[npx, 2]
        q[npx, 0] = q[npx, 1]
        q[0, npy] = q[0, npy - 1]
        q[-1, npy] = q[0, npy - 2]
        q[npx, npy] = q[npx, npy - 1]
        q[npx + 1, npy] = q[npx, npy - 2]
    else:
        q[0, 0] = q[1, 0]
        q[0, -1] = q[2, 0]
        q[npx, 0] = q[npx - 1, 0]
        q[npx, -1] = q[npx - 2, 0]
        q[0, npy] = q[1, npy]
        q[0, npy + 1] = q[2, npy]
        q[npx, npy] = q[npx - 1, npy]
        q[npx, npy + 1] = q[npx - 2, npy]


def fill2_4corners(q1, q2, direction, npx, npy):
    if direction == 1:
        for q in (q1, q2):
            q[-1, 0] = q[0, 2]
            q[0, 0] = q[0, 1]
            q[npx + 1, 0] = q[npx, 2]
            q[npx, 0] = q[npx, 1]
            q[0, npy] = q[0, npy - 1]
            q[-1, npy] = q[0, npy - 2]
            q[npx, npy] = q[npx, npy - 1]
            q[npx + 1, npy] = q[npx, npy - 2]
    else:
        for q in (q1, q2):
            q[0, 0] = q[1, 0]
            q[0, -1] = q[2, 0]
            q[npx, 0] = q[npx - 1, 0]
            q[npx, -1] = q[npx - 2, 0]
            q[0, npy] = q[1, npy]
            q[0, npy + 1] = q[2, npy]
            q[npx, npy] = q[npx - 1, npy]
            q[npx, npy + 1] = q[npx - 2, npy]


def d2a2c_vect_ref(u, v, g, npx, bounds):
    """Full-tile cube branch (grid_type 0, not bounded, dord4=.true.).
    u, v: FA2; g: dict of FA2 metric arrays + 3rd-dim sin_sg/cos_sg lists.
    Returns (ua, va, uc, vc, ut, vt) FA2."""
    npy = npx
    is_, ie, js, je, isd, ied, jsd, jed = bounds
    iep1, jep1 = ie + 1, je + 1
    id_ = 1
    npt = 4

    utmp = FA2(isd, ied, jsd, jed, BIG)
    vtmp = FA2(isd, ied, jsd, jed, BIG)
    ua = FA2(isd, ied, jsd, jed, BIG)
    va = FA2(isd, ied, jsd, jed, BIG)
    uc = FA2(isd, ied + 1, jsd, jed, BIG)
    vc = FA2(isd, ied, jsd, jed + 1, BIG)
    ut = FA2(isd, ied + 1, jsd, jed, BIG)
    vt = FA2(isd, ied, jsd, jed + 1, BIG)
    sin_sg = g["sin_sg"]
    cos_sg = g["cos_sg"]

    # interior 4th order
    for j in range(max(npt, js - 1), min(npy - npt, je + 1) + 1):
        for i in range(max(npt, isd), min(npx - npt, ied) + 1):
            utmp[i, j] = (A2 * (u[i, j - 1] + u[i, j + 2])
                          + A1 * (u[i, j] + u[i, j + 1]))
    for j in range(max(npt, jsd), min(npy - npt, jed) + 1):
        for i in range(max(npt, is_ - 1), min(npx - npt, ie + 1) + 1):
            vtmp[i, j] = (A2 * (v[i - 1, j] + v[i + 2, j])
                          + A1 * (v[i, j] + v[i + 1, j]))
    # edges 2nd order (grid_type < 3)
    if js == 1 or jsd < npt:
        for j in range(jsd, npt - 1 + 1):
            for i in range(isd, ied + 1):
                utmp[i, j] = 0.5 * (u[i, j] + u[i, j + 1])
                vtmp[i, j] = 0.5 * (v[i, j] + v[i + 1, j])
    if (je + 1) == npy or jed >= (npy - npt):
        for j in range(npy - npt + 1, jed + 1):
            for i in range(isd, ied + 1):
                utmp[i, j] = 0.5 * (u[i, j] + u[i, j + 1])
                vtmp[i, j] = 0.5 * (v[i, j] + v[i + 1, j])
    if is_ == 1 or isd < npt:
        for j in range(max(npt, jsd), min(npy - npt, jed) + 1):
            for i in range(isd, npt - 1 + 1):
                utmp[i, j] = 0.5 * (u[i, j] + u[i, j + 1])
                vtmp[i, j] = 0.5 * (v[i, j] + v[i + 1, j])
    if (ie + 1) == npx or ied >= (npx - npt):
        for j in range(max(npt, jsd), min(npy - npt, jed) + 1):
            for i in range(npx - npt + 1, ied + 1):
                utmp[i, j] = 0.5 * (u[i, j] + u[i, j + 1])
                vtmp[i, j] = 0.5 * (v[i, j] + v[i + 1, j])

    # contravariant at centers
    for j in range(js - 1 - id_, je + 1 + id_ + 1):
        for i in range(is_ - 1 - id_, ie + 1 + id_ + 1):
            ua[i, j] = ((utmp[i, j] - vtmp[i, j] * g["cosa_s"][i, j])
                        * g["rsin2"][i, j])
            va[i, j] = ((vtmp[i, j] - utmp[i, j] * g["cosa_s"][i, j])
                        * g["rsin2"][i, j])

    # A -> C: x-dir corner utmp fills (all 4 corners on-tile)
    for i in range(-2, 0 + 1):
        utmp[i, 0] = -vtmp[0, 1 - i]
    for i in range(0, 2 + 1):
        utmp[npx + i, 0] = vtmp[npx, i + 1]
    for i in range(0, 2 + 1):
        utmp[npx + i, npy] = -vtmp[npx, je - i]
    for i in range(-2, 0 + 1):
        utmp[i, npy] = vtmp[0, je + i]

    ifirst = max(3, is_ - 1)
    ilast = min(npx - 2, ie + 2)
    for j in range(js - 1, je + 1 + 1):
        for i in range(ifirst, ilast + 1):
            uc[i, j] = (A2 * (utmp[i - 2, j] + utmp[i + 1, j])
                        + A1 * (utmp[i - 1, j] + utmp[i, j]))
            ut[i, j] = ((uc[i, j] - v[i, j] * g["cosa_u"][i, j])
                        * g["rsin_u"][i, j])

    # ua corner fills
    ua[-1, 0] = -va[0, 2]
    ua[0, 0] = -va[0, 1]
    ua[npx, 0] = va[npx, 1]
    ua[npx + 1, 0] = va[npx, 2]
    ua[npx, npy] = -va[npx, npy - 1]
    ua[npx + 1, npy] = -va[npx, npy - 2]
    ua[-1, npy] = va[0, npy - 2]
    ua[0, npy] = va[0, npy - 1]

    # west edge
    for j in range(js - 1, je + 1 + 1):
        uc[0, j] = C1 * utmp[-2, j] + C2 * utmp[-1, j] + C3 * utmp[0, j]
        ut[1, j] = edge_interpolate4(
            [ua[-1, j], ua[0, j], ua[1, j], ua[2, j]],
            [g["dxa"][-1, j], g["dxa"][0, j], g["dxa"][1, j], g["dxa"][2, j]])
        if ut[1, j] > 0.0:
            uc[1, j] = ut[1, j] * sin_sg[2][0, j]
        else:
            uc[1, j] = ut[1, j] * sin_sg[0][1, j]
        uc[2, j] = C1 * utmp[3, j] + C2 * utmp[2, j] + C3 * utmp[1, j]
        ut[0, j] = ((uc[0, j] - v[0, j] * g["cosa_u"][0, j])
                    * g["rsin_u"][0, j])
        ut[2, j] = ((uc[2, j] - v[2, j] * g["cosa_u"][2, j])
                    * g["rsin_u"][2, j])
    # east edge
    for j in range(js - 1, je + 1 + 1):
        uc[npx - 1, j] = (C1 * utmp[npx - 3, j] + C2 * utmp[npx - 2, j]
                          + C3 * utmp[npx - 1, j])
        ut[npx, j] = edge_interpolate4(
            [ua[npx - 2, j], ua[npx - 1, j], ua[npx, j], ua[npx + 1, j]],
            [g["dxa"][npx - 2, j], g["dxa"][npx - 1, j],
             g["dxa"][npx, j], g["dxa"][npx + 1, j]])
        if ut[npx, j] > 0.0:
            uc[npx, j] = ut[npx, j] * sin_sg[2][npx - 1, j]
        else:
            uc[npx, j] = ut[npx, j] * sin_sg[0][npx, j]
        uc[npx + 1, j] = (C3 * utmp[npx, j] + C2 * utmp[npx + 1, j]
                          + C1 * utmp[npx + 2, j])
        ut[npx - 1, j] = ((uc[npx - 1, j] - v[npx - 1, j]
                           * g["cosa_u"][npx - 1, j])
                          * g["rsin_u"][npx - 1, j])
        ut[npx + 1, j] = ((uc[npx + 1, j] - v[npx + 1, j]
                           * g["cosa_u"][npx + 1, j])
                          * g["rsin_u"][npx + 1, j])

    # y-dir corner vtmp fills
    for j in range(-2, 0 + 1):
        vtmp[0, j] = -utmp[1 - j, 0]
    for j in range(0, 2 + 1):
        vtmp[0, npy + j] = utmp[j + 1, npy]
    for j in range(-2, 0 + 1):
        vtmp[npx, j] = utmp[ie + j, 0]
    for j in range(0, 2 + 1):
        vtmp[npx, npy + j] = -utmp[ie - j, npy]
    va[0, -1] = -ua[2, 0]
    va[0, 0] = -ua[1, 0]
    va[npx, 0] = ua[npx - 1, 0]
    va[npx, -1] = ua[npx - 2, 0]
    va[npx, npy] = -ua[npx - 1, npy]
    va[npx, npy + 1] = -ua[npx - 2, npy]
    va[0, npy] = ua[1, npy]
    va[0, npy + 1] = ua[2, npy]

    for j in range(js - 1, je + 2 + 1):
        if j == 1:
            for i in range(is_ - 1, ie + 1 + 1):
                vt[i, j] = edge_interpolate4(
                    [va[i, -1], va[i, 0], va[i, 1], va[i, 2]],
                    [g["dya"][i, -1], g["dya"][i, 0], g["dya"][i, 1],
                     g["dya"][i, 2]])
                if vt[i, j] > 0.0:
                    vc[i, j] = vt[i, j] * sin_sg[3][i, j - 1]
                else:
                    vc[i, j] = vt[i, j] * sin_sg[1][i, j]
        elif j == 0 or j == (npy - 1):
            for i in range(is_ - 1, ie + 1 + 1):
                vc[i, j] = (C1 * vtmp[i, j - 2] + C2 * vtmp[i, j - 1]
                            + C3 * vtmp[i, j])
                vt[i, j] = ((vc[i, j] - u[i, j] * g["cosa_v"][i, j])
                            * g["rsin_v"][i, j])
        elif j == 2 or j == (npy + 1):
            for i in range(is_ - 1, ie + 1 + 1):
                vc[i, j] = (C1 * vtmp[i, j + 1] + C2 * vtmp[i, j]
                            + C3 * vtmp[i, j - 1])
                vt[i, j] = ((vc[i, j] - u[i, j] * g["cosa_v"][i, j])
                            * g["rsin_v"][i, j])
        elif j == npy:
            for i in range(is_ - 1, ie + 1 + 1):
                vt[i, j] = edge_interpolate4(
                    [va[i, j - 2], va[i, j - 1], va[i, j], va[i, j + 1]],
                    [g["dya"][i, j - 2], g["dya"][i, j - 1], g["dya"][i, j],
                     g["dya"][i, j + 1]])
                if vt[i, j] > 0.0:
                    vc[i, j] = vt[i, j] * sin_sg[3][i, j - 1]
                else:
                    vc[i, j] = vt[i, j] * sin_sg[1][i, j]
        else:
            for i in range(is_ - 1, ie + 1 + 1):
                vc[i, j] = (A2 * (vtmp[i, j - 2] + vtmp[i, j + 1])
                            + A1 * (vtmp[i, j - 1] + vtmp[i, j]))
                vt[i, j] = ((vc[i, j] - u[i, j] * g["cosa_v"][i, j])
                            * g["rsin_v"][i, j])

    return ua, va, uc, vc, ut, vt


def divergence_corner_ref(u, v, ua, va, g, npx, bounds):
    npy = npx
    is_, ie, js, je, isd, ied, jsd, jed = bounds
    sin_sg = g["sin_sg"]
    cos_sg = g["cos_sg"]
    uf = FA2(is_ - 2, ie + 2, js - 1, je + 2)
    vf = FA2(is_ - 1, ie + 2, js - 2, je + 2)
    divg_d = FA2(isd, ied + 1, jsd, jed + 1, BIG)
    is2 = max(2, is_)
    ie1 = min(npx - 1, ie + 1)

    for j in range(js, je + 1 + 1):
        if j == 1 or j == npy:
            for i in range(is_ - 1, ie + 1 + 1):
                uf[i, j] = (u[i, j] * g["dyc"][i, j] * 0.5
                            * (sin_sg[3][i, j - 1] + sin_sg[1][i, j]))
        else:
            for i in range(is_ - 1, ie + 1 + 1):
                uf[i, j] = ((u[i, j] - 0.25 * (va[i, j - 1] + va[i, j])
                             * (cos_sg[3][i, j - 1] + cos_sg[1][i, j]))
                            * g["dyc"][i, j] * 0.5
                            * (sin_sg[3][i, j - 1] + sin_sg[1][i, j]))
    for j in range(js - 1, je + 1 + 1):
        for i in range(is2, ie1 + 1):
            vf[i, j] = ((v[i, j] - 0.25 * (ua[i - 1, j] + ua[i, j])
                         * (cos_sg[2][i - 1, j] + cos_sg[0][i, j]))
                        * g["dxc"][i, j] * 0.5
                        * (sin_sg[2][i - 1, j] + sin_sg[0][i, j]))
        if is_ == 1:
            vf[1, j] = (v[1, j] * g["dxc"][1, j] * 0.5
                        * (sin_sg[2][0, j] + sin_sg[0][1, j]))
        if (ie + 1) == npx:
            vf[npx, j] = (v[npx, j] * g["dxc"][npx, j] * 0.5
                          * (sin_sg[2][npx - 1, j] + sin_sg[0][npx, j]))
    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            divg_d[i, j] = (vf[i, j - 1] - vf[i, j]
                            + uf[i - 1, j] - uf[i, j])
    divg_d[1, 1] = divg_d[1, 1] - vf[1, 0]
    divg_d[npx, 1] = divg_d[npx, 1] - vf[npx, 0]
    divg_d[npx, npy] = divg_d[npx, npy] + vf[npx, npy]
    divg_d[1, npy] = divg_d[1, npy] + vf[1, npy]
    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            divg_d[i, j] = g["rarea_c"][i, j] * divg_d[i, j]
    return divg_d


def c_sw_ref(delp, pt, w, u, v, g, npx, dt2, hydrostatic=True, nord=1):
    """Full c_sw (sw_core.F90:79). Inputs FA2 (delp/pt/w modified in place
    by the corner fills, as in the reference). Returns dict of FA2."""
    npy = npx
    is_, ie = 1, npx - 1
    js, je = 1, npy - 1
    isd, ied = is_ - 3, ie + 3
    jsd, jed = js - 3, je + 3
    bounds = (is_, ie, js, je, isd, ied, jsd, jed)
    iep1, jep1 = ie + 1, je + 1
    sin_sg = g["sin_sg"]
    cos_sg = g["cos_sg"]

    ua, va, uc, vc, ut, vt = d2a2c_vect_ref(u, v, g, npx, bounds)
    divg_d = (divergence_corner_ref(u, v, ua, va, g, npx, bounds)
              if nord > 0 else None)

    # keep the pre-update C winds for the wind update below (the reference
    # updates uc/vc in place at the END; our transcription copies first)
    uc0 = FA2(uc.li, uc.hi, uc.lj, uc.hj)
    uc0.a[:, :] = uc.a
    vc0 = FA2(vc.li, vc.hi, vc.lj, vc.hj)
    vc0.a[:, :] = vc.a

    ut_s = FA2(ut.li, ut.hi, ut.lj, ut.hj, BIG)
    vt_s = FA2(vt.li, vt.hi, vt.lj, vt.hj, BIG)
    for j in range(js - 1, jep1 + 1):
        for i in range(is_ - 1, iep1 + 1 + 1):
            if ut[i, j] > 0.0:
                ut_s[i, j] = dt2 * ut[i, j] * g["dy"][i, j] * sin_sg[2][i - 1, j]
            else:
                ut_s[i, j] = dt2 * ut[i, j] * g["dy"][i, j] * sin_sg[0][i, j]
    for j in range(js - 1, je + 2 + 1):
        for i in range(is_ - 1, iep1 + 1):
            if vt[i, j] > 0.0:
                vt_s[i, j] = dt2 * vt[i, j] * g["dx"][i, j] * sin_sg[3][i, j - 1]
            else:
                vt_s[i, j] = dt2 * vt[i, j] * g["dx"][i, j] * sin_sg[1][i, j]

    fx = FA2(is_ - 1, ie + 2, js - 1, je + 1)
    fx1 = FA2(is_ - 1, ie + 2, js - 1, je + 1)
    fx2 = FA2(is_ - 1, ie + 2, js - 1, je + 1)
    fy = FA2(is_ - 1, ie + 1, js - 1, je + 2)
    fy1 = FA2(is_ - 1, ie + 1, js - 1, je + 2)
    fy2 = FA2(is_ - 1, ie + 1, js - 1, je + 2)
    delpc = FA2(isd, ied, jsd, jed, BIG)
    ptc = FA2(isd, ied, jsd, jed, BIG)
    wc = FA2(isd, ied, jsd, jed, BIG)

    # x transport
    fill2_4corners(delp, pt, 1, npx, npy)
    if hydrostatic:
        for j in range(js - 1, jep1 + 1):
            for i in range(is_ - 1, ie + 2 + 1):
                if ut_s[i, j] > 0.0:
                    fx1[i, j] = delp[i - 1, j]
                    fx[i, j] = pt[i - 1, j]
                else:
                    fx1[i, j] = delp[i, j]
                    fx[i, j] = pt[i, j]
                fx1[i, j] = ut_s[i, j] * fx1[i, j]
                fx[i, j] = fx1[i, j] * fx[i, j]
    else:
        fill_4corners(w, 1, npx, npy)
        for j in range(js - 1, je + 1 + 1):
            for i in range(is_ - 1, ie + 2 + 1):
                if ut_s[i, j] > 0.0:
                    fx1[i, j] = delp[i - 1, j]
                    fx[i, j] = pt[i - 1, j]
                    fx2[i, j] = w[i - 1, j]
                else:
                    fx1[i, j] = delp[i, j]
                    fx[i, j] = pt[i, j]
                    fx2[i, j] = w[i, j]
                fx1[i, j] = ut_s[i, j] * fx1[i, j]
                fx[i, j] = fx1[i, j] * fx[i, j]
                fx2[i, j] = fx1[i, j] * fx2[i, j]

    # y transport
    fill2_4corners(delp, pt, 2, npx, npy)
    if hydrostatic:
        for j in range(js - 1, jep1 + 1 + 1):
            for i in range(is_ - 1, iep1 + 1):
                if vt_s[i, j] > 0.0:
                    fy1[i, j] = delp[i, j - 1]
                    fy[i, j] = pt[i, j - 1]
                else:
                    fy1[i, j] = delp[i, j]
                    fy[i, j] = pt[i, j]
                fy1[i, j] = vt_s[i, j] * fy1[i, j]
                fy[i, j] = fy1[i, j] * fy[i, j]
        for j in range(js - 1, jep1 + 1):
            for i in range(is_ - 1, iep1 + 1):
                delpc[i, j] = delp[i, j] + (
                    fx1[i, j] - fx1[i + 1, j] + fy1[i, j] - fy1[i, j + 1]
                ) * g["rarea"][i, j]
                ptc[i, j] = (pt[i, j] * delp[i, j] + (
                    fx[i, j] - fx[i + 1, j] + fy[i, j] - fy[i, j + 1]
                ) * g["rarea"][i, j]) / delpc[i, j]
    else:
        fill_4corners(w, 2, npx, npy)
        for j in range(js - 1, je + 2 + 1):
            for i in range(is_ - 1, ie + 1 + 1):
                if vt_s[i, j] > 0.0:
                    fy1[i, j] = delp[i, j - 1]
                    fy[i, j] = pt[i, j - 1]
                    fy2[i, j] = w[i, j - 1]
                else:
                    fy1[i, j] = delp[i, j]
                    fy[i, j] = pt[i, j]
                    fy2[i, j] = w[i, j]
                fy1[i, j] = vt_s[i, j] * fy1[i, j]
                fy[i, j] = fy1[i, j] * fy[i, j]
                fy2[i, j] = fy1[i, j] * fy2[i, j]
        for j in range(js - 1, je + 1 + 1):
            for i in range(is_ - 1, ie + 1 + 1):
                delpc[i, j] = delp[i, j] + (
                    fx1[i, j] - fx1[i + 1, j] + fy1[i, j] - fy1[i, j + 1]
                ) * g["rarea"][i, j]
                ptc[i, j] = (pt[i, j] * delp[i, j] + (
                    fx[i, j] - fx[i + 1, j] + fy[i, j] - fy[i, j + 1]
                ) * g["rarea"][i, j]) / delpc[i, j]
                wc[i, j] = (w[i, j] * delp[i, j] + (
                    fx2[i, j] - fx2[i + 1, j] + fy2[i, j] - fy2[i, j + 1]
                ) * g["rarea"][i, j]) / delpc[i, j]

    # KE (cube branch)
    ke = FA2(is_ - 1, ie + 1, js - 1, je + 1)
    vort = FA2(is_ - 1, ie + 1, js - 1, je + 1)
    for j in range(js - 1, jep1 + 1):
        for i in range(is_ - 1, iep1 + 1):
            if ua[i, j] > 0.0:
                if i == 1:
                    ke[1, j] = (uc0[1, j] * sin_sg[0][1, j]
                                + v[1, j] * cos_sg[0][1, j])
                elif i == npx:
                    ke[i, j] = (uc0[npx, j] * sin_sg[0][npx, j]
                                + v[npx, j] * cos_sg[0][npx, j])
                else:
                    ke[i, j] = uc0[i, j]
            else:
                if i == 0:
                    ke[0, j] = (uc0[1, j] * sin_sg[2][0, j]
                                + v[1, j] * cos_sg[2][0, j])
                elif i == (npx - 1):
                    ke[i, j] = (uc0[npx, j] * sin_sg[2][npx - 1, j]
                                + v[npx, j] * cos_sg[2][npx - 1, j])
                else:
                    ke[i, j] = uc0[i + 1, j]
    for j in range(js - 1, jep1 + 1):
        for i in range(is_ - 1, iep1 + 1):
            if va[i, j] > 0.0:
                if j == 1:
                    vort[i, 1] = (vc0[i, 1] * sin_sg[1][i, 1]
                                  + u[i, 1] * cos_sg[1][i, 1])
                elif j == npy:
                    vort[i, j] = (vc0[i, npy] * sin_sg[1][i, npy]
                                  + u[i, npy] * cos_sg[1][i, npy])
                else:
                    vort[i, j] = vc0[i, j]
            else:
                if j == 0:
                    vort[i, 0] = (vc0[i, 1] * sin_sg[3][i, 0]
                                  + u[i, 1] * cos_sg[3][i, 0])
                elif j == (npy - 1):
                    vort[i, j] = (vc0[i, npy] * sin_sg[3][i, npy - 1]
                                  + u[i, npy] * cos_sg[3][i, npy - 1])
                else:
                    vort[i, j] = vc0[i, j + 1]
    dt4 = 0.5 * dt2
    for j in range(js - 1, jep1 + 1):
        for i in range(is_ - 1, iep1 + 1):
            ke[i, j] = dt4 * (ua[i, j] * ke[i, j] + va[i, j] * vort[i, j])

    # circulation -> absolute vorticity on corners
    fxc = FA2(is_, ie + 1, js - 1, je + 1)
    fyc = FA2(is_ - 1, ie + 1, js, je + 1)
    for j in range(js - 1, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            fxc[i, j] = uc0[i, j] * g["dxc"][i, j]
    for j in range(js, je + 1 + 1):
        for i in range(is_ - 1, ie + 1 + 1):
            fyc[i, j] = vc0[i, j] * g["dyc"][i, j]
    vortc = FA2(is_, ie + 1, js, je + 1)
    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            vortc[i, j] = (fxc[i, j - 1] - fxc[i, j]
                           - fyc[i - 1, j] + fyc[i, j])
    vortc[1, 1] = vortc[1, 1] + fyc[0, 1]
    vortc[npx, 1] = vortc[npx, 1] - fyc[npx, 1]
    vortc[npx, npy] = vortc[npx, npy] - fyc[npx, npy]
    vortc[1, npy] = vortc[1, npy] + fyc[0, npy]
    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            vortc[i, j] = g["fC"][i, j] + g["rarea_c"][i, j] * vortc[i, j]

    # transport absolute vorticity + wind update (cube branch)
    fy1w = FA2(is_, ie + 1, js, je)
    fyw = FA2(is_, ie + 1, js, je)
    fx1w = FA2(is_, ie, js, je + 1)
    fxw = FA2(is_, ie, js, je + 1)
    for j in range(js, je + 1):
        for i in range(is_, iep1 + 1):
            if i == 1 or i == npx:
                fy1w[i, j] = dt2 * v[i, j]
            else:
                fy1w[i, j] = dt2 * (v[i, j] - uc0[i, j] * g["cosa_u"][i, j]) \
                    / g["sina_u"][i, j]
            if fy1w[i, j] > 0.0:
                fyw[i, j] = vortc[i, j]
            else:
                fyw[i, j] = vortc[i, j + 1]
    for j in range(js, jep1 + 1):
        if j == 1 or j == npy:
            for i in range(is_, ie + 1):
                fx1w[i, j] = dt2 * u[i, j]
                if fx1w[i, j] > 0.0:
                    fxw[i, j] = vortc[i, j]
                else:
                    fxw[i, j] = vortc[i + 1, j]
        else:
            for i in range(is_, ie + 1):
                fx1w[i, j] = dt2 * (u[i, j] - vc0[i, j] * g["cosa_v"][i, j]) \
                    / g["sina_v"][i, j]
                if fx1w[i, j] > 0.0:
                    fxw[i, j] = vortc[i, j]
                else:
                    fxw[i, j] = vortc[i + 1, j]

    uc_new = FA2(uc.li, uc.hi, uc.lj, uc.hj, BIG)
    vc_new = FA2(vc.li, vc.hi, vc.lj, vc.hj, BIG)
    for j in range(js, je + 1):
        for i in range(is_, iep1 + 1):
            uc_new[i, j] = (uc0[i, j] + fy1w[i, j] * fyw[i, j]
                            + g["rdxc"][i, j] * (ke[i - 1, j] - ke[i, j]))
    for j in range(js, jep1 + 1):
        for i in range(is_, ie + 1):
            vc_new[i, j] = (vc0[i, j] - fx1w[i, j] * fxw[i, j]
                            + g["rdyc"][i, j] * (ke[i, j - 1] - ke[i, j]))

    return dict(delpc=delpc, ptc=ptc, wc=wc, uc=uc_new, vc=vc_new,
                ua=ua, va=va, ut=ut, vt=vt, divg_d=divg_d, ke=ke)
