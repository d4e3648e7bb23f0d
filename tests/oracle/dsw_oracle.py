"""Loop-literal NumPy oracle for the d_sw kinetic-energy stage.

Transcribed statement-for-statement from /root/reference/model/sw_core.F90:
  KE-flux section of d_sw :1077-1228 (vb/ub B-grid contravariant builds,
  their PPM self-advection, corner KE fixes),
  xtp_u:2154-2524, ytp_v:2524-3000, pert_ppm (tp_core.F90:1206).
Full-tile cube path: grid_type 0, bounded_domain=.false., all corners
on-tile. Pins the vectorized ke_section (ops/sw_core.py) at 1e-12 f64."""
import numpy as np

from .csw_oracle import FA2, BIG

P1, P2 = 7.0 / 12.0, -1.0 / 12.0
C1, C2, C3 = -2.0 / 14.0, 11.0 / 14.0, 5.0 / 14.0
S11, S14, S15 = 11.0 / 14.0, 4.0 / 7.0, 3.0 / 14.0
R3 = 1.0 / 3.0
R12 = 1.0 / 12.0
NEAR_ZERO = 1.0e-25


def _pert_ppm_point(a0, al, ar, iv):
    """pert_ppm (tp_core.F90:1206) on scalars; returns (al, ar)."""
    if iv == 0:
        if a0 <= 0.0:
            return 0.0, 0.0
        a4 = -3.0 * (ar + al)
        da1 = ar - al
        if abs(da1) < -a4:
            fmin = a0 + 0.25 / a4 * da1 ** 2 + a4 * R12
            if fmin < 0.0:
                if ar > 0.0 and al > 0.0:
                    return 0.0, 0.0
                elif da1 > 0.0:
                    return al, -2.0 * al
                else:
                    return -2.0 * ar, ar
        return al, ar
    if al * ar < 0.0:
        da1 = al - ar
        da2 = da1 ** 2
        a6da = 3.0 * (al + ar) * da1
        if a6da < -da2:
            return al, -2.0 * al
        elif a6da > da2:
            return -2.0 * ar, ar
        return al, ar
    return 0.0, 0.0


def xtp_u_ref(c, u, dx, rdx, iord, npx, bounds, lim_fac=1.0):
    """sw_core.F90 xtp_u:2154 (cube path). c: FA2 courant (is:ie+1, js:je+1)
    in DISTANCE form (the reference's c); u/dx/rdx FA2 y-wall arrays.
    Returns flux FA2(is:ie+1, js:je+1)."""
    npy = npx
    is_, ie, js, je = bounds
    flux = FA2(is_, ie + 1, js, je + 1, BIG)
    is3 = max(3, is_ - 1)
    ie3 = min(npx - 3, ie + 1)

    if iord < 8:
        for j in range(js, je + 1 + 1):
            al = {}
            bl = {}
            br = {}
            b0 = {}
            smt5 = {}
            smt6 = {}
            for i in range(is3, ie3 + 1 + 1):
                al[i] = (P1 * (u[i - 1, j] + u[i, j])
                         + P2 * (u[i - 2, j] + u[i + 1, j]))
            for i in range(is3, ie3 + 1):
                bl[i] = al[i] - u[i, j]
                br[i] = al[i + 1] - u[i, j]
            # cube edges
            if is_ == 1:
                xt = C3 * u[1, j] + C2 * u[2, j] + C1 * u[3, j]
                br[1] = xt - u[1, j]
                bl[2] = xt - u[2, j]
                br[2] = al[3] - u[2, j]
                if j == 1 or j == npy:
                    bl[0] = 0.0
                    br[0] = 0.0
                    bl[1] = 0.0
                    br[1] = 0.0
                else:
                    bl[0] = (C1 * u[-2, j] + C2 * u[-1, j] + C3 * u[0, j]
                             - u[0, j])
                    xt = 0.5 * (
                        ((2. * dx[0, j] + dx[-1, j]) * u[0, j]
                         - dx[0, j] * u[-1, j]) / (dx[0, j] + dx[-1, j])
                        + ((2. * dx[1, j] + dx[2, j]) * u[1, j]
                           - dx[1, j] * u[2, j]) / (dx[1, j] + dx[2, j]))
                    br[0] = xt - u[0, j]
                    bl[1] = xt - u[1, j]
            if (ie + 1) == npx:
                bl[npx - 2] = al[npx - 2] - u[npx - 2, j]
                xt = (C1 * u[npx - 3, j] + C2 * u[npx - 2, j]
                      + C3 * u[npx - 1, j])
                br[npx - 2] = xt - u[npx - 2, j]
                bl[npx - 1] = xt - u[npx - 1, j]
                if j == 1 or j == npy:
                    bl[npx - 1] = 0.0
                    br[npx - 1] = 0.0
                    bl[npx] = 0.0
                    br[npx] = 0.0
                else:
                    xt = 0.5 * (
                        ((2. * dx[npx - 1, j] + dx[npx - 2, j]) * u[npx - 1, j]
                         - dx[npx - 1, j] * u[npx - 2, j])
                        / (dx[npx - 1, j] + dx[npx - 2, j])
                        + ((2. * dx[npx, j] + dx[npx + 1, j]) * u[npx, j]
                           - dx[npx, j] * u[npx + 1, j])
                        / (dx[npx, j] + dx[npx + 1, j]))
                    br[npx - 1] = xt - u[npx - 1, j]
                    bl[npx] = xt - u[npx, j]
                    br[npx] = (C3 * u[npx, j] + C2 * u[npx + 1, j]
                               + C1 * u[npx + 2, j] - u[npx, j])
            for i in range(is_ - 1, ie + 1 + 1):
                b0[i] = bl[i] + br[i]

            if iord == 1:
                for i in range(is_ - 1, ie + 1 + 1):
                    smt5[i] = abs(lim_fac * b0[i]) < abs(bl[i] - br[i])
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdx[i - 1, j]
                        fx0 = (1. - cfl) * (br[i - 1] - cfl * b0[i - 1])
                        flux[i, j] = u[i - 1, j]
                    else:
                        cfl = c[i, j] * rdx[i, j]
                        fx0 = (1. + cfl) * (bl[i] + cfl * b0[i])
                        flux[i, j] = u[i, j]
                    if smt5[i - 1] or smt5[i]:
                        flux[i, j] = flux[i, j] + fx0
            elif iord == 2:
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdx[i - 1, j]
                        flux[i, j] = u[i - 1, j] + (1. - cfl) * (
                            br[i - 1] - cfl * b0[i - 1])
                    else:
                        cfl = c[i, j] * rdx[i, j]
                        flux[i, j] = u[i, j] + (1. + cfl) * (
                            bl[i] + cfl * b0[i])
            elif iord == 3:
                for i in range(is_ - 1, ie + 1 + 1):
                    x0 = abs(b0[i])
                    x1 = abs(bl[i] - br[i])
                    smt5[i] = x0 < x1
                    smt6[i] = 3. * x0 < x1
                for i in range(is_, ie + 1 + 1):
                    fx0 = 0.0
                    hi5 = smt5[i - 1] and smt5[i]
                    hi6 = smt6[i - 1] or smt6[i]
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdx[i - 1, j]
                        if hi6:
                            fx0 = br[i - 1] - cfl * b0[i - 1]
                        elif hi5:
                            fx0 = np.sign(br[i - 1]) * min(abs(bl[i - 1]),
                                                           abs(br[i - 1]))
                        flux[i, j] = u[i - 1, j] + (1. - cfl) * fx0
                    else:
                        cfl = c[i, j] * rdx[i, j]
                        if hi6:
                            fx0 = bl[i] + cfl * b0[i]
                        elif hi5:
                            fx0 = np.sign(bl[i]) * min(abs(bl[i]), abs(br[i]))
                        flux[i, j] = u[i, j] + (1. + cfl) * fx0
            elif iord == 4:
                for i in range(is_ - 1, ie + 1 + 1):
                    x0 = abs(b0[i])
                    x1 = abs(bl[i] - br[i])
                    smt5[i] = x0 < x1
                    smt6[i] = 3. * x0 < x1
                for i in range(is_, ie + 1 + 1):
                    hi6 = smt6[i - 1] or smt6[i]
                    hi5 = (smt5[i - 1] and smt5[i]) or hi6
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdx[i - 1, j]
                        fx0 = (1. - cfl) * (br[i - 1] - cfl * b0[i - 1])
                        flux[i, j] = u[i - 1, j]
                    else:
                        cfl = c[i, j] * rdx[i, j]
                        fx0 = (1. + cfl) * (bl[i] + cfl * b0[i])
                        flux[i, j] = u[i, j]
                    if hi5:
                        flux[i, j] = flux[i, j] + fx0
            else:  # iord 5, 6, 7
                if iord == 5:
                    for i in range(is_ - 1, ie + 1 + 1):
                        smt5[i] = bl[i] * br[i] < 0.0
                else:
                    for i in range(is_ - 1, ie + 1 + 1):
                        smt5[i] = 3. * abs(b0[i]) < abs(bl[i] - br[i])
                    if is_ == 1:
                        smt5[0] = bl[0] * br[0] < 0.0
                        smt5[1] = bl[1] * br[1] < 0.0
                    if (ie + 1) == npx:
                        smt5[npx - 1] = bl[npx - 1] * br[npx - 1] < 0.0
                        smt5[npx] = bl[npx] * br[npx] < 0.0
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdx[i - 1, j]
                        fx0 = (1. - cfl) * (br[i - 1] - cfl * b0[i - 1])
                        flux[i, j] = u[i - 1, j]
                    else:
                        cfl = c[i, j] * rdx[i, j]
                        fx0 = (1. + cfl) * (bl[i] + cfl * b0[i])
                        flux[i, j] = u[i, j]
                    if smt5[i - 1] or smt5[i]:
                        flux[i, j] = flux[i, j] + fx0
        return flux

    # iord = 8, 9, 10, 11
    for j in range(js, je + 1 + 1):
        dm = {}
        dq = {}
        al = {}
        bl = {}
        br = {}
        for i in range(is_ - 2, ie + 2 + 1):
            xt = 0.25 * (u[i + 1, j] - u[i - 1, j])
            dm[i] = np.sign(xt) * min(
                abs(xt), max(u[i - 1, j], u[i, j], u[i + 1, j]) - u[i, j],
                u[i, j] - min(u[i - 1, j], u[i, j], u[i + 1, j]))
        for i in range(is_ - 3, ie + 2 + 1):
            dq[i] = u[i + 1, j] - u[i, j]
        for i in range(is3, ie3 + 1 + 1):
            al[i] = 0.5 * (u[i - 1, j] + u[i, j]) + R3 * (dm[i - 1] - dm[i])
        if iord == 8:
            for i in range(is3, ie3 + 1):
                xt = 2. * dm[i]
                bl[i] = -np.sign(xt) * min(abs(xt), abs(al[i] - u[i, j]))
                br[i] = np.sign(xt) * min(abs(xt), abs(al[i + 1] - u[i, j]))
        elif iord == 9:
            for i in range(is3, ie3 + 1):
                pmp_1 = -2. * dq[i]
                lac_1 = pmp_1 + 1.5 * dq[i + 1]
                bl[i] = min(max(0., pmp_1, lac_1),
                            max(al[i] - u[i, j], min(0., pmp_1, lac_1)))
                pmp_2 = 2. * dq[i - 1]
                lac_2 = pmp_2 - 1.5 * dq[i - 2]
                br[i] = min(max(0., pmp_2, lac_2),
                            max(al[i + 1] - u[i, j], min(0., pmp_2, lac_2)))
        elif iord == 10:
            for i in range(is3, ie3 + 1):
                bl[i] = al[i] - u[i, j]
                br[i] = al[i + 1] - u[i, j]
                if abs(dm[i]) < NEAR_ZERO:
                    if abs(dm[i - 1]) + abs(dm[i + 1]) < NEAR_ZERO:
                        bl[i] = 0.0
                        br[i] = 0.0
                elif abs(3. * (bl[i] + br[i])) > abs(bl[i] - br[i]):
                    pmp_1 = -2. * dq[i]
                    lac_1 = pmp_1 + 1.5 * dq[i + 1]
                    bl[i] = min(max(0., pmp_1, lac_1),
                                max(bl[i], min(0., pmp_1, lac_1)))
                    pmp_2 = 2. * dq[i - 1]
                    lac_2 = pmp_2 - 1.5 * dq[i - 2]
                    br[i] = min(max(0., pmp_2, lac_2),
                                max(br[i], min(0., pmp_2, lac_2)))
        else:  # 11
            for i in range(is3, ie3 + 1):
                bl[i] = al[i] - u[i, j]
                br[i] = al[i + 1] - u[i, j]
        # edges
        if is_ == 1:
            br[2] = al[3] - u[2, j]
            xt = S15 * u[1, j] + S11 * u[2, j] - S14 * dm[2]
            bl[2] = xt - u[2, j]
            br[1] = xt - u[1, j]
            if j == 1 or j == npy:
                bl[0] = 0.0
                br[0] = 0.0
                bl[1] = 0.0
                br[1] = 0.0
            else:
                bl[0] = S14 * dm[-1] - S11 * dq[-1]
                x0L = 0.5 * ((2. * dx[0, j] + dx[-1, j]) * u[0, j]
                             - dx[0, j] * u[-1, j]) / (dx[0, j] + dx[-1, j])
                x0R = 0.5 * ((2. * dx[1, j] + dx[2, j]) * u[1, j]
                             - dx[1, j] * u[2, j]) / (dx[1, j] + dx[2, j])
                xt = x0L + x0R
                br[0] = xt - u[0, j]
                bl[1] = xt - u[1, j]
            bl[2], br[2] = _pert_ppm_point(u[2, j], bl[2], br[2], -1)
        if (ie + 1) == npx:
            bl[npx - 2] = al[npx - 2] - u[npx - 2, j]
            xt = (S15 * u[npx - 1, j] + S11 * u[npx - 2, j]
                  + S14 * dm[npx - 2])
            br[npx - 2] = xt - u[npx - 2, j]
            bl[npx - 1] = xt - u[npx - 1, j]
            if j == 1 or j == npy:
                bl[npx - 1] = 0.0
                br[npx - 1] = 0.0
                bl[npx] = 0.0
                br[npx] = 0.0
            else:
                br[npx] = S11 * dq[npx] - S14 * dm[npx + 1]
                x0L = 0.5 * ((2. * dx[npx - 1, j] + dx[npx - 2, j])
                             * u[npx - 1, j] - dx[npx - 1, j]
                             * u[npx - 2, j]) / (dx[npx - 1, j]
                                                 + dx[npx - 2, j])
                x0R = 0.5 * ((2. * dx[npx, j] + dx[npx + 1, j]) * u[npx, j]
                             - dx[npx, j] * u[npx + 1, j]) / (
                                 dx[npx, j] + dx[npx + 1, j])
                xt = x0L + x0R
                br[npx - 1] = xt - u[npx - 1, j]
                bl[npx] = xt - u[npx, j]
            bl[npx - 2], br[npx - 2] = _pert_ppm_point(
                u[npx - 2, j], bl[npx - 2], br[npx - 2], -1)

        for i in range(is_, ie + 1 + 1):
            if c[i, j] > 0.0:
                cfl = c[i, j] * rdx[i - 1, j]
                flux[i, j] = u[i - 1, j] + (1. - cfl) * (
                    br[i - 1] - cfl * (bl[i - 1] + br[i - 1]))
            else:
                cfl = c[i, j] * rdx[i, j]
                flux[i, j] = u[i, j] + (1. + cfl) * (
                    bl[i] + cfl * (bl[i] + br[i]))
    return flux


def ytp_v_ref(c, v, dy, rdy, jord, npx, bounds, lim_fac=1.0):
    """sw_core.F90 ytp_v:2524 (cube path). Returns flux FA2."""
    npy = npx
    is_, ie, js, je = bounds
    flux = FA2(is_, ie + 1, js, je + 1, BIG)
    js3 = max(3, js - 1)
    je3 = min(npy - 3, je + 1)

    if jord < 8:
        al = FA2(is_, ie + 1, js - 1, je + 2)
        bl = FA2(is_, ie + 1, js - 1, je + 1)
        br = FA2(is_, ie + 1, js - 1, je + 1)
        b0 = FA2(is_, ie + 1, js - 1, je + 1)
        smt5 = FA2(is_, ie + 1, js - 1, je + 1)
        smt6 = FA2(is_, ie + 1, js - 1, je + 1)
        for j in range(js3, je3 + 1 + 1):
            for i in range(is_, ie + 1 + 1):
                al[i, j] = (P1 * (v[i, j - 1] + v[i, j])
                            + P2 * (v[i, j - 2] + v[i, j + 1]))
        for j in range(js3, je3 + 1):
            for i in range(is_, ie + 1 + 1):
                bl[i, j] = al[i, j] - v[i, j]
                br[i, j] = al[i, j + 1] - v[i, j]
        if js == 1:
            for i in range(is_, ie + 1 + 1):
                bl[i, 0] = (C1 * v[i, -2] + C2 * v[i, -1] + C3 * v[i, 0]
                            - v[i, 0])
                xt = 0.5 * (
                    ((2. * dy[i, 0] + dy[i, -1]) * v[i, 0]
                     - dy[i, 0] * v[i, -1]) / (dy[i, 0] + dy[i, -1])
                    + ((2. * dy[i, 1] + dy[i, 2]) * v[i, 1]
                       - dy[i, 1] * v[i, 2]) / (dy[i, 1] + dy[i, 2]))
                br[i, 0] = xt - v[i, 0]
                bl[i, 1] = xt - v[i, 1]
                xt = C3 * v[i, 1] + C2 * v[i, 2] + C1 * v[i, 3]
                br[i, 1] = xt - v[i, 1]
                bl[i, 2] = xt - v[i, 2]
                br[i, 2] = al[i, 3] - v[i, 2]
            if is_ == 1:
                bl[1, 0] = 0.0
                br[1, 0] = 0.0
                bl[1, 1] = 0.0
                br[1, 1] = 0.0
            if (ie + 1) == npx:
                bl[npx, 0] = 0.0
                br[npx, 0] = 0.0
                bl[npx, 1] = 0.0
                br[npx, 1] = 0.0
        if (je + 1) == npy:
            for i in range(is_, ie + 1 + 1):
                bl[i, npy - 2] = al[i, npy - 2] - v[i, npy - 2]
                xt = (C1 * v[i, npy - 3] + C2 * v[i, npy - 2]
                      + C3 * v[i, npy - 1])
                br[i, npy - 2] = xt - v[i, npy - 2]
                bl[i, npy - 1] = xt - v[i, npy - 1]
                xt = 0.5 * (
                    ((2. * dy[i, npy - 1] + dy[i, npy - 2]) * v[i, npy - 1]
                     - dy[i, npy - 1] * v[i, npy - 2])
                    / (dy[i, npy - 1] + dy[i, npy - 2])
                    + ((2. * dy[i, npy] + dy[i, npy + 1]) * v[i, npy]
                       - dy[i, npy] * v[i, npy + 1])
                    / (dy[i, npy] + dy[i, npy + 1]))
                br[i, npy - 1] = xt - v[i, npy - 1]
                bl[i, npy] = xt - v[i, npy]
                br[i, npy] = (C3 * v[i, npy] + C2 * v[i, npy + 1]
                              + C1 * v[i, npy + 2] - v[i, npy])
            if is_ == 1:
                bl[1, npy - 1] = 0.0
                br[1, npy - 1] = 0.0
                bl[1, npy] = 0.0
                br[1, npy] = 0.0
            if (ie + 1) == npx:
                bl[npx, npy - 1] = 0.0
                br[npx, npy - 1] = 0.0
                bl[npx, npy] = 0.0
                br[npx, npy] = 0.0
        for j in range(js - 1, je + 1 + 1):
            for i in range(is_, ie + 1 + 1):
                b0[i, j] = bl[i, j] + br[i, j]

        if jord == 1:
            for j in range(js - 1, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    smt5[i, j] = (abs(lim_fac * b0[i, j])
                                  < abs(bl[i, j] - br[i, j]))
            for j in range(js, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdy[i, j - 1]
                        fx0 = (1. - cfl) * (br[i, j - 1] - cfl * b0[i, j - 1])
                        flux[i, j] = v[i, j - 1]
                    else:
                        cfl = c[i, j] * rdy[i, j]
                        fx0 = (1. + cfl) * (bl[i, j] + cfl * b0[i, j])
                        flux[i, j] = v[i, j]
                    if smt5[i, j - 1] or smt5[i, j]:
                        flux[i, j] = flux[i, j] + fx0
        elif jord == 2:
            for j in range(js, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdy[i, j - 1]
                        flux[i, j] = v[i, j - 1] + (1. - cfl) * (
                            br[i, j - 1] - cfl * b0[i, j - 1])
                    else:
                        cfl = c[i, j] * rdy[i, j]
                        flux[i, j] = v[i, j] + (1. + cfl) * (
                            bl[i, j] + cfl * b0[i, j])
        elif jord in (3, 4):
            for j in range(js - 1, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    x0 = abs(b0[i, j])
                    x1 = abs(bl[i, j] - br[i, j])
                    smt5[i, j] = x0 < x1
                    smt6[i, j] = 3. * x0 < x1
            for j in range(js, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    if jord == 3:
                        fx0 = 0.0
                        hi5 = smt5[i, j - 1] and smt5[i, j]
                        hi6 = smt6[i, j - 1] or smt6[i, j]
                        if c[i, j] > 0.0:
                            cfl = c[i, j] * rdy[i, j - 1]
                            if hi6:
                                fx0 = br[i, j - 1] - cfl * b0[i, j - 1]
                            elif hi5:
                                fx0 = np.sign(br[i, j - 1]) * min(
                                    abs(bl[i, j - 1]), abs(br[i, j - 1]))
                            flux[i, j] = v[i, j - 1] + (1. - cfl) * fx0
                        else:
                            cfl = c[i, j] * rdy[i, j]
                            if hi6:
                                fx0 = bl[i, j] + cfl * b0[i, j]
                            elif hi5:
                                fx0 = np.sign(bl[i, j]) * min(
                                    abs(bl[i, j]), abs(br[i, j]))
                            flux[i, j] = v[i, j] + (1. + cfl) * fx0
                    else:
                        hi6 = smt6[i, j - 1] or smt6[i, j]
                        hi5 = (smt5[i, j - 1] and smt5[i, j]) or hi6
                        if c[i, j] > 0.0:
                            cfl = c[i, j] * rdy[i, j - 1]
                            fx0 = (1. - cfl) * (br[i, j - 1]
                                                - cfl * b0[i, j - 1])
                            flux[i, j] = v[i, j - 1]
                        else:
                            cfl = c[i, j] * rdy[i, j]
                            fx0 = (1. + cfl) * (bl[i, j] + cfl * b0[i, j])
                            flux[i, j] = v[i, j]
                        if hi5:
                            flux[i, j] = flux[i, j] + fx0
        elif jord == 5:
            for j in range(js - 1, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    smt5[i, j] = bl[i, j] * br[i, j] < 0.0
            for j in range(js, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdy[i, j - 1]
                        fx0 = (1. - cfl) * (br[i, j - 1] - cfl * b0[i, j - 1])
                        flux[i, j] = v[i, j - 1]
                    else:
                        cfl = c[i, j] * rdy[i, j]
                        fx0 = (1. + cfl) * (bl[i, j] + cfl * b0[i, j])
                        flux[i, j] = v[i, j]
                    if smt5[i, j - 1] or smt5[i, j]:
                        flux[i, j] = flux[i, j] + fx0
        else:  # jord 6, 7
            for j in range(js - 1, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    smt6[i, j] = (3. * abs(b0[i, j])
                                  < abs(bl[i, j] - br[i, j]))
            if js == 1:
                for i in range(is_, ie + 1 + 1):
                    smt6[i, 0] = bl[i, 0] * br[i, 0] < 0.0
                    smt6[i, 1] = bl[i, 1] * br[i, 1] < 0.0
            if (je + 1) == npy:
                for i in range(is_, ie + 1 + 1):
                    smt6[i, npy - 1] = bl[i, npy - 1] * br[i, npy - 1] < 0.0
                    smt6[i, npy] = bl[i, npy] * br[i, npy] < 0.0
            for j in range(js, je + 1 + 1):
                for i in range(is_, ie + 1 + 1):
                    if c[i, j] > 0.0:
                        cfl = c[i, j] * rdy[i, j - 1]
                        fx0 = (1. - cfl) * (br[i, j - 1] - cfl * b0[i, j - 1])
                        flux[i, j] = v[i, j - 1]
                    else:
                        cfl = c[i, j] * rdy[i, j]
                        fx0 = (1. + cfl) * (bl[i, j] + cfl * b0[i, j])
                        flux[i, j] = v[i, j]
                    if smt6[i, j - 1] or smt6[i, j]:
                        flux[i, j] = flux[i, j] + fx0
        return flux

    # jord = 8, 9, 10, 11
    dm = FA2(is_, ie + 1, js - 2, je + 2)
    dq = FA2(is_, ie + 1, js - 3, je + 2)
    al = FA2(is_, ie + 1, js - 1, je + 2)
    bl = FA2(is_, ie + 1, js - 1, je + 1)
    br = FA2(is_, ie + 1, js - 1, je + 1)
    for j in range(js - 2, je + 2 + 1):
        for i in range(is_, ie + 1 + 1):
            xt = 0.25 * (v[i, j + 1] - v[i, j - 1])
            dm[i, j] = np.sign(xt) * min(
                abs(xt), max(v[i, j - 1], v[i, j], v[i, j + 1]) - v[i, j],
                v[i, j] - min(v[i, j - 1], v[i, j], v[i, j + 1]))
    for j in range(js - 3, je + 2 + 1):
        for i in range(is_, ie + 1 + 1):
            dq[i, j] = v[i, j + 1] - v[i, j]
    for j in range(js3, je3 + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            al[i, j] = (0.5 * (v[i, j - 1] + v[i, j])
                        + R3 * (dm[i, j - 1] - dm[i, j]))
    if jord == 8:
        for j in range(js3, je3 + 1):
            for i in range(is_, ie + 1 + 1):
                xt = 2. * dm[i, j]
                bl[i, j] = -np.sign(xt) * min(abs(xt),
                                              abs(al[i, j] - v[i, j]))
                br[i, j] = np.sign(xt) * min(abs(xt),
                                             abs(al[i, j + 1] - v[i, j]))
    elif jord == 9:
        for j in range(js3, je3 + 1):
            for i in range(is_, ie + 1 + 1):
                pmp_1 = -2. * dq[i, j]
                lac_1 = pmp_1 + 1.5 * dq[i, j + 1]
                bl[i, j] = min(max(0., pmp_1, lac_1),
                               max(al[i, j] - v[i, j],
                                   min(0., pmp_1, lac_1)))
                pmp_2 = 2. * dq[i, j - 1]
                lac_2 = pmp_2 - 1.5 * dq[i, j - 2]
                br[i, j] = min(max(0., pmp_2, lac_2),
                               max(al[i, j + 1] - v[i, j],
                                   min(0., pmp_2, lac_2)))
    elif jord == 10:
        for j in range(js3, je3 + 1):
            for i in range(is_, ie + 1 + 1):
                bl[i, j] = al[i, j] - v[i, j]
                br[i, j] = al[i, j + 1] - v[i, j]
                if abs(dm[i, j]) < NEAR_ZERO:
                    if abs(dm[i, j - 1]) + abs(dm[i, j + 1]) < NEAR_ZERO:
                        bl[i, j] = 0.0
                        br[i, j] = 0.0
                elif abs(3. * (bl[i, j] + br[i, j])) > abs(bl[i, j]
                                                           - br[i, j]):
                    pmp_1 = -2. * dq[i, j]
                    lac_1 = pmp_1 + 1.5 * dq[i, j + 1]
                    bl[i, j] = min(max(0., pmp_1, lac_1),
                                   max(bl[i, j], min(0., pmp_1, lac_1)))
                    pmp_2 = 2. * dq[i, j - 1]
                    lac_2 = pmp_2 - 1.5 * dq[i, j - 2]
                    br[i, j] = min(max(0., pmp_2, lac_2),
                                   max(br[i, j], min(0., pmp_2, lac_2)))
    else:  # 11
        for j in range(js3, je3 + 1):
            for i in range(is_, ie + 1 + 1):
                bl[i, j] = al[i, j] - v[i, j]
                br[i, j] = al[i, j + 1] - v[i, j]
    # edges
    if js == 1:
        for i in range(is_, ie + 1 + 1):
            br[i, 2] = al[i, 3] - v[i, 2]
            xt = S15 * v[i, 1] + S11 * v[i, 2] - S14 * dm[i, 2]
            br[i, 1] = xt - v[i, 1]
            bl[i, 2] = xt - v[i, 2]
            bl[i, 0] = S14 * dm[i, -1] - S11 * dq[i, -1]
            x0L = 0.5 * ((2. * dy[i, 0] + dy[i, -1]) * v[i, 0]
                         - dy[i, 0] * v[i, -1]) / (dy[i, 0] + dy[i, -1])
            x0R = 0.5 * ((2. * dy[i, 1] + dy[i, 2]) * v[i, 1]
                         - dy[i, 1] * v[i, 2]) / (dy[i, 1] + dy[i, 2])
            xt = x0L + x0R
            bl[i, 1] = xt - v[i, 1]
            br[i, 0] = xt - v[i, 0]
        if is_ == 1:
            bl[1, 0] = 0.0
            br[1, 0] = 0.0
            bl[1, 1] = 0.0
            br[1, 1] = 0.0
        if (ie + 1) == npx:
            bl[npx, 0] = 0.0
            br[npx, 0] = 0.0
            bl[npx, 1] = 0.0
            br[npx, 1] = 0.0
        for i in range(is_, ie + 1 + 1):
            bl[i, 2], br[i, 2] = _pert_ppm_point(v[i, 2], bl[i, 2],
                                                 br[i, 2], -1)
    if (je + 1) == npy:
        for i in range(is_, ie + 1 + 1):
            bl[i, npy - 2] = al[i, npy - 2] - v[i, npy - 2]
            xt = (S15 * v[i, npy - 1] + S11 * v[i, npy - 2]
                  + S14 * dm[i, npy - 2])
            br[i, npy - 2] = xt - v[i, npy - 2]
            bl[i, npy - 1] = xt - v[i, npy - 1]
            br[i, npy] = S11 * dq[i, npy] - S14 * dm[i, npy + 1]
            x0L = 0.5 * ((2. * dy[i, npy - 1] + dy[i, npy - 2])
                         * v[i, npy - 1] - dy[i, npy - 1]
                         * v[i, npy - 2]) / (dy[i, npy - 1]
                                             + dy[i, npy - 2])
            x0R = 0.5 * ((2. * dy[i, npy] + dy[i, npy + 1]) * v[i, npy]
                         - dy[i, npy] * v[i, npy + 1]) / (
                             dy[i, npy] + dy[i, npy + 1])
            xt = x0L + x0R
            br[i, npy - 1] = xt - v[i, npy - 1]
            bl[i, npy] = xt - v[i, npy]
        if is_ == 1:
            bl[1, npy - 1] = 0.0
            br[1, npy - 1] = 0.0
            bl[1, npy] = 0.0
            br[1, npy] = 0.0
        if (ie + 1) == npx:
            bl[npx, npy - 1] = 0.0
            br[npx, npy - 1] = 0.0
            bl[npx, npy] = 0.0
            br[npx, npy] = 0.0
        for i in range(is_, ie + 1 + 1):
            bl[i, npy - 2], br[i, npy - 2] = _pert_ppm_point(
                v[i, npy - 2], bl[i, npy - 2], br[i, npy - 2], -1)

    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            if c[i, j] > 0.0:
                cfl = c[i, j] * rdy[i, j - 1]
                flux[i, j] = v[i, j - 1] + (1. - cfl) * (
                    br[i, j - 1] - cfl * (bl[i, j - 1] + br[i, j - 1]))
            else:
                cfl = c[i, j] * rdy[i, j]
                flux[i, j] = v[i, j] + (1. + cfl) * (
                    bl[i, j] + cfl * (bl[i, j] + br[i, j]))
    return flux


def ke_stage_ref(u, v, uc, vc, ut, vt, g, npx, dt, hord_mt, lim_fac=1.0):
    """d_sw KE-flux stage (sw_core.F90:1077-1228), cube path. u/v D winds,
    uc/vc C winds, ut/vt contravariant C winds — all FA2. Returns ke FA2
    on corners (is:ie+1, js:je+1)."""
    npy = npx
    is_, ie = 1, npx - 1
    js, je = 1, npy - 1
    is2, ie1 = max(2, is_), min(npx - 1, ie + 1)
    js2, je1 = max(2, js), min(npy - 1, je + 1)
    dt5 = 0.5 * dt
    dt4 = 0.25 * dt
    cosa = g["cosa"]
    rsina = g["rsina"]

    vb = FA2(is_, ie + 1, js, je + 1, BIG)
    ub = FA2(is_, ie + 1, js, je + 1, BIG)
    ke = FA2(is_, ie + 1, js, je + 1, BIG)

    # vb
    for i in range(is_, ie + 1 + 1):
        vb[i, 1] = dt5 * (vt[i - 1, 1] + vt[i, 1])
    for j in range(js2, je1 + 1):
        for i in range(is2, ie1 + 1):
            vb[i, j] = dt5 * (vc[i - 1, j] + vc[i, j]
                              - (uc[i, j - 1] + uc[i, j]) * cosa[i, j]) \
                * rsina[i, j]
        vb[1, j] = dt4 * (-vt[-1, j] + 3. * (vt[0, j] + vt[1, j])
                          - vt[2, j])
        vb[npx, j] = dt4 * (-vt[npx - 2, j]
                            + 3. * (vt[npx - 1, j] + vt[npx, j])
                            - vt[npx + 1, j])
    for i in range(is_, ie + 1 + 1):
        vb[i, npy] = dt5 * (vt[i - 1, npy] + vt[i, npy])

    ub_flux = ytp_v_ref(vb, v, g["dy"], g["rdy"], hord_mt, npx,
                        (is_, ie, js, je), lim_fac)
    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            ke[i, j] = vb[i, j] * ub_flux[i, j]

    # ub
    for j in range(js, je + 1 + 1):
        ub[1, j] = dt5 * (ut[1, j - 1] + ut[1, j])
    for j in range(js, je + 1 + 1):
        if j == 1 or j == npy:
            for i in range(is2, ie1 + 1):
                ub[i, j] = dt4 * (-ut[i, j - 2]
                                  + 3. * (ut[i, j - 1] + ut[i, j])
                                  - ut[i, j + 1])
        else:
            for i in range(is2, ie1 + 1):
                ub[i, j] = dt5 * (uc[i, j - 1] + uc[i, j]
                                  - (vc[i - 1, j] + vc[i, j]) * cosa[i, j]) \
                    * rsina[i, j]
    for j in range(js, je + 1 + 1):
        ub[npx, j] = dt5 * (ut[npx, j - 1] + ut[npx, j])

    vb_flux = xtp_u_ref(ub, u, g["dx"], g["rdx"], hord_mt, npx,
                        (is_, ie, js, je), lim_fac)
    for j in range(js, je + 1 + 1):
        for i in range(is_, ie + 1 + 1):
            ke[i, j] = 0.5 * (ke[i, j] + ub[i, j] * vb_flux[i, j])

    # corner fixes
    dt6 = dt / 6.0
    ke[1, 1] = dt6 * ((ut[1, 1] + ut[1, 0]) * u[1, 1]
                      + (vt[1, 1] + vt[0, 1]) * v[1, 1]
                      + (ut[1, 1] + vt[1, 1]) * u[0, 1])
    i = npx
    ke[i, 1] = dt6 * ((ut[i, 1] + ut[i, 0]) * u[i - 1, 1]
                      + (vt[i, 1] + vt[i - 1, 1]) * v[i, 1]
                      + (ut[i, 1] - vt[i - 1, 1]) * u[i, 1])
    i, j = npx, npy
    ke[i, j] = dt6 * ((ut[i, j] + ut[i, j - 1]) * u[i - 1, j]
                      + (vt[i, j] + vt[i - 1, j]) * v[i, j - 1]
                      + (ut[i, j - 1] + vt[i - 1, j]) * u[i, j])
    j = npy
    ke[1, j] = dt6 * ((ut[1, j] + ut[1, j - 1]) * u[1, j]
                      + (vt[1, j] + vt[0, j]) * v[1, j - 1]
                      + (ut[1, j - 1] - vt[1, j]) * u[0, j])
    return ke
