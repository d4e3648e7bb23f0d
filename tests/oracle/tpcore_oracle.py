"""Loop-literal NumPy oracle for the 1-D PPM flux operator.

Transcribed statement-for-statement from /root/reference/model/tp_core.F90
xppm:324-713 (scheme constants :35-71, pert_ppm:1206) with the full-face
cube-tile index ranges: is=1, ie=npx-1, bounded_domain=.false., grid_type=0.
This is deliberately slow scalar code — its only job is to be an
independent statement of the limiter branches for tests to diff the
vectorized JAX kernels against (1e-12 f64)."""
import numpy as np

from .fidx import FA

# tp_core.F90:35-71
PPM_FAC = 1.5
R3 = 1.0 / 3.0
NEAR_ZERO = 1.0e-25
R12 = 1.0 / 12.0
S11, S14, S15 = 11.0 / 14.0, 4.0 / 7.0, 3.0 / 14.0
C1, C2, C3 = -2.0 / 14.0, 11.0 / 14.0, 5.0 / 14.0
P1, P2 = 7.0 / 12.0, -1.0 / 12.0


def pert_ppm(im, a0, al, ar, iv, lo):
    """tp_core.F90 pert_ppm:1206; operates on al/ar (FA) starting at
    Fortran index `lo`, im elements; a0 likewise."""
    if iv == 0:
        for i in range(lo, lo + im):
            if a0[i] <= 0.0:
                al[i] = 0.0
                ar[i] = 0.0
            else:
                a4 = -3.0 * (ar[i] + al[i])
                da1 = ar[i] - al[i]
                if abs(da1) < -a4:
                    fmin = a0[i] + 0.25 / a4 * da1 ** 2 + a4 * R12
                    if fmin < 0.0:
                        if ar[i] > 0.0 and al[i] > 0.0:
                            ar[i] = 0.0
                            al[i] = 0.0
                        elif da1 > 0.0:
                            ar[i] = -2.0 * al[i]
                        else:
                            al[i] = -2.0 * ar[i]
    else:
        for i in range(lo, lo + im):
            if al[i] * ar[i] < 0.0:
                da1 = al[i] - ar[i]
                da2 = da1 ** 2
                a6da = 3.0 * (al[i] + ar[i]) * da1
                if a6da < -da2:
                    ar[i] = -2.0 * al[i]
                elif a6da > da2:
                    al[i] = -2.0 * ar[i]
            else:
                al[i] = 0.0
                ar[i] = 0.0


def xppm_row(q_row, c_row, dxa_row, iord, lim_fac=1.0, edges=True):
    """One row of xppm. Repo layout in, repo layout out:
      q_row, dxa_row: numpy [n+6] padded cells (repo cell c at index c+3,
        c in [-3, n+3)); Fortran cell i = c+1 in [isd, ied] = [-2, n+3).
      c_row: numpy [n+1] wall Courant numbers (repo wall w = Fortran i-1).
    Returns flux numpy [n+1]."""
    n = len(q_row) - 6
    npx = n + 1
    is_, ie = 1, npx - 1
    isd, ied = is_ - 3, ie + 3
    bounded_domain = not edges
    grid_type = 0

    q1 = FA.from_np(q_row, isd)
    c = FA.from_np(c_row, is_)
    dxa = FA.from_np(dxa_row, isd)
    flux = FA(is_, ie + 1)

    if (not bounded_domain) and grid_type < 3:
        is1 = max(3, is_ - 1)
        ie3 = min(npx - 2, ie + 2)
        ie1 = min(npx - 3, ie + 1)
    else:
        is1 = is_ - 1
        ie3 = ie + 2
        ie1 = ie + 1

    mord = abs(iord)

    al = FA(is_ - 1, ie + 2)
    bl = FA(is_ - 1, ie + 1)
    br = FA(is_ - 1, ie + 1)
    b0 = FA(is_ - 1, ie + 1)
    a4 = FA(is_ - 1, ie + 1)
    da1 = FA(is_ - 1, ie + 1)
    dm = FA(is_ - 2, ie + 2)
    dq = FA(is_ - 3, ie + 2)
    smt5 = FA(is_ - 1, ie + 1)
    smt6 = FA(is_ - 1, ie + 1)
    ext5 = FA(is_ - 1, ie + 1)
    ext6 = FA(is_ - 1, ie + 1)

    if iord < 7:
        for i in range(is1, ie3 + 1):
            al[i] = P1 * (q1[i - 1] + q1[i]) + P2 * (q1[i - 2] + q1[i + 1])

        if (not bounded_domain) and grid_type < 3:
            if is_ == 1:
                al[0] = C1 * q1[-2] + C2 * q1[-1] + C3 * q1[0]
                al[1] = 0.5 * (
                    ((2. * dxa[0] + dxa[-1]) * q1[0] - dxa[0] * q1[-1])
                    / (dxa[-1] + dxa[0])
                    + ((2. * dxa[1] + dxa[2]) * q1[1] - dxa[1] * q1[2])
                    / (dxa[1] + dxa[2]))
                al[2] = C3 * q1[1] + C2 * q1[2] + C1 * q1[3]
            if ie + 1 == npx:
                al[npx - 1] = (C1 * q1[npx - 3] + C2 * q1[npx - 2]
                               + C3 * q1[npx - 1])
                al[npx] = 0.5 * (
                    ((2. * dxa[npx - 1] + dxa[npx - 2]) * q1[npx - 1]
                     - dxa[npx - 1] * q1[npx - 2])
                    / (dxa[npx - 2] + dxa[npx - 1])
                    + ((2. * dxa[npx] + dxa[npx + 1]) * q1[npx]
                       - dxa[npx] * q1[npx + 1])
                    / (dxa[npx] + dxa[npx + 1]))
                al[npx + 1] = C3 * q1[npx] + C2 * q1[npx + 1] + C1 * q1[npx + 2]

        if iord < 0:
            for i in range(is_ - 1, ie + 2 + 1):
                al[i] = max(0.0, al[i])

        if mord == 1:
            for i in range(is_ - 1, ie + 2):
                bl[i] = al[i] - q1[i]
                br[i] = al[i + 1] - q1[i]
                b0[i] = bl[i] + br[i]
                smt5[i] = abs(lim_fac * b0[i]) < abs(bl[i] - br[i])
            for i in range(is_, ie + 2):
                if c[i] > 0.0:
                    fx1 = (1. - c[i]) * (br[i - 1] - c[i] * b0[i - 1])
                    flux[i] = q1[i - 1]
                else:
                    fx1 = (1. + c[i]) * (bl[i] + c[i] * b0[i])
                    flux[i] = q1[i]
                if smt5[i - 1] or smt5[i]:
                    flux[i] = flux[i] + fx1
        elif mord == 2:
            for i in range(is_, ie + 2):
                xt = c[i]
                if xt > 0.0:
                    qtmp = q1[i - 1]
                    flux[i] = qtmp + (1. - xt) * (
                        al[i] - qtmp - xt * (al[i - 1] + al[i] - (qtmp + qtmp)))
                else:
                    qtmp = q1[i]
                    flux[i] = qtmp + (1. + xt) * (
                        al[i] - qtmp + xt * (al[i] + al[i + 1] - (qtmp + qtmp)))
        elif mord == 3:
            for i in range(is_ - 1, ie + 2):
                bl[i] = al[i] - q1[i]
                br[i] = al[i + 1] - q1[i]
                b0[i] = bl[i] + br[i]
                x0 = abs(b0[i])
                xt = abs(bl[i] - br[i])
                smt5[i] = x0 < xt
                smt6[i] = 3. * x0 < xt
            for i in range(is_, ie + 2):
                if c[i] > 0.0:
                    if smt5[i - 1] or smt6[i]:
                        flux[i] = q1[i - 1] + (1. - c[i]) * (
                            br[i - 1] - c[i] * b0[i - 1])
                    else:
                        flux[i] = q1[i - 1]
                else:
                    if smt6[i - 1] or smt5[i]:
                        flux[i] = q1[i] + (1. + c[i]) * (bl[i] + c[i] * b0[i])
                    else:
                        flux[i] = q1[i]
        elif mord == 4:
            for i in range(is_ - 1, ie + 2):
                bl[i] = al[i] - q1[i]
                br[i] = al[i + 1] - q1[i]
                b0[i] = bl[i] + br[i]
                x0 = abs(b0[i])
                xt = abs(bl[i] - br[i])
                smt5[i] = x0 < xt
                smt6[i] = 3. * x0 < xt
            for i in range(is_, ie + 2):
                hi6 = smt6[i - 1] or smt6[i]
                hi5 = (smt5[i - 1] and smt5[i]) or hi6
                if c[i] > 0.0:
                    fx1 = (1. - c[i]) * (br[i - 1] - c[i] * b0[i - 1])
                    flux[i] = q1[i - 1]
                else:
                    fx1 = (1. + c[i]) * (bl[i] + c[i] * b0[i])
                    flux[i] = q1[i]
                if hi5:
                    flux[i] = flux[i] + fx1
        else:   # mord 5, 6
            if iord == 5:
                for i in range(is_ - 1, ie + 2):
                    bl[i] = al[i] - q1[i]
                    br[i] = al[i + 1] - q1[i]
                    b0[i] = bl[i] + br[i]
                    smt5[i] = bl[i] * br[i] < 0.0
            elif iord == -5:
                for i in range(is_ - 1, ie + 2):
                    bl[i] = al[i] - q1[i]
                    br[i] = al[i + 1] - q1[i]
                    b0[i] = bl[i] + br[i]
                    smt5[i] = bl[i] * br[i] < 0.0
                    da1[i] = br[i] - bl[i]
                    a4[i] = -3. * b0[i]
                for i in range(is_ - 1, ie + 2):
                    if abs(da1[i]) < -a4[i]:
                        if q1[i] + 0.25 / a4[i] * da1[i] ** 2 + a4[i] * R12 < 0.0:
                            if not smt5[i]:
                                br[i] = 0.0
                                bl[i] = 0.0
                                b0[i] = 0.0
                            elif da1[i] > 0.0:
                                br[i] = -2. * bl[i]
                                b0[i] = -bl[i]
                            else:
                                bl[i] = -2. * br[i]
                                b0[i] = -br[i]
            else:
                for i in range(is_ - 1, ie + 2):
                    bl[i] = al[i] - q1[i]
                    br[i] = al[i + 1] - q1[i]
                    b0[i] = bl[i] + br[i]
                    smt5[i] = 3. * abs(b0[i]) < abs(bl[i] - br[i])
            if (not bounded_domain) and grid_type < 3:
                if is_ == 1:
                    smt5[0] = bl[0] * br[0] < 0.0
                    smt5[1] = bl[1] * br[1] < 0.0
                if ie + 1 == npx:
                    smt5[npx - 1] = bl[npx - 1] * br[npx - 1] < 0.0
                    smt5[npx] = bl[npx] * br[npx] < 0.0
            for i in range(is_, ie + 2):
                if c[i] > 0.0:
                    fx1 = (1. - c[i]) * (br[i - 1] - c[i] * b0[i - 1])
                    flux[i] = q1[i - 1]
                else:
                    fx1 = (1. + c[i]) * (bl[i] + c[i] * b0[i])
                    flux[i] = q1[i]
                if smt5[i - 1] or smt5[i]:
                    flux[i] = flux[i] + fx1
        return flux.to_np(is_, ie + 1)

    # ---- iord >= 7: monotone / positive-definite families ----------------
    for i in range(is_ - 2, ie + 2 + 1):
        xt = 0.25 * (q1[i + 1] - q1[i - 1])
        dm[i] = np.sign(xt) * min(abs(xt),
                                  max(q1[i - 1], q1[i], q1[i + 1]) - q1[i],
                                  q1[i] - min(q1[i - 1], q1[i], q1[i + 1]))
    for i in range(is1, ie1 + 1 + 1):
        al[i] = 0.5 * (q1[i - 1] + q1[i]) + R3 * (dm[i - 1] - dm[i])

    if iord == 8:
        for i in range(is1, ie1 + 1):
            xt = 2. * dm[i]
            bl[i] = -np.sign(xt) * min(abs(xt), abs(al[i] - q1[i]))
            br[i] = np.sign(xt) * min(abs(xt), abs(al[i + 1] - q1[i]))
    elif iord == 10:
        for i in range(is1 - 2, ie1 + 1 + 1):
            dq[i] = 2. * (q1[i + 1] - q1[i])
        for i in range(is1, ie1 + 1):
            bl[i] = al[i] - q1[i]
            br[i] = al[i + 1] - q1[i]
            if abs(dm[i - 1]) + abs(dm[i]) + abs(dm[i + 1]) < NEAR_ZERO:
                bl[i] = 0.0
                br[i] = 0.0
            elif abs(3. * (bl[i] + br[i])) > abs(bl[i] - br[i]):
                pmp_2 = dq[i - 1]
                lac_2 = pmp_2 - 0.75 * dq[i - 2]
                br[i] = min(max(0., pmp_2, lac_2),
                            max(br[i], min(0., pmp_2, lac_2)))
                pmp_1 = -dq[i]
                lac_1 = pmp_1 + 0.75 * dq[i + 1]
                bl[i] = min(max(0., pmp_1, lac_1),
                            max(bl[i], min(0., pmp_1, lac_1)))
    elif iord == 11:
        for i in range(is1, ie1 + 1):
            xt = PPM_FAC * dm[i]
            bl[i] = -np.sign(xt) * min(abs(xt), abs(al[i] - q1[i]))
            br[i] = np.sign(xt) * min(abs(xt), abs(al[i + 1] - q1[i]))
    elif iord == 7 or iord == 12:
        for i in range(is1, ie1 + 1):
            bl[i] = al[i] - q1[i]
            br[i] = al[i + 1] - q1[i]
            a4[i] = -3. * (bl[i] + br[i])
            da1[i] = br[i] - bl[i]
            ext5[i] = br[i] * bl[i] > 0.0
            ext6[i] = abs(da1[i]) < -a4[i]
        for i in range(is1, ie1 + 1):
            if ext6[i]:
                if q1[i] + 0.25 / a4[i] * da1[i] ** 2 + a4[i] * R12 < 0.0:
                    if ext5[i]:
                        br[i] = 0.0
                        bl[i] = 0.0
                    elif da1[i] > 0.0:
                        br[i] = -2. * bl[i]
                    else:
                        bl[i] = -2. * br[i]
    else:
        for i in range(is1, ie1 + 1):
            bl[i] = al[i] - q1[i]
            br[i] = al[i + 1] - q1[i]

    if iord == 9 or iord == 13:
        q_sub = FA(is1, ie1)
        for i in range(is1, ie1 + 1):
            q_sub[i] = q1[i]
        pert_ppm(ie1 - is1 + 1, q_sub, bl, br, 0, is1)

    if (not bounded_domain) and grid_type < 3:
        if is_ == 1:
            bl[0] = S14 * dm[-1] + S11 * (q1[-1] - q1[0])
            xt = 0.5 * (
                ((2. * dxa[0] + dxa[-1]) * q1[0] - dxa[0] * q1[-1])
                / (dxa[-1] + dxa[0])
                + ((2. * dxa[1] + dxa[2]) * q1[1] - dxa[1] * q1[2])
                / (dxa[1] + dxa[2]))
            xt = max(xt, min(q1[-1], q1[0], q1[1], q1[2]))
            xt = min(xt, max(q1[-1], q1[0], q1[1], q1[2]))
            br[0] = xt - q1[0]
            bl[1] = xt - q1[1]
            xt = S15 * q1[1] + S11 * q1[2] - S14 * dm[2]
            br[1] = xt - q1[1]
            bl[2] = xt - q1[2]
            br[2] = al[3] - q1[2]
            q_sub = FA(0, 2)
            for i in range(0, 3):
                q_sub[i] = q1[i]
            pert_ppm(3, q_sub, bl, br, 1, 0)
        if ie + 1 == npx:
            bl[npx - 2] = al[npx - 2] - q1[npx - 2]
            xt = S15 * q1[npx - 1] + S11 * q1[npx - 2] + S14 * dm[npx - 2]
            br[npx - 2] = xt - q1[npx - 2]
            bl[npx - 1] = xt - q1[npx - 1]
            xt = 0.5 * (
                ((2. * dxa[npx - 1] + dxa[npx - 2]) * q1[npx - 1]
                 - dxa[npx - 1] * q1[npx - 2])
                / (dxa[npx - 2] + dxa[npx - 1])
                + ((2. * dxa[npx] + dxa[npx + 1]) * q1[npx]
                   - dxa[npx] * q1[npx + 1])
                / (dxa[npx] + dxa[npx + 1]))
            xt = max(xt, min(q1[npx - 2], q1[npx - 1], q1[npx], q1[npx + 1]))
            xt = min(xt, max(q1[npx - 2], q1[npx - 1], q1[npx], q1[npx + 1]))
            br[npx - 1] = xt - q1[npx - 1]
            bl[npx] = xt - q1[npx]
            br[npx] = S11 * (q1[npx + 1] - q1[npx]) - S14 * dm[npx + 1]
            q_sub = FA(npx - 2, npx)
            for i in range(npx - 2, npx + 1):
                q_sub[i] = q1[i]
            pert_ppm(3, q_sub, bl, br, 1, npx - 2)

    if iord == 7:
        for i in range(is_ - 1, ie + 2):
            b0[i] = bl[i] + br[i]
            smt5[i] = bl[i] * br[i] < 0.0
        for i in range(is_, ie + 2):
            if c[i] > 0.0:
                fx1 = (1. - c[i]) * (br[i - 1] - c[i] * b0[i - 1])
                flux[i] = q1[i - 1]
            else:
                fx1 = (1. + c[i]) * (bl[i] + c[i] * b0[i])
                flux[i] = q1[i]
            if smt5[i - 1] or smt5[i]:
                flux[i] = flux[i] + fx1
    else:
        for i in range(is_, ie + 2):
            if c[i] > 0.0:
                flux[i] = q1[i - 1] + (1. - c[i]) * (
                    br[i - 1] - c[i] * (bl[i - 1] + br[i - 1]))
            else:
                flux[i] = q1[i] + (1. + c[i]) * (
                    bl[i] + c[i] * (bl[i] + br[i]))
    return flux.to_np(is_, ie + 1)


def yppm_col(q_col, c_col, dya_col, jord, lim_fac=1.0, edges=True):
    """One column of yppm, transcribed NATIVELY from tp_core.F90
    yppm:715-1152 (j-indexed loops; NOT derived from xppm_row, so a
    shared x/y transposition bug in the vectorized code stays visible).
      q_col, dya_col: numpy [n+6] padded cells along j (repo cell c at
        index c+3; Fortran cell j = c+1 in [jsd, jed]).
      c_col: numpy [n+1] wall Courant numbers (repo wall w = Fortran j-1).
    Returns flux numpy [n+1]."""
    n = len(q_col) - 6
    npy = n + 1
    js, je = 1, npy - 1
    jsd, jed = js - 3, je + 3
    bounded_domain = not edges
    grid_type = 0

    q1 = FA.from_np(q_col, jsd)
    c = FA.from_np(c_col, js)
    dya = FA.from_np(dya_col, jsd)
    flux = FA(js, je + 1)

    if (not bounded_domain) and grid_type < 3:
        js1 = max(3, js - 1)
        je3 = min(npy - 2, je + 2)
        je1 = min(npy - 3, je + 1)
    else:
        js1 = js - 1
        je3 = je + 2
        je1 = je + 1

    mord = abs(jord)

    al = FA(js - 1, je + 2)
    bl = FA(js - 1, je + 1)
    br = FA(js - 1, je + 1)
    b0 = FA(js - 1, je + 1)
    a4 = FA(js - 1, je + 1)
    xt1 = FA(js - 1, je + 1)
    dm = FA(js - 2, je + 2)
    dq = FA(js - 3, je + 2)
    smt5 = FA(js - 1, je + 1)
    smt6 = FA(js - 1, je + 1)
    hi5 = FA(js - 1, je + 1)
    hi6 = FA(js - 1, je + 1)

    if jord < 7:
        for j in range(js1, je3 + 1):
            al[j] = P1 * (q1[j - 1] + q1[j]) + P2 * (q1[j - 2] + q1[j + 1])

        if (not bounded_domain) and grid_type < 3:
            if js == 1:
                al[0] = C1 * q1[-2] + C2 * q1[-1] + C3 * q1[0]
                al[1] = 0.5 * (
                    ((2. * dya[0] + dya[-1]) * q1[0] - dya[0] * q1[-1])
                    / (dya[-1] + dya[0])
                    + ((2. * dya[1] + dya[2]) * q1[1] - dya[1] * q1[2])
                    / (dya[1] + dya[2]))
                al[2] = C3 * q1[1] + C2 * q1[2] + C1 * q1[3]
            if je + 1 == npy:
                al[npy - 1] = (C1 * q1[npy - 3] + C2 * q1[npy - 2]
                               + C3 * q1[npy - 1])
                al[npy] = 0.5 * (
                    ((2. * dya[npy - 1] + dya[npy - 2]) * q1[npy - 1]
                     - dya[npy - 1] * q1[npy - 2])
                    / (dya[npy - 2] + dya[npy - 1])
                    + ((2. * dya[npy] + dya[npy + 1]) * q1[npy]
                       - dya[npy] * q1[npy + 1])
                    / (dya[npy] + dya[npy + 1]))
                al[npy + 1] = C3 * q1[npy] + C2 * q1[npy + 1] + C1 * q1[npy + 2]

        if jord < 0:
            for j in range(js - 1, je + 2 + 1):
                al[j] = max(0.0, al[j])

        if mord == 1:
            for j in range(js - 1, je + 2):
                bl[j] = al[j] - q1[j]
                br[j] = al[j + 1] - q1[j]
                b0[j] = bl[j] + br[j]
                smt5[j] = abs(lim_fac * b0[j]) < abs(bl[j] - br[j])
            for j in range(js, je + 2):
                if c[j] > 0.0:
                    fx1 = (1. - c[j]) * (br[j - 1] - c[j] * b0[j - 1])
                    flux[j] = q1[j - 1]
                else:
                    fx1 = (1. + c[j]) * (bl[j] + c[j] * b0[j])
                    flux[j] = q1[j]
                if smt5[j - 1] or smt5[j]:
                    flux[j] = flux[j] + fx1
        elif mord == 2:
            for j in range(js, je + 2):
                xt = c[j]
                if xt > 0.0:
                    qtmp = q1[j - 1]
                    flux[j] = qtmp + (1. - xt) * (
                        al[j] - qtmp - xt * (al[j - 1] + al[j] - (qtmp + qtmp)))
                else:
                    qtmp = q1[j]
                    flux[j] = qtmp + (1. + xt) * (
                        al[j] - qtmp + xt * (al[j] + al[j + 1] - (qtmp + qtmp)))
        elif mord == 3:
            for j in range(js - 1, je + 2):
                bl[j] = al[j] - q1[j]
                br[j] = al[j + 1] - q1[j]
                b0[j] = bl[j] + br[j]
                x0 = abs(b0[j])
                xt = abs(bl[j] - br[j])
                smt5[j] = x0 < xt
                smt6[j] = 3. * x0 < xt
            for j in range(js, je + 2):
                if c[j] > 0.0:
                    if smt5[j - 1] or smt6[j]:
                        flux[j] = q1[j - 1] + (1. - c[j]) * (
                            br[j - 1] - c[j] * b0[j - 1])
                    else:
                        flux[j] = q1[j - 1]
                else:
                    if smt6[j - 1] or smt5[j]:
                        flux[j] = q1[j] + (1. + c[j]) * (bl[j] + c[j] * b0[j])
                    else:
                        flux[j] = q1[j]
        elif mord == 4:
            for j in range(js - 1, je + 2):
                bl[j] = al[j] - q1[j]
                br[j] = al[j + 1] - q1[j]
                b0[j] = bl[j] + br[j]
                x0 = abs(b0[j])
                xt = abs(bl[j] - br[j])
                smt5[j] = x0 < xt
                smt6[j] = 3. * x0 < xt
            for j in range(js, je + 2):
                h6 = smt6[j - 1] or smt6[j]
                h5 = (smt5[j - 1] and smt5[j]) or h6
                if c[j] > 0.0:
                    fx1 = (1. - c[j]) * (br[j - 1] - c[j] * b0[j - 1])
                    flux[j] = q1[j - 1]
                else:
                    fx1 = (1. + c[j]) * (bl[j] + c[j] * b0[j])
                    flux[j] = q1[j]
                if h5:
                    flux[j] = flux[j] + fx1
        else:  # mord 5, 6
            if jord == 5:
                for j in range(js - 1, je + 2):
                    bl[j] = al[j] - q1[j]
                    br[j] = al[j + 1] - q1[j]
                    b0[j] = bl[j] + br[j]
                    smt5[j] = bl[j] * br[j] < 0.0
            elif jord == -5:
                for j in range(js - 1, je + 2):
                    bl[j] = al[j] - q1[j]
                    br[j] = al[j + 1] - q1[j]
                    b0[j] = bl[j] + br[j]
                    xt1[j] = br[j] - bl[j]
                    a4[j] = -3. * b0[j]
                    smt5[j] = bl[j] * br[j] < 0.0
                for j in range(js - 1, je + 2):
                    if abs(xt1[j]) < -a4[j]:
                        if q1[j] + 0.25 / a4[j] * xt1[j] ** 2 + a4[j] * R12 < 0.0:
                            if not smt5[j]:
                                br[j] = 0.0
                                bl[j] = 0.0
                                b0[j] = 0.0
                            elif xt1[j] > 0.0:
                                br[j] = -2. * bl[j]
                                b0[j] = -bl[j]
                            else:
                                bl[j] = -2. * br[j]
                                b0[j] = -br[j]
            else:
                for j in range(js - 1, je + 2):
                    bl[j] = al[j] - q1[j]
                    br[j] = al[j + 1] - q1[j]
                    b0[j] = bl[j] + br[j]
                    smt5[j] = 3. * abs(b0[j]) < abs(bl[j] - br[j])
            if (not bounded_domain) and grid_type < 3:
                if js == 1:
                    smt5[0] = bl[0] * br[0] < 0.0
                    smt5[1] = bl[1] * br[1] < 0.0
                if je + 1 == npy:
                    smt5[npy - 1] = bl[npy - 1] * br[npy - 1] < 0.0
                    smt5[npy] = bl[npy] * br[npy] < 0.0
            for j in range(js, je + 2):
                if c[j] > 0.0:
                    fx1 = (1. - c[j]) * (br[j - 1] - c[j] * b0[j - 1])
                    flux[j] = q1[j - 1]
                else:
                    fx1 = (1. + c[j]) * (bl[j] + c[j] * b0[j])
                    flux[j] = q1[j]
                if smt5[j - 1] or smt5[j]:
                    flux[j] = flux[j] + fx1
        return flux.to_np(js, je + 1)

    # ---- jord >= 7: monotone / positive-definite families ----------------
    for j in range(js - 2, je + 2 + 1):
        xt = 0.25 * (q1[j + 1] - q1[j - 1])
        dm[j] = np.sign(xt) * min(abs(xt),
                                  max(q1[j - 1], q1[j], q1[j + 1]) - q1[j],
                                  q1[j] - min(q1[j - 1], q1[j], q1[j + 1]))
    for j in range(js1, je1 + 1 + 1):
        al[j] = 0.5 * (q1[j - 1] + q1[j]) + R3 * (dm[j - 1] - dm[j])

    if jord == 8:
        for j in range(js1, je1 + 1):
            xt = 2. * dm[j]
            bl[j] = -np.sign(xt) * min(abs(xt), abs(al[j] - q1[j]))
            br[j] = np.sign(xt) * min(abs(xt), abs(al[j + 1] - q1[j]))
    elif jord == 10:
        for j in range(js1 - 2, je1 + 1 + 1):
            dq[j] = 2. * (q1[j + 1] - q1[j])
        for j in range(js1, je1 + 1):
            bl[j] = al[j] - q1[j]
            br[j] = al[j + 1] - q1[j]
            if abs(dm[j - 1]) + abs(dm[j]) + abs(dm[j + 1]) < NEAR_ZERO:
                bl[j] = 0.0
                br[j] = 0.0
            elif abs(3. * (bl[j] + br[j])) > abs(bl[j] - br[j]):
                pmp_2 = dq[j - 1]
                lac_2 = pmp_2 - 0.75 * dq[j - 2]
                br[j] = min(max(0., pmp_2, lac_2),
                            max(br[j], min(0., pmp_2, lac_2)))
                pmp_1 = -dq[j]
                lac_1 = pmp_1 + 0.75 * dq[j + 1]
                bl[j] = min(max(0., pmp_1, lac_1),
                            max(bl[j], min(0., pmp_1, lac_1)))
    elif jord == 11:
        for j in range(js1, je1 + 1):
            xt = PPM_FAC * dm[j]
            bl[j] = -np.sign(xt) * min(abs(xt), abs(al[j] - q1[j]))
            br[j] = np.sign(xt) * min(abs(xt), abs(al[j + 1] - q1[j]))
    elif jord == 7 or jord == 12:
        for j in range(js1, je1 + 1):
            bl[j] = al[j] - q1[j]
            br[j] = al[j + 1] - q1[j]
            xt1[j] = br[j] - bl[j]
            a4[j] = -3. * (br[j] + bl[j])
            hi5[j] = bl[j] * br[j] > 0.0
            hi6[j] = abs(xt1[j]) < -a4[j]
        for j in range(js1, je1 + 1):
            if hi6[j]:
                if q1[j] + 0.25 / a4[j] * xt1[j] ** 2 + a4[j] * R12 < 0.0:
                    if hi5[j]:
                        br[j] = 0.0
                        bl[j] = 0.0
                    elif xt1[j] > 0.0:
                        br[j] = -2. * bl[j]
                    else:
                        bl[j] = -2. * br[j]
    else:
        for j in range(js1, je1 + 1):
            bl[j] = al[j] - q1[j]
            br[j] = al[j + 1] - q1[j]

    if jord == 9 or jord == 13:
        q_sub = FA(js1, je1)
        for j in range(js1, je1 + 1):
            q_sub[j] = q1[j]
        pert_ppm(je1 - js1 + 1, q_sub, bl, br, 0, js1)

    if (not bounded_domain) and grid_type < 3:
        if js == 1:
            bl[0] = S14 * dm[-1] + S11 * (q1[-1] - q1[0])
            xt = 0.5 * (
                ((2. * dya[0] + dya[-1]) * q1[0] - dya[0] * q1[-1])
                / (dya[-1] + dya[0])
                + ((2. * dya[1] + dya[2]) * q1[1] - dya[1] * q1[2])
                / (dya[1] + dya[2]))
            xt = max(xt, min(q1[-1], q1[0], q1[1], q1[2]))
            xt = min(xt, max(q1[-1], q1[0], q1[1], q1[2]))
            br[0] = xt - q1[0]
            bl[1] = xt - q1[1]
            xt = S15 * q1[1] + S11 * q1[2] - S14 * dm[2]
            br[1] = xt - q1[1]
            bl[2] = xt - q1[2]
            br[2] = al[3] - q1[2]
            q_sub = FA(0, 2)
            for j in range(0, 3):
                q_sub[j] = q1[j]
            pert_ppm(3, q_sub, bl, br, 1, 0)
        if je + 1 == npy:
            bl[npy - 2] = al[npy - 2] - q1[npy - 2]
            xt = S15 * q1[npy - 1] + S11 * q1[npy - 2] + S14 * dm[npy - 2]
            br[npy - 2] = xt - q1[npy - 2]
            bl[npy - 1] = xt - q1[npy - 1]
            xt = 0.5 * (
                ((2. * dya[npy - 1] + dya[npy - 2]) * q1[npy - 1]
                 - dya[npy - 1] * q1[npy - 2])
                / (dya[npy - 2] + dya[npy - 1])
                + ((2. * dya[npy] + dya[npy + 1]) * q1[npy]
                   - dya[npy] * q1[npy + 1])
                / (dya[npy] + dya[npy + 1]))
            xt = max(xt, min(q1[npy - 2], q1[npy - 1], q1[npy], q1[npy + 1]))
            xt = min(xt, max(q1[npy - 2], q1[npy - 1], q1[npy], q1[npy + 1]))
            br[npy - 1] = xt - q1[npy - 1]
            bl[npy] = xt - q1[npy]
            br[npy] = S11 * (q1[npy + 1] - q1[npy]) - S14 * dm[npy + 1]
            q_sub = FA(npy - 2, npy)
            for j in range(npy - 2, npy + 1):
                q_sub[j] = q1[j]
            pert_ppm(3, q_sub, bl, br, 1, npy - 2)

    if jord == 7:
        for j in range(js - 1, je + 2):
            b0[j] = bl[j] + br[j]
            smt5[j] = bl[j] * br[j] < 0.0
        for j in range(js, je + 2):
            if c[j] > 0.0:
                fx1 = (1. - c[j]) * (br[j - 1] - c[j] * b0[j - 1])
                flux[j] = q1[j - 1]
            else:
                fx1 = (1. + c[j]) * (bl[j] + c[j] * b0[j])
                flux[j] = q1[j]
            if smt5[j - 1] or smt5[j]:
                flux[j] = flux[j] + fx1
    else:
        for j in range(js, je + 2):
            if c[j] > 0.0:
                flux[j] = q1[j - 1] + (1. - c[j]) * (
                    br[j - 1] - c[j] * (bl[j - 1] + br[j - 1]))
            else:
                flux[j] = q1[j] + (1. + c[j]) * (
                    bl[j] + c[j] * (bl[j] + br[j]))
    return flux.to_np(js, je + 1)
