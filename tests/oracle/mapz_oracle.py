"""Loop-literal NumPy oracle for the vertical-remap PPM reconstruction.

Transcribed statement-for-statement from /root/reference/model/fv_operators.F90
cs_profile:919-1297 and cs_limiters:1301-1372, single-column (i1=i2).
Returns the a4 array as (a1, al, ar, a6) per layer."""
import numpy as np

R12 = 1.0 / 12.0


def cs_limiters_col(extm, a4, iv):
    """a4: [4, km] numpy (modified in place); extm: [km] bool."""
    km = a4.shape[1]
    if iv == 0:
        for i in range(km):
            if a4[0, i] <= 0.0:
                a4[1, i] = a4[0, i]
                a4[2, i] = a4[0, i]
                a4[3, i] = 0.0
            else:
                if abs(a4[2, i] - a4[1, i]) < -a4[3, i]:
                    if (a4[0, i] + 0.25 * (a4[2, i] - a4[1, i]) ** 2 / a4[3, i]
                            + a4[3, i] * R12) < 0.0:
                        if a4[0, i] < a4[2, i] and a4[0, i] < a4[1, i]:
                            a4[2, i] = a4[0, i]
                            a4[1, i] = a4[0, i]
                            a4[3, i] = 0.0
                        elif a4[2, i] > a4[1, i]:
                            a4[3, i] = 3. * (a4[1, i] - a4[0, i])
                            a4[2, i] = a4[1, i] - a4[3, i]
                        else:
                            a4[3, i] = 3. * (a4[2, i] - a4[0, i])
                            a4[1, i] = a4[2, i] - a4[3, i]
    elif iv == 1:
        for i in range(km):
            if (a4[0, i] - a4[1, i]) * (a4[0, i] - a4[2, i]) >= 0.0:
                a4[1, i] = a4[0, i]
                a4[2, i] = a4[0, i]
                a4[3, i] = 0.0
            else:
                da1 = a4[2, i] - a4[1, i]
                da2 = da1 ** 2
                a6da = a4[3, i] * da1
                if a6da < -da2:
                    a4[3, i] = 3. * (a4[1, i] - a4[0, i])
                    a4[2, i] = a4[1, i] - a4[3, i]
                elif a6da > da2:
                    a4[3, i] = 3. * (a4[2, i] - a4[0, i])
                    a4[1, i] = a4[2, i] - a4[3, i]
    else:
        for i in range(km):
            if extm[i]:
                a4[1, i] = a4[0, i]
                a4[2, i] = a4[0, i]
                a4[3, i] = 0.0
            else:
                da1 = a4[2, i] - a4[1, i]
                da2 = da1 ** 2
                a6da = a4[3, i] * da1
                if a6da < -da2:
                    a4[3, i] = 3. * (a4[1, i] - a4[0, i])
                    a4[2, i] = a4[1, i] - a4[3, i]
                elif a6da > da2:
                    a4[3, i] = 3. * (a4[2, i] - a4[0, i])
                    a4[1, i] = a4[2, i] - a4[3, i]


def cs_profile_col(a1, delp, qs, iv, kord, return_tie=False):
    """Single-column cs_profile. a1, delp: [km]; qs: scalar bottom BC.
    Returns (al, ar, a6): [km] each. 1-based Fortran k maps to 0-based k-1.

    return_tie=True additionally returns a [km] bool mask of layers whose
    limiter branch decisions sit on an exact floating-point tie (the
    large-scale clamp lands an interface exactly on a1, making
    ``|x0| > x1``-style comparisons depend on last-ulp evaluation order /
    FMA contraction). Those branches are formulation-undecidable; tests
    must exclude them (and their neighbors) from bit-level comparison."""
    km = len(a1)
    a4 = np.zeros((4, km))
    a4[0] = a1
    q = np.zeros(km + 1)        # interfaces, 1-based k at q[k-1]
    gam = np.zeros(km + 1)      # gam(k) at gam[k-1]; gam has km entries used

    if iv == -2:
        gam1 = np.zeros(km + 2)
        gam1[2] = 0.5           # gam(2)
        q[0] = 1.5 * a4[0, 0]
        for k in range(2, km):      # k = 2..km-1 (1-based)
            grat = delp[k - 2] / delp[k - 1]
            bet = 2. + grat + grat - gam1[k]
            q[k - 1] = (3. * (a4[0, k - 2] + a4[0, k - 1]) - q[k - 2]) / bet
            gam1[k + 1] = grat / bet
        grat = delp[km - 2] / delp[km - 1]
        q[km - 1] = (3. * (a4[0, km - 2] + a4[0, km - 1]) - grat * qs
                     - q[km - 2]) / (2. + grat + grat - gam1[km])
        q[km] = qs
        for k in range(km - 1, 0, -1):   # k = km-1..1
            q[k - 1] = q[k - 1] - gam1[k + 1] * q[k]
    else:
        gam2 = np.zeros(km + 1)     # gam(k) at gam2[k-1]
        grat = delp[1] / delp[0]
        bet = grat * (grat + 0.5)
        q[0] = ((grat + grat) * (grat + 1.) * a4[0, 0] + a4[0, 1]) / bet
        gam2[0] = (1. + grat * (grat + 1.5)) / bet
        d4 = 0.0
        for k in range(2, km + 1):   # k = 2..km
            d4 = delp[k - 2] / delp[k - 1]
            bet = 2. + d4 + d4 - gam2[k - 2]
            q[k - 1] = (3. * (a4[0, k - 2] + d4 * a4[0, k - 1])
                        - q[k - 2]) / bet
            gam2[k - 1] = d4 / bet
        a_bot = 1. + d4 * (d4 + 1.5)
        q[km] = (2. * d4 * (d4 + 1.) * a4[0, km - 1] + a4[0, km - 2]
                 - a_bot * q[km - 1]) / (d4 * (d4 + 0.5) - a_bot * gam2[km - 1])
        for k in range(km, 0, -1):   # k = km..1
            q[k - 1] = q[k - 1] - gam2[k - 1] * q[k]

    if abs(kord) == 17:
        al = q[:-1].copy()
        ar = q[1:].copy()
        a6_17 = 3. * (2. * a1 - (al + ar))
        if return_tie:
            return al, ar, a6_17, np.zeros(km, bool)
        return al, ar, a6_17

    # large-scale constraints
    q[1] = min(q[1], max(a4[0, 0], a4[0, 1]))
    q[1] = max(q[1], min(a4[0, 0], a4[0, 1]))

    gamd = np.zeros(km + 1)          # dq: gam(k) = a1(k)-a1(k-1), k=2..km
    for k in range(2, km + 1):
        gamd[k - 1] = a4[0, k - 1] - a4[0, k - 2]

    for k in range(3, km):           # interior interfaces k = 3..km-1
        if abs(kord) >= 14 or gamd[k - 2] * gamd[k] > 0.0:
            q[k - 1] = min(q[k - 1], max(a4[0, k - 2], a4[0, k - 1]))
            q[k - 1] = max(q[k - 1], min(a4[0, k - 2], a4[0, k - 1]))
        else:
            if gamd[k - 2] > 0.0:
                q[k - 1] = max(q[k - 1], min(a4[0, k - 2], a4[0, k - 1]))
            else:
                q[k - 1] = min(q[k - 1], max(a4[0, k - 2], a4[0, k - 1]))
                if iv == 0:
                    q[k - 1] = max(0.0, q[k - 1])

    q[km - 1] = min(q[km - 1], max(a4[0, km - 2], a4[0, km - 1]))
    q[km - 1] = max(q[km - 1], min(a4[0, km - 2], a4[0, km - 1]))

    a4[1] = q[:-1]
    a4[2] = q[1:]

    extm = np.zeros(km, bool)
    ext5 = np.zeros(km, bool)
    ext6 = np.zeros(km, bool)
    for k in range(1, km + 1):
        if k == 1 or k == km:
            extm[k - 1] = ((a4[1, k - 1] - a4[0, k - 1])
                           * (a4[2, k - 1] - a4[0, k - 1])) > 0.0
        else:
            extm[k - 1] = gamd[k - 1] * gamd[k] < 0.0
        if abs(kord) > 9:
            x0 = 2. * a4[0, k - 1] - (a4[1, k - 1] + a4[2, k - 1])
            x1 = abs(a4[1, k - 1] - a4[2, k - 1])
            a4[3, k - 1] = 3. * x0
            ext5[k - 1] = abs(x0) > x1
            ext6[k - 1] = abs(a4[3, k - 1]) > x1

    # knife-edge branch detection (see docstring): margins of the
    # magnitude comparisons each kord/iv variant actually consults
    tie = np.zeros(km, bool)
    akord = abs(kord)
    for j in range(km):
        x0 = 2. * a4[0, j] - (a4[1, j] + a4[2, j])
        x1 = abs(a4[1, j] - a4[2, j])
        s = abs(x0) + x1 + 1e-300
        da1 = a4[2, j] - a4[1, j]
        a6j = 3. * x0
        m1 = abs(abs(x0) - x1)              # ext5 comparison
        m2 = abs(abs(a6j) - x1)             # ext6 / nonmono comparison
        m3 = abs(abs(a6j * da1) - da1 * da1) / (abs(da1) + 1e-300)  # a6da/da2
        cand = [m3] if (j <= 1 or j >= km - 2) else []   # cs_limiters rows
        if akord in (11, 12):
            cand += [m1, m2]    # ext5/ext6 flags feed neighbors' branches
        elif akord in (9, 10):
            cand.append(m2)     # extm deterministic; nonmono margin at j
        if 2 <= j <= km - 3:
            if akord in (14, 15):
                cand.append(m3)
            if iv == 0 and akord <= 13:
                cand.append(m2)             # PD limiter |da1| < -a6
        if cand and min(cand) / s < 1e-12:
            tie[j] = True

    # top subgrid constraints
    if iv == 0:
        a4[1, 0] = max(0.0, a4[1, 0])
    elif iv == -1:
        if a4[1, 0] * a4[0, 0] <= 0.0:
            a4[1, 0] = 0.0
    elif iv == 2:
        a4[1, 0] = a4[0, 0]
        a4[2, 0] = a4[0, 0]
        a4[3, 0] = 0.0

    if iv != 2:
        a4[3, 0] = 3. * (2. * a4[0, 0] - (a4[1, 0] + a4[2, 0]))
        cs_limiters_col(extm[0:1], a4[:, 0:1], 1)

    a4[3, 1] = 3. * (2. * a4[0, 1] - (a4[1, 1] + a4[2, 1]))
    cs_limiters_col(extm[1:2], a4[:, 1:2], 2)

    def huynh_left(k):
        pmp_1 = a4[0, k - 1] - 2. * gamd[k]
        lac_1 = pmp_1 + 1.5 * gamd[k + 1]
        return min(max(a4[1, k - 1], min(a4[0, k - 1], pmp_1, lac_1)),
                   max(a4[0, k - 1], pmp_1, lac_1))

    def huynh_right(k):
        pmp_2 = a4[0, k - 1] + 2. * gamd[k - 1]
        lac_2 = pmp_2 - 1.5 * gamd[k - 2]
        return min(max(a4[2, k - 1], min(a4[0, k - 1], pmp_2, lac_2)),
                   max(a4[0, k - 1], pmp_2, lac_2))

    for k in range(3, km - 1):       # 1-based k = 3..km-2
        ak = abs(kord)
        j = k - 1                    # 0-based layer
        if 0 <= ak <= 8:
            a4[1, j] = huynh_left(k)
            a4[2, j] = huynh_right(k)
            a4[3, j] = 3. * (2. * a4[0, j] - (a4[1, j] + a4[2, j]))
        elif ak == 9:
            if extm[j] and extm[j - 1]:
                a4[1, j] = a4[0, j]
                a4[2, j] = a4[0, j]
                a4[3, j] = 0.0
            elif extm[j] and extm[j + 1]:
                a4[1, j] = a4[0, j]
                a4[2, j] = a4[0, j]
                a4[3, j] = 0.0
            else:
                a4[3, j] = 6. * a4[0, j] - 3. * (a4[1, j] + a4[2, j])
                if abs(a4[3, j]) > abs(a4[1, j] - a4[2, j]):
                    a4[1, j] = huynh_left(k)
                    a4[2, j] = huynh_right(k)
                    a4[3, j] = 6. * a4[0, j] - 3. * (a4[1, j] + a4[2, j])
        elif ak == 10:
            if extm[j]:
                if extm[j - 1] or extm[j + 1]:
                    a4[1, j] = a4[0, j]
                    a4[2, j] = a4[0, j]
                    a4[3, j] = 0.0
                else:
                    a4[3, j] = 6. * a4[0, j] - 3. * (a4[1, j] + a4[2, j])
            else:
                a4[3, j] = 6. * a4[0, j] - 3. * (a4[1, j] + a4[2, j])
                if abs(a4[3, j]) > abs(a4[1, j] - a4[2, j]):
                    a4[1, j] = huynh_left(k)
                    a4[2, j] = huynh_right(k)
                    a4[3, j] = 6. * a4[0, j] - 3. * (a4[1, j] + a4[2, j])
        elif ak == 11:
            if ext5[j] and (ext5[j - 1] or ext5[j + 1]):
                a4[1, j] = a4[0, j]
                a4[2, j] = a4[0, j]
                a4[3, j] = 0.0
            else:
                a4[3, j] = 3. * (2. * a4[0, j] - (a4[1, j] + a4[2, j]))
        elif ak == 12:
            if ext5[j]:
                if ext5[j - 1] or ext5[j + 1]:
                    a4[1, j] = a4[0, j]
                    a4[2, j] = a4[0, j]
                elif ext6[j - 1] or ext6[j + 1]:
                    a4[1, j] = huynh_left(k)
                    a4[2, j] = huynh_right(k)
            elif ext6[j]:
                if ext5[j - 1] or ext5[j + 1]:
                    a4[1, j] = huynh_left(k)
                    a4[2, j] = huynh_right(k)
            a4[3, j] = 3. * (2. * a4[0, j] - (a4[1, j] + a4[2, j]))
        elif ak == 13:
            a4[3, j] = 3. * (2. * a4[0, j] - (a4[1, j] + a4[2, j]))
        elif ak == 14:
            cs_limiters_col(extm[j:j + 1], a4[:, j:j + 1], 2)
        elif ak == 15:
            cs_limiters_col(extm[j:j + 1], a4[:, j:j + 1], 1)
        else:
            raise NotImplementedError(f"kord {kord}")

        if iv == 0 and abs(kord) <= 13:
            cs_limiters_col(extm[j:j + 1], a4[:, j:j + 1], 0)

    # bottom subgrid constraints
    if iv == 0:
        a4[2, km - 1] = max(0.0, a4[2, km - 1])
    elif iv == -1:
        if a4[2, km - 1] * a4[0, km - 1] <= 0.0:
            a4[2, km - 1] = 0.0

    for k in (km - 1, km):           # 1-based
        j = k - 1
        a4[3, j] = 3. * (2. * a4[0, j] - (a4[1, j] + a4[2, j]))
        if k == km - 1:
            cs_limiters_col(extm[j:j + 1], a4[:, j:j + 1], 2)
        if k == km:
            cs_limiters_col(extm[j:j + 1], a4[:, j:j + 1], 1)

    if return_tie:
        return a4[1].copy(), a4[2].copy(), a4[3].copy(), tie
    return a4[1].copy(), a4[2].copy(), a4[3].copy()
