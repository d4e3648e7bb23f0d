"""init_case dispatch table (component #23 front door).

The reference exposes one public entry `init_case` keyed by the
`test_case` namelist number (/root/reference/tools/test_cases.F90:193,
catalog :64-117, SW select :784).  This module maps the same numbers
onto the per-case initializers so reference namelists translate
directly; unimplemented numbers raise with the reference's own
restriction where one exists.
"""

import numpy as np


def init_case(test_case, geom, npz=None, ak=None, bk=None, ptop=None,
              **kw):
    """Dispatch on the reference test_case number. SW cases (-1..9)
    ignore npz/ak/bk; 3-D cases require npz (and ak/bk where the case
    uses the standard coordinate). Returns the case's IC dict."""
    from . import sw_cases, gravity_waves, dcmip, supercell, tc_vortex
    from .baroclinic import jw_baroclinic

    t = int(test_case)
    sw = {0: sw_cases.case0, 1: sw_cases.case1, 2: sw_cases.case2,
          3: sw_cases.case3, 4: sw_cases.case4, 5: sw_cases.case5,
          6: sw_cases.case6, 7: sw_cases.case7, 8: sw_cases.case8,
          9: sw_cases.case9}
    if t in sw:
        return sw[t](geom, **kw)
    if t in (12, 13, -13):
        return jw_baroclinic(geom, npz, ak, bk, ptop,
                             perturb=(t != 12), **kw)
    if t in (15, 19):
        return gravity_waves.density_current(geom, npz,
                                             rotating=(t == 15), **kw)
    if t == 16:
        return gravity_waves.case16(geom, npz)
    if t == 17:
        return gravity_waves.case17(geom, npz)
    if t == 18:
        return gravity_waves.case18(geom, npz, ak, bk)
    if t in (20, 21):
        return gravity_waves.case20_21()
    if t in (30, 31):
        return supercell.supercell(geom, npz, ak, bk, ptop, case=t, **kw)
    if t == 32:
        return gravity_waves.case32()
    if t in (33, 34, 35):
        return gravity_waves.schar_mountain(geom, npz, ak, bk,
                                            variant=t, **kw)
    if t in (36, 37):
        return supercell.superk(geom, npz, case=t, **kw)
    if t == 51:
        return dcmip.case51(geom, npz)
    if t == 52:
        return dcmip.case52(geom, npz)
    if t in (55, -55):
        return tc_vortex.tc_vortex(geom, npz, ak, bk, ptop,
                                   vortex=True, **kw)
    raise NotImplementedError(
        f"test_case {t} is not implemented (catalog: "
        f"test_cases.F90:64-117)")
