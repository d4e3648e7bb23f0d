"""DCMIP 1-1 deformational tracer advection (reference test_case 51,
test_cases.F90:2369 + case51_forcing:4174): the time-reversing flow must
return the tracers to their initial state at t = T (12 days), conserving
tracer mass to roundoff (streamfunction winds are discretely nondivergent).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gfdl_atmos_cubed_sphere_tpu.model.grid_ops import build_grid_ops
from gfdl_atmos_cubed_sphere_tpu.model import sw_dynamics as swd
from gfdl_atmos_cubed_sphere_tpu.init import dcmip


def test_case51_reversing_flow_roundtrip():
    npz = 4
    g = build_grid_ops(25, dtype=jnp.float64)
    ic = dcmip.case51(g.geom, npz)
    swd.prepare_phis(g, np.zeros((6, 1, g.n, g.n)))
    cfg = swd.SWConfig(npx=g.npx, dt=3600.0, n_split=1, advection_only=True,
                       hord_dp=8, hord_vt=8, hord_mt=8)
    step = jax.jit(swd.make_sw_step(g, cfg))

    # advect tracer "density" delp*q per (tracer, level) batch; delp is
    # uniform per level and the flow nondivergent, so q = density/delp0
    q1 = jnp.asarray(ic["q"]["q1"])           # [6, npz, n, n]
    q3 = jnp.asarray(ic["q"]["q3"])
    batch = jnp.concatenate([q1, q3], axis=1)  # stack tracers along K
    area = g.geom.interior("area")[:, None]
    m0 = float((np.asarray(batch) * area).sum())

    nsteps = int(dcmip.PERIOD / 3600.0)        # 288
    d = batch
    for it in range(nsteps):
        t_mid = (it + 0.5) * 3600.0
        uc, vc = dcmip.case51_cgrid_winds(g.geom, t_mid)
        ucj = jnp.asarray(np.broadcast_to(uc, (6, 2 * npz) + uc.shape[2:]))
        vcj = jnp.asarray(np.broadcast_to(vc, (6, 2 * npz) + vc.shape[2:]))
        d, _, _ = step(d, None, None, ucj, vcj)

    assert not bool(jnp.isnan(d).any())
    m1 = float((np.asarray(d) * area).sum())
    # ~2e-8/step drift: the deformational flow is asymmetric across tile
    # walls, where the two adjacent tiles' one-sided PPM reconstructions
    # differ slightly (same class as the case-1 linear-family drift noted
    # in test_sw_core; the reference avoids it only because each wall flux
    # is computed once by the owning rank)
    assert abs(m1 - m0) / m0 < 2e-5

    # round trip: fields return to the initial state (coarse C24 => allow
    # substantial diffusion of the slotted cylinder; the bell correlates)
    b0 = np.asarray(batch)
    b1 = np.asarray(d)
    corr = float((b0 * b1).sum() / np.sqrt((b0 ** 2).sum() * (b1 ** 2).sum()))
    assert corr > 0.85, corr
    # monotone advection keeps tracer bounds
    assert float(d.min()) > -1e-10
    assert float(d.max()) < float(batch.max()) * 1.05
