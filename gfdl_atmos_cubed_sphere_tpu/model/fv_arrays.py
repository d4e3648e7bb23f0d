"""Master state container (component #4).

The analog of /root/reference/model/fv_arrays.F90's `fv_atmos_type`
(fv_arrays.F90:1242-1413): one registered JAX pytree holding the
prognostic fields, tracers, and auxiliary pressure diagnostics, so a
whole model state can be jitted over, checkpointed (orbax/netCDF), and
donated as a unit. Field names and the [6, K, y, x] / staggered layouts
match the per-field conventions used across model/ (fv_arrays.F90:
1274-1335 list); grid/flags live outside the pytree (static:
model/grid_ops.py pack + utils/config.py dataclasses).
"""

from dataclasses import dataclass, field, fields, replace

import jax
import jax.numpy as jnp

PROGNOSTIC = ("u", "v", "w", "delp", "pt", "delz")
AUXILIARY = ("ps", "pe", "peln", "pk", "pkz", "omga", "ua", "va",
             "phis", "q_con")


@jax.tree_util.register_dataclass
@dataclass
class AtmosState:
    """Prognostic + auxiliary model state (fv_atmos_type analog).

    Cell fields [6, K, n, n]; u y-wall [6, K, n+1, n]; v x-wall
    [6, K, n, n+1]; edge pressures [6, K+1, n, n]; surface [6, n, n].
    Nonhydrostatic fields (w, delz) are None in hydrostatic runs, as are
    any auxiliaries the caller does not maintain.
    """
    # prognostic (fv_arrays.F90:1274-1287)
    delp: jax.Array
    pt: jax.Array
    u: jax.Array
    v: jax.Array
    w: jax.Array | None = None
    delz: jax.Array | None = None
    #: tracers by name (tracer_manager contract — utils/tracer_registry)
    q: dict = field(default_factory=dict)
    # auxiliary pressures / diagnostics (fv_arrays.F90:1300-1335)
    ps: jax.Array | None = None
    pe: jax.Array | None = None
    peln: jax.Array | None = None
    pk: jax.Array | None = None
    pkz: jax.Array | None = None
    omga: jax.Array | None = None
    ua: jax.Array | None = None
    va: jax.Array | None = None
    phis: jax.Array | None = None
    q_con: jax.Array | None = None

    # -- conversions -------------------------------------------------------

    @classmethod
    def from_dict(cls, d):
        names = {f.name for f in fields(cls)}
        q = dict(d.get("q") or {})
        return cls(**{k: v for k, v in d.items() if k in names and k != "q"},
                   q=q)

    def to_dict(self, include_none=False):
        out = {}
        for f in fields(self):
            v = getattr(self, f.name)
            if v is not None or include_none:
                out[f.name] = v
        return out

    def replace(self, **kw):
        return replace(self, **kw)

    @property
    def hydrostatic(self):
        return self.w is None

    def checksum(self):
        """Per-field fingerprints (mpp_chksum analog, fv_mp_mod.F90:34):
        bitwise-stable sum of the raw bit patterns."""
        out = {}
        for f in fields(self):
            v = getattr(self, f.name)
            if f.name == "q":
                for nm, a in v.items():
                    out[f"q/{nm}"] = _chksum(a)
            elif v is not None:
                out[f.name] = _chksum(v)
        return out


def _chksum(a):
    bits = jnp.asarray(a)
    if bits.dtype == jnp.float32:
        bits = bits.view(jnp.uint32).astype(jnp.uint64)
    elif bits.dtype == jnp.float64:
        bits = bits.view(jnp.uint64)
    else:
        bits = bits.astype(jnp.uint64)
    return int(jnp.sum(bits, dtype=jnp.uint64))
