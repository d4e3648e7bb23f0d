"""Bitwise-reproducible global reductions (the `reproduce_sum` contract).

Re-implements the guarantee of the reference's `g_sum(..., reproduce=.true.)`
/ BITWISE_EXACT_SUM (fv_grid_utils.F90:2879-2929, mpp EFP sums): the global
sum of a distributed field is bit-identical for ANY layout / sharding /
reduction order.

TPU-native design: instead of gathering to one rank and summing in a sorted
order (the FMS approach — a full gather per sum), every element is quantized
to a 62-bit fixed-point integer relative to a power-of-two global scale, and
the integers are reduced with `psum`. Integer addition is exactly
associative and commutative, so the reduction tree XLA picks is irrelevant;
the scale comes from a `pmax` (also order-independent). Cost: one pmax + one
int64 psum pair — no gather, no host round-trip.

Requires x64 (like the reference's `repro` compile mode, which is a 64-bit
build — SURVEY.md §4.4).
"""

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 62          # fixed-point fraction bits
_SPLIT = 31         # low/high lane split so int64 partial sums cannot overflow


def _require_x64():
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "reproduce_sum requires jax_enable_x64 (the reference's repro "
            "mode is a 64-bit build); enable x64 or use the fast path")


def reproduce_sum(x, axis_name=None):
    """Deterministic sum of all elements of `x` (plus, when `axis_name` is
    given, across that mesh axis). Bit-identical for any sharding and any
    element order; quantization error ~2^-62 * max|x| per element.
    """
    _require_x64()
    x = jnp.asarray(x, jnp.float64).ravel()
    m = jnp.max(jnp.abs(x))
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    # power-of-two scale: x/scale is an exact mantissa shift
    scale = jnp.where(m > 0, 2.0 ** jnp.ceil(jnp.log2(jnp.maximum(m, 1e-300))),
                      1.0)
    z = jnp.round(x / scale * (2.0 ** _BITS)).astype(jnp.int64)
    hi = z >> _SPLIT
    lo = z - (hi << _SPLIT)
    shi = jnp.sum(hi)
    slo = jnp.sum(lo)
    if axis_name is not None:
        shi = jax.lax.psum(shi, axis_name)
        slo = jax.lax.psum(slo, axis_name)
    total = (shi.astype(jnp.float64) * (2.0 ** _SPLIT)
             + slo.astype(jnp.float64))
    return total * scale * (2.0 ** -_BITS)


def g_sum_reproducible(field2d, area, axis_name=None, mean=True):
    """Area-weighted reproducible global sum / mean of a per-tile 2-D field
    (fv_grid_utils.F90 g_sum:2879 with reproduce=.true.). `area` must be
    sharded identically to `field2d`."""
    _require_x64()
    num = reproduce_sum(jnp.asarray(field2d, jnp.float64)
                        * jnp.asarray(area, jnp.float64), axis_name)
    if not mean:
        return num
    den = reproduce_sum(jnp.asarray(area, jnp.float64), axis_name)
    return num / den


def checksum(x):
    """Order-independent integer state checksum (mpp_chksum analog,
    fv_mp_mod.F90:34): sum of the raw IEEE bit patterns mod 2^64. Bitwise
    layout-invariant; use to compare restart/state integrity across runs."""
    _require_x64()
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        bits = jax.lax.bitcast_convert_type(x, jnp.int64)
    elif x.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(x, jnp.int32).astype(jnp.int64)
    else:
        bits = x.astype(jnp.int64)
    return jnp.sum(bits.ravel())


def checksum_host(x):
    """NumPy-side checksum with the same definition (for restart files)."""
    x = np.asarray(x)
    if x.dtype == np.float64:
        bits = x.view(np.int64)
    elif x.dtype == np.float32:
        bits = x.view(np.int32).astype(np.int64)
    else:
        bits = x.astype(np.int64)
    with np.errstate(over="ignore"):
        return int(np.sum(bits, dtype=np.int64))
