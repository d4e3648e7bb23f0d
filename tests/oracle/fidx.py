"""Fortran-indexed 1-D array helper for loop-literal oracle transcriptions.

The oracle tier (VERDICT r2 item 3) re-states the reference algorithms as
slow, index-for-index NumPy loops so the vectorized JAX kernels have an
independent formulation to match against. FA mimics Fortran
``real a(lo:hi)`` bounds so the transcriptions keep the original index
arithmetic (off-by-one bugs stay visible instead of being re-derived)."""
import numpy as np


class FA:
    """1-D array with Fortran-style inclusive bounds lo:hi."""

    def __init__(self, lo, hi, dtype=np.float64):
        self.lo = lo
        self.hi = hi
        self.a = np.zeros(hi - lo + 1, dtype)

    @classmethod
    def from_np(cls, arr, lo):
        f = cls(lo, lo + len(arr) - 1, np.asarray(arr).dtype)
        f.a[:] = np.asarray(arr)
        return f

    def __getitem__(self, i):
        assert self.lo <= i <= self.hi, (i, self.lo, self.hi)
        return self.a[i - self.lo]

    def __setitem__(self, i, v):
        assert self.lo <= i <= self.hi, (i, self.lo, self.hi)
        self.a[i - self.lo] = v

    def to_np(self, lo, hi):
        return self.a[lo - self.lo: hi - self.lo + 1].copy()
