"""The judged driver artifacts: entry() must jit with a TRACED dt.

Regression: the mixed-precision pressure refinement added per-dt dict
caches keyed by dt; under ``jax.jit(fn)(*example_args)`` (exactly what
the driver's compile check does) dt is a tracer — unhashable — and the
cache lookups raised TypeError, breaking the judged entry() artifact.
Tracer-safe lookups (fss._ir_press_for, the _pressure_precond dt guard)
fix it; this test pins the driver's exact calling convention.
"""

import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_jits_with_traced_dt():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[-1]))
    # and the fields it returns are finite
    assert np.isfinite(np.asarray(out[0])).all()
