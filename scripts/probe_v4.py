"""Probe: v4 free-subspace apply vs v3 fused constrained apply at 40^3.

Run on the real TPU: ``python scripts/probe_v4.py [cells]``.
Uses bench.py's RTT-cancelling chained timing (docs/VALIDATION.md
"Blessed kernel timings").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    data, disc, solver, n_dofs = bench.build(cells=cells)
    import jax.numpy as jnp
    ro = disc.row_ops
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    R = ro.to_rows(u) * ro.free_mask_rows        # free-subspace vector
    got = np.asarray(ro.fused_free(R))
    ref = np.asarray(ro.fused_constrained(R))
    print("max |v4 - v3| on free subspace:", np.abs(got - ref).max())
    t3 = bench._time_chained(ro.fused_constrained, R)
    t4 = bench._time_chained(ro.fused_free, R)
    tr = bench._time_chained(ro.apply_rows, R)
    print(f"cells={cells}  v3 constrained {t3:.4f} ms  "
          f"v4 free {t4:.4f} ms  raw apply_rows {tr:.4f} ms  "
          f"speedup v4/v3 {t3 / t4:.2f}x")


if __name__ == "__main__":
    main()
