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

    if "--scan-tc" in sys.argv:
        from poroelasticity_dealii_tpu.ops.pallas_comp_major import (
            make_pallas_apply_rows, make_pallas_free_apply)
        Ke = disc._elasticity_element_matrix \
            if hasattr(disc, "_elasticity_element_matrix") else None
        if Ke is None:
            from poroelasticity_dealii_tpu.mesh.generator import \
                hyper_rectangle
            from poroelasticity_dealii_tpu.mesh.qk import build_fe_space
            from poroelasticity_dealii_tpu.ops import dense
            h = [data.domain_size[d] / cells for d in range(3)]
            su1 = build_fe_space(hyper_rectangle(h, cells_per_axis=1), 2)
            Ke = dense.elasticity_element_matrices(
                su1, data.lame_constant, data.shear_modulus)[0]
        m = ro.free_mask_rows
        for tc in (2, 3, 4, 5, 6, 7, 8, 10):
            try:
                f4 = make_pallas_free_apply(Ke, cells, m, disc.dtype, tc=tc)
                fr = make_pallas_apply_rows(Ke, cells, disc.dtype, tc=tc)
                ok = np.abs(np.asarray(f4(R)) - ref).max()
                tf = bench._time_chained(f4, R)
                tw = bench._time_chained(fr, R)
                print(f"tc={tc:2d}  v4 {tf:.4f} ms  raw {tw:.4f} ms  "
                      f"(v4 err {ok:.2e})")
            except Exception as e:  # Mosaic VMEM OOM at deep slabs
                print(f"tc={tc:2d}  FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
