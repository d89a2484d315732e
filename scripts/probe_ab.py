"""Interleaved A/B/C probe: v3 vs v4 vs raw-at-tuned-tc, median of rounds.

Chip drift makes single _time_chained calls +/-10%; interleaving the
candidates within each round and taking per-candidate medians cancels it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data, disc, solver, n_dofs = bench.build(cells=cells)
    import jax.numpy as jnp
    from poroelasticity_dealii_tpu.mesh.generator import hyper_rectangle
    from poroelasticity_dealii_tpu.mesh.qk import build_fe_space
    from poroelasticity_dealii_tpu.ops import dense
    from poroelasticity_dealii_tpu.ops.pallas_comp_major import (
        make_pallas_apply_rows, make_pallas_free_apply)
    ro = disc.row_ops
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    R = ro.to_rows(u) * ro.free_mask_rows
    h = [data.domain_size[d] / cells for d in range(3)]
    su1 = build_fe_space(hyper_rectangle(h, cells_per_axis=1), 2)
    Ke = dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]
    m = ro.free_mask_rows
    cands = {
        "v3(default)": ro.fused_constrained,
        "v4(tc=8)": ro.fused_free,
        "v4(tc=5)": make_pallas_free_apply(Ke, cells, m, disc.dtype, tc=5),
        "raw(tc=5)": make_pallas_apply_rows(Ke, cells, disc.dtype, tc=5),
        "raw(tc=6)": make_pallas_apply_rows(Ke, cells, disc.dtype, tc=6),
    }
    times = {k: [] for k in cands}
    for r in range(rounds):
        for k, f in cands.items():
            times[k].append(bench._time_chained(f, R))
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"{k:14s} median {ts[len(ts) // 2]:.4f} ms  "
              f"min {ts[0]:.4f}  all {['%.4f' % t for t in ts]}")


if __name__ == "__main__":
    main()
