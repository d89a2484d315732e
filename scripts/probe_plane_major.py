"""Probe: plane-major XLA-level elasticity apply vs the Pallas row kernel.

The kernel-variant ablation (docs/VALIDATION.md "Kernel-variant plateau")
pinned every in-kernel variant at ~0.20 ms/apply at 40^3 — the per-layer
VMEM shuffle floor — and named "plane-major operands to fuse the
per-layer matmuls" as the next fundamentally-different dataflow.  This
probes that dataflow OUTSIDE Pallas, where XLA can reshape freely:

  gather:  transpose rows -> (24, n+1, W); each of the 81 (node, comp)
           operands is ONE contiguous (n, Lc) block (the projection_rows
           trick) -> U (81, n*Lc)
  matmul:  Ke (81, 81) @ U — one big MXU op over ALL layers at once
  scatter: 81 pad+adds into 24 (n+1, W) accumulators (the coupling_rows
           trick), transpose back

Correctness is asserted against the production row kernel before timing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def make_plane_major_apply(element_matrix, n, dtype):
    import jax
    import jax.numpy as jnp
    from poroelasticity_dealii_tpu.ops.pallas_comp_major import (
        _slice_params, _width, cell_lane_mask)

    Ke = jnp.asarray(element_matrix, dtype)              # (81, 81)
    W = _width(n)
    Lc = n * (n + 1)
    params = _slice_params(n)
    mask = jnp.tile(cell_lane_mask(n, dtype), n)[None, :]   # (1, n*Lc)

    @jax.jit
    def apply_rows(R):
        T = R[:(n + 1) * 24].reshape(n + 1, 24, W).swapaxes(0, 1)
        ops = []
        for (dz, base, shift) in params:
            for c in range(3):
                ops.append(T[base + c, dz:dz + n,
                             shift:shift + Lc].reshape(-1))
        U = jnp.stack(ops)                               # (81, n*Lc)
        Ye = jnp.dot(Ke, U, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST) * mask
        acc = [None] * 24
        k = 0
        for (dz, base, shift) in params:
            for c in range(3):
                blk = Ye[k].reshape(n, Lc)
                k += 1
                pw = ((dz, 1 - dz), (shift, W - Lc - shift))
                Pd = jnp.pad(blk, pw)                    # (n+1, W)
                r = base + c
                acc[r] = Pd if acc[r] is None else acc[r] + Pd
        out = jnp.stack(acc)                             # (24, n+1, W)
        return out.swapaxes(0, 1).reshape((n + 1) * 24, W)

    return apply_rows


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data, disc, solver, n_dofs = bench.build(cells=cells)
    import jax.numpy as jnp
    from poroelasticity_dealii_tpu.mesh.generator import hyper_rectangle
    from poroelasticity_dealii_tpu.mesh.qk import build_fe_space
    from poroelasticity_dealii_tpu.ops import dense
    ro = disc.row_ops
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    R = ro.to_rows(u)
    h = [data.domain_size[d] / cells for d in range(3)]
    su1 = build_fe_space(hyper_rectangle(h, cells_per_axis=1), 2)
    Ke = dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]
    pm = make_plane_major_apply(Ke, cells, disc.dtype)
    ref = ro.apply_rows(R)
    got = pm(R)
    err = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    print(f"rel err vs row kernel: {err:.3e}")
    assert err < 1e-5
    cands = {"pallas_raw": ro.apply_rows,
             "pallas_v4_free": ro.free_apply,
             "plane_major_xla": pm}
    times = {k: [] for k in cands}
    for _ in range(rounds):
        for k, f in cands.items():
            times[k].append(bench._time_chained(f, R))
    for k, ts in sorted(times.items()):
        ts = sorted(ts)
        print(f"{k:18s} median {ts[len(ts) // 2]:.4f} ms  min {ts[0]:.4f}")


if __name__ == "__main__":
    main()
