"""Reproduce / verify the elasticity-GMG Mosaic fault at bench size.

python scripts/gmg_fault_repro.py [n_fine] [n_levels]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
n_levels = int(sys.argv[2]) if len(sys.argv) > 2 else 0

jax.config.update("jax_enable_x64", True)


def main():
    import dataclasses

    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.solvers.multigrid import \
        build_gmg_elasticity
    from poroelasticity_dealii_tpu.solvers.structured import _gmg_levels

    data = read_input_file("configs/consolidation_3d.data")
    data = dataclasses.replace(data, dtype="float32")
    nl = n_levels or _gmg_levels(n, 3, 3 * (2 * n + 1) ** 3, "on")
    print(f"# n={n} levels={nl}")
    t0 = time.perf_counter()
    precond, levels = build_gmg_elasticity(data, n_fine=n, n_levels=nl,
                                           dtype=np.float32)
    print(f"# build: {time.perf_counter() - t0:.1f}s "
          f"sizes={[lv.n_cells for lv in levels]} "
          f"lmax={[round(lv.lmax, 2) for lv in levels]}")
    rng = np.random.default_rng(0)
    ndof = 3 * (2 * n + 1) ** 3
    r = jnp.asarray(rng.standard_normal(ndof), jnp.float32)
    r = r * levels[0].free_mask
    jp = jax.jit(precond)
    t0 = time.perf_counter()
    z = jp(r)
    jax.block_until_ready(z)
    print(f"# first vcycle (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        z = jp(r)
    jax.block_until_ready(z)
    ms = (time.perf_counter() - t0) / reps * 1e3
    # contraction check: Richardson step on A z ~ r
    a = levels[0].apply
    rn0 = float(jnp.linalg.norm(r))
    rn1 = float(jnp.linalg.norm(r - a(z)))
    print(f"vcycle {ms:.2f} ms  contraction {rn1/rn0:.3f}  finite="
          f"{bool(jnp.isfinite(z).all())}")


if __name__ == "__main__":
    main()
