"""A/B: 2D Q2 elasticity apply — conv pair vs parity-matmul (round 4).

Times both stencil formulations of the SAME element matrix at the 2D
bench scale (512^2 cells, 2.1M displacement DOFs) with the in-jit chain
methodology of bench.py (_time_chained), and checks they agree.

Result (v5e, 2026-08-19): see docs/VALIDATION.md "2D apply formulation".
"""
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(HERE), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench                                          # noqa: E402
from poroelasticity_dealii_tpu.ops import dense, stencil  # noqa: E402
from poroelasticity_dealii_tpu.solvers.structured import \
    _single_cell_spaces                               # noqa: E402
from poroelasticity_dealii_tpu.config import read_input_file  # noqa: E402


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    data = read_input_file(os.path.join(os.path.dirname(HERE),
                                        "configs/golden_2d.data"))
    dim = data.dim
    span = np.asarray(data.domain_size[:dim])
    _, _, su1 = _single_cell_spaces(data, (cells,) * dim, 1, 2, span=span)
    Ke = dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]
    dtype = jnp.float32
    ns = (cells,) * dim
    gs = tuple(2 * n + 1 for n in ns)
    n_udofs = int(np.prod(gs)) * dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_udofs), dtype)

    from jax import lax
    wg = jnp.asarray(stencil._to_kernel(Ke, dim, 2, dim), dtype)
    ws = jnp.asarray(stencil._scatter_kernel(dim, Ke.shape[0] // dim, dim,
                                             2, dim), dtype)

    def conv_apply(v):
        ye = stencil.conv_cellwise(v, wg, 2, dim, dim, gs)
        return stencil.conv_scatter(ye, ws, 2, dim, dim, ns)

    mm_apply = stencil._make_parity_matmul_apply(Ke, 2, 2, dim, dim, dim,
                                                 ns, dtype,
                                                 lax.Precision.HIGHEST)

    y1 = jax.jit(conv_apply)(x)
    y2 = jax.jit(mm_apply)(x)
    err = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y1)))
    print(f"# agreement rel err: {err:.2e}", flush=True)
    assert err < 1e-5

    nbytes = 2 * n_udofs * 4
    for name, f in [("conv", conv_apply), ("matmul", mm_apply)]:
        t0 = time.perf_counter()
        ms = bench._time_chained(f, x)
        gbps = nbytes / (ms * 1e-3) / 1e9
        print(f"# {name:8s} {ms:8.3f} ms  {gbps:7.1f} GB/s "
              f"(wall incl compile {time.perf_counter() - t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
