"""Probe: 2D parity-RESIDENT elasticity apply + layout transforms (round 4).

The round-4 A/B (scripts/apply2d_ab.py) showed the per-apply parity-matmul
formulation is gather-bound: 3.87 ms of its 6.13 ms is the de-interleave +
piece assembly, while the einsum is 0.065 ms.  The fix candidate is the 3D
production pattern (ops/pallas_comp_major.ElasticityRowOps): make the parity
layout a PERSISTENT dof-vector format, so CG iterates entirely in parity
space and the interleave/de-interleave happens once per solve, not per
apply.  This probe measures the primitives on real TPU at the 2D bench
scale before committing to the design:

  - to_parity / from_parity roundtrip (per-solve cost)
  - parity-resident apply (per-CG-iteration cost): contiguous slices from
    the class arrays -> one (18,18)x(18,E) einsum -> pad-add scatter
  - the conv-pair apply (current 2D fallback) for reference

Usage: python scripts/parity2d_probe.py [cells]
"""
import faulthandler
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(int(os.environ.get("PROBE_HANG_S", 600)))

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402
from jax import lax                                   # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(HERE), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench                                          # noqa: E402
from poroelasticity_dealii_tpu.ops import dense, stencil  # noqa: E402
from poroelasticity_dealii_tpu.ops.shape import node_lattice  # noqa: E402
from poroelasticity_dealii_tpu.solvers.structured import \
    _single_cell_spaces                               # noqa: E402
from poroelasticity_dealii_tpu.config import read_input_file  # noqa: E402


def build_parity(Ke, n, nc, dtype):
    """Prototype parity-layout kit for a 2D Q2 n x n grid."""
    g = 2 * n + 1
    n1 = n + 1
    lat = node_lattice(2, 2)                          # (9, 2) x-first
    cols = np.array([node * nc + c
                     for c in range(nc) for node in range(9)])
    Kr = jnp.asarray(np.asarray(Ke, np.float64)[np.ix_(cols, cols)], dtype)

    def to_parity(x):
        X = jnp.moveaxis(x.reshape(g, g, nc), -1, 0)  # (nc, gy, gx)
        rows = []
        for oy in range(2):
            row = []
            for ox in range(2):
                S = X[:, oy::2, ox::2]
                S = jnp.pad(S, ((0, 0), (0, n1 - S.shape[1]),
                                (0, n1 - S.shape[2])))
                row.append(S)
            rows.append(jnp.stack(row, 1))            # (nc, 2, n1, n1)
        return jnp.stack(rows, 1)                     # (nc, 2, 2, n1, n1)

    def to_parity_pr(x):
        """pad+reshape variant (no strided slices)."""
        X = jnp.moveaxis(x.reshape(g, g, nc), -1, 0)
        X = jnp.pad(X, ((0, 0), (0, 1), (0, 1)))      # (nc, 2n1, 2n1)
        X = X.reshape(nc, n1, 2, n1, 2)
        return jnp.moveaxis(jnp.moveaxis(X, 2, 1), 4, 2)

    def from_parity(Xp):
        S = jnp.moveaxis(Xp, 2, -1)                   # (nc,2,n1,n1,2)
        S = S.reshape(nc, 2, n1, 2 * n1)[..., :g]
        S = jnp.moveaxis(S, 1, 2)                     # (nc, n1, 2, g)
        S = S.reshape(nc, 2 * n1, g)[:, :g]
        return jnp.moveaxis(S, 0, -1).reshape(-1)

    def _cs(o):
        return (o, 0) if o < 2 else (0, 1)

    def apply_parity(Xp):
        pieces = []
        for node in range(9):
            (cy, sy), (cx, sx) = _cs(int(lat[node, 1])), _cs(int(lat[node, 0]))
            pieces.append(Xp[:, cy, cx, sy:sy + n, sx:sx + n])
        U = jnp.stack(pieces, 1).reshape(nc * 9, n * n)
        Ye = jnp.einsum("oi,ie->oe", Kr, U,
                        precision=lax.Precision.HIGHEST)
        Ye = Ye.reshape(nc, 9, n, n)
        acc = [[None, None], [None, None]]
        for node in range(9):
            (cy, sy), (cx, sx) = _cs(int(lat[node, 1])), _cs(int(lat[node, 0]))
            P = jnp.pad(Ye[:, node], ((0, 0), (sy, 1 - sy), (sx, 1 - sx)))
            acc[cy][cx] = P if acc[cy][cx] is None else acc[cy][cx] + P
        return jnp.stack([jnp.stack(r, 1) for r in acc], 1)

    return to_parity, to_parity_pr, from_parity, apply_parity


def main():
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    data = read_input_file(os.path.join(os.path.dirname(HERE),
                                        "configs/golden_2d.data"))
    dim, nc, n = 2, 2, cells
    span = np.asarray(data.domain_size[:dim])
    _, _, su1 = _single_cell_spaces(data, (n,) * dim, 1, 2, span=span)
    Ke = dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]
    dtype = jnp.float32
    g = 2 * n + 1
    n_udofs = g * g * nc
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_udofs), dtype)

    wg = jnp.asarray(stencil._to_kernel(Ke, nc, 2, dim), dtype)
    ws = jnp.asarray(stencil._scatter_kernel(nc, Ke.shape[0] // nc, nc,
                                             2, dim), dtype)

    def conv_apply(v):
        ye = stencil.conv_cellwise(v, wg, 2, dim, nc, (g, g))
        return stencil.conv_scatter(ye, ws, 2, dim, nc, (n, n))

    tp, tp_pr, fp, ap = build_parity(Ke, n, nc, dtype)

    # correctness: parity roundtrip == identity; parity apply == conv apply
    Xp = jax.jit(tp)(x)
    Xp2 = jax.jit(tp_pr)(x)
    assert float(jnp.max(jnp.abs(Xp - Xp2))) == 0.0, "parity variants differ"
    rt = float(jnp.max(jnp.abs(jax.jit(fp)(Xp) - x)))
    assert rt == 0.0, f"roundtrip not exact: {rt}"
    y_ref = jax.jit(conv_apply)(x)
    y_new = jax.jit(fp)(jax.jit(ap)(Xp))
    err = float(jnp.max(jnp.abs(y_new - y_ref)) / jnp.max(jnp.abs(y_ref)))
    print(f"# apply rel err vs conv: {err:.2e}", flush=True)
    assert err < 1e-5

    nbytes = 2 * n_udofs * 4
    for name, f, arg, nb in [
        ("roundtrip(ss)", lambda v: fp(tp(v)), x, nbytes),
        ("roundtrip(pr)", lambda v: fp(tp_pr(v)), x, nbytes),
        ("apply_parity", ap, Xp, 2 * Xp.size * 4),
        ("conv_apply", conv_apply, x, nbytes),
    ]:
        t0 = time.perf_counter()
        ms = bench._time_chained(f, arg)
        gbps = nb / (ms * 1e-3) / 1e9
        print(f"# {name:14s} {ms:8.3f} ms  {gbps:7.1f} GB/s "
              f"(wall incl compile {time.perf_counter() - t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
