"""Experiments: faster to_rows/from_rows formulations on TPU.

python scripts/layout_bench.py [n]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
g = 2 * n + 1


def timeit(f, *args, reps=30):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps * 1e3


from poroelasticity_dealii_tpu.ops.pallas_comp_major import (  # noqa: E402
    _width, from_rows, to_rows)

W = _width(n)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal(g ** 3 * 3), jnp.float32)


def to_rows_strided(u_flat):
    U = u_flat.reshape(g, g, g, 3)
    U = jnp.pad(U, ((0, 1), (0, 1), (0, 1), (0, 0)))
    rows = []
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                for c in range(3):
                    plane = U[pz::2, py::2, px::2, c]
                    rows.append(plane.reshape(n + 1, (n + 1) * (n + 1)))
    R = jnp.stack(rows, axis=1).reshape((n + 1) * 24, (n + 1) * (n + 1))
    return jnp.pad(R, ((0, 0), (0, W - R.shape[1])))


def from_rows_strided(R):
    V = R[:, :(n + 1) * (n + 1)].reshape(n + 1, 24, n + 1, n + 1)
    out = jnp.zeros((2 * n + 2, 2 * n + 2, 2 * n + 2, 3), R.dtype)
    i = 0
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                for c in range(3):
                    out = out.at[pz::2, py::2, px::2, c].set(V[:, i])
                    i += 1
    return out[:g, :g, :g, :].reshape(-1)


def to_rows_2step(u_flat):
    # step 1: comp-planar + z-parity via one transpose of few dims
    U = u_flat.reshape(g, g, g, 3)
    U = jnp.pad(U, ((0, 1), (0, 1), (0, 1), (0, 0)))
    # (zh pz y x c) -> (zh pz c y x)
    A = U.reshape(n + 1, 2, 2 * n + 2, 2 * n + 2, 3)
    A = A.transpose(0, 1, 4, 2, 3)   # move c out of minor
    # now per (zh, pz, c): (y, x) plane; split y,x parity with 2D reshapes
    B = A.reshape(n + 1, 2, 3, n + 1, 2, n + 1, 2)
    B = B.transpose(0, 1, 4, 6, 2, 3, 5)   # zh pz py px c yh xh
    R = B.reshape((n + 1) * 24, (n + 1) * (n + 1))
    return jnp.pad(R, ((0, 0), (0, W - R.shape[1])))


for name, f, inv in [("orig", lambda x: to_rows(x, n), None),
                     ("strided", to_rows_strided, None),
                     ("2step", to_rows_2step, None)]:
    jf = jax.jit(f)
    R = jf(u)
    Rref = jax.jit(lambda x: to_rows(x, n))(u)
    ok = bool(jnp.allclose(R, Rref))
    print(f"to_rows[{name}]    {timeit(jf, u):8.3f} ms  match={ok}")

Rref = jax.jit(lambda x: to_rows(x, n))(u)
for name, f in [("orig", lambda r: from_rows(r, n)),
                ("strided", from_rows_strided)]:
    jf = jax.jit(f)
    y = jf(Rref)
    ok = bool(jnp.allclose(y, u))
    print(f"from_rows[{name}]  {timeit(jf, Rref):8.3f} ms  match={ok}")
