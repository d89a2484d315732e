"""CG solver tests: correctness vs numpy direct solves, warm starts,
batched multi-RHS convergence."""

import numpy as np

import jax.numpy as jnp

from poroelasticity_dealii_tpu.solvers.cg import cg_solve, cg_solve_batched


def _spd(n, seed=0, cond=1e3):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.geomspace(1.0, cond, n)
    return (q * eigs) @ q.T


def test_cg_matches_direct_solve():
    n = 64
    a = _spd(n)
    b = np.random.default_rng(1).standard_normal(n)
    x_ref = np.linalg.solve(a, b)
    res = cg_solve(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                   jnp.zeros(n), jnp.asarray(np.diag(a)),
                   tol=1e-10 * np.linalg.norm(b), max_iter=1000)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-7, atol=1e-9)
    assert int(res.iterations) <= 3 * n  # fp rounding delays exact-n bound


def test_cg_warm_start_zero_iterations():
    n = 32
    a = _spd(n, seed=2)
    b = np.random.default_rng(3).standard_normal(n)
    x_ref = np.linalg.solve(a, b)
    res = cg_solve(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                   jnp.asarray(x_ref), jnp.asarray(np.diag(a)),
                   tol=1e-6 * np.linalg.norm(b), max_iter=100)
    assert int(res.iterations) == 0  # already converged at entry
    assert bool(res.converged)


def test_cg_iteration_cap():
    n = 48
    a = _spd(n, seed=4, cond=1e8)
    b = np.ones(n)
    res = cg_solve(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                   jnp.zeros(n), jnp.ones(n), tol=1e-300, max_iter=5)
    assert int(res.iterations) == 5
    assert not bool(res.converged)


def test_batched_cg_independent_convergence():
    n, k = 40, 3
    a = _spd(n, seed=5)
    rng = np.random.default_rng(6)
    b = rng.standard_normal((k, n))
    b[1] *= 1e6  # very different scales per lane
    tol = 1e-9 * np.linalg.norm(b, axis=1)
    res = cg_solve_batched(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                           jnp.zeros((k, n)), jnp.asarray(np.diag(a)),
                           jnp.asarray(tol), max_iter=1000)
    x_ref = np.linalg.solve(a, b.T).T
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-6)
    # lanes converge independently (iteration counts may differ)
    assert res.iterations.shape == (k,)


def test_jacobi_preconditioner_helps():
    n = 96
    # diagonally-dominant system with wildly varying diagonal
    d = np.geomspace(1, 1e6, n)
    a = np.diag(d) + 0.1 * _spd(n, seed=7, cond=10)
    b = np.random.default_rng(8).standard_normal(n)
    tol = 1e-8 * np.linalg.norm(b)
    res_jac = cg_solve(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                       jnp.zeros(n), jnp.asarray(np.diag(a)), tol, 10000)
    res_id = cg_solve(lambda x: jnp.asarray(a) @ x, jnp.asarray(b),
                      jnp.zeros(n), jnp.ones(n), tol, 10000)
    assert bool(res_jac.converged)
    assert int(res_jac.iterations) < int(res_id.iterations)


def test_richardson_stagnation_guard():
    """An unattainable tolerance stops on stagnation, not at max_iter."""
    import jax.numpy as jnp
    from poroelasticity_dealii_tpu.solvers.cg import richardson_solve
    n = 50
    rng = np.random.default_rng(3)
    A = np.eye(n) + 0.1 * np.ones((n, n)) / n
    A = (A + A.T) / 2
    b = rng.standard_normal(n).astype(np.float32)
    Aj = jnp.asarray(A, jnp.float32)
    apply_a = lambda x: Aj @ x  # noqa: E731
    Minv = jnp.asarray(np.linalg.inv(A), jnp.float32)
    res = richardson_solve(apply_a, jnp.asarray(b),
                           jnp.zeros(n, jnp.float32),
                           lambda r: Minv @ r,
                           tol=jnp.asarray(0.0, jnp.float32),
                           max_iter=1000)
    # f32 floor reached long before 1000 iterations
    assert int(res.iterations) < 50, int(res.iterations)
    assert not bool(res.converged)
    assert bool(res.stalled)   # stagnation exit, not the iteration cap
    # the solution is still the f32-accurate one
    x_ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-4)
