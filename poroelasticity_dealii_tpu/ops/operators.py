"""Matrix-free FEM operator applies (the hot path).

Replaces the reference's global ``SparseMatrix`` SpMVs and cell-loop assembly
(``PoroElasticPressureSolver.h:96-101,133-139``,
``PoroElasticDisplacementSolver.h:155-291``, ``StrainProjector.h:109-198``)
with sum-factorized on-the-fly quadrature:

    gather dofs  ->  shared-table contraction (MXU matmul)  ->  pointwise
    geometric factors (VPU)  ->  transpose contraction (MXU)  ->
    deterministic segment-sum scatter.

Per apply this reads only O(E·Q·dim²) Jacobian factors from HBM instead of
O(E·ndof²) stored element matrices — ~25x less HBM traffic for Q2/3D — which
is what makes CG iterations bandwidth-cheap on TPU.

All functions are pure and jit-safe; dtype follows the inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Voigt-style unique symmetric tensor components, in the reference's
# TensorIndexer order (TensorIndexer.h:18-35):
#   2D: xx, xy, yy       3D: xx, xy, xz, yy, yz, zz
VOIGT_PAIRS = {
    1: [(0, 0)],
    2: [(0, 0), (0, 1), (1, 1)],
    3: [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)],
}
# entries of VOIGT_PAIRS that are diagonal (volumetric) / off-diagonal (shear)
VOLUMETRIC_ENTRIES = {1: [0], 2: [0, 2], 3: [0, 3, 5]}
SHEAR_ENTRIES = {1: [], 2: [1], 3: [1, 2, 4]}


def scatter_add(values, conn, n_dofs):
    """Deterministic global assembly: sum per-cell values into dof vector.

    ``values``/``conn`` may have any matching leading shape; equivalent to the
    reference's ``constraints.distribute_local_to_global`` vector path.
    """
    return jax.ops.segment_sum(values.reshape(-1), conn.reshape(-1),
                               num_segments=n_dofs)


# --------------------------------------------------------------------------
# scalar (pressure) operators
# --------------------------------------------------------------------------

def apply_mass(p, conn, psi, jxw):
    """y = M p with M_ij = ∫ psi_i psi_j dx (MatrixCreator::create_mass_matrix,
    PoroElasticPressureSolver.h:96-98)."""
    pe = p[conn]                                    # (E, N)
    v = jnp.einsum("qn,en->eq", psi, pe)            # values at q-points
    ye = jnp.einsum("qn,eq->en", psi, jxw * v)
    return scatter_add(ye, conn, p.shape[0])


def apply_laplace(p, conn, dref, jinv, jxw):
    """y = L p with L_ij = ∫ grad psi_i . grad psi_j dx
    (MatrixCreator::create_laplace_matrix, PoroElasticPressureSolver.h:99-101)."""
    pe = p[conn]
    r = jnp.einsum("qnm,en->eqm", dref, pe)         # ref gradients
    g = jnp.einsum("eqm,eqmd->eqd", r, jinv)        # physical gradients
    t = jnp.einsum("eqd,eqmd->eqm", g * jxw[..., None], jinv)
    ye = jnp.einsum("qnm,eqm->en", dref, t)
    return scatter_add(ye, conn, p.shape[0])


# --------------------------------------------------------------------------
# vector (displacement) elasticity operator
# --------------------------------------------------------------------------

def apply_elasticity(u, conn_u, dref, jinv, jxw, lam, mu):
    """y = K u for isotropic linear elasticity.

    K[(n,i),(m,j)] = ∫ eps(phi_ni) : C : eps(phi_mj) with
    C = lambda I⊗I + 2 mu II (the reference's ``isotropic_gassman_tensor``,
    ConstitutiveModel.h:45-57; cell kernel
    PoroElasticDisplacementSolver.h:237-242).  Exploits isotropy as
    sigma = lambda tr(grad u) I + mu (grad u + grad uᵀ) instead of
    materializing the rank-4 tensor.
    """
    n_dofs = u.shape[0]
    E, N = conn_u.shape[0], dref.shape[1]
    dim = dref.shape[2]
    ue = u[conn_u].reshape(E, N, dim)               # interleaved (node, comp)
    r = jnp.einsum("qnm,eni->eqim", dref, ue)       # shared-matrix MXU matmul
    h = jnp.einsum("eqim,eqmj->eqij", r, jinv)      # grad u (E,Q,dim,dim)
    tr = jnp.trace(h, axis1=-2, axis2=-1)
    sig = mu * (h + jnp.swapaxes(h, -1, -2))
    sig = sig + (lam * tr)[..., None, None] * jnp.eye(dim, dtype=u.dtype)
    s = sig * jxw[..., None, None]
    t = jnp.einsum("eqij,eqmj->eqim", s, jinv)
    ye = jnp.einsum("qnm,eqim->eni", dref, t)       # shared-matrix MXU matmul
    return scatter_add(ye.reshape(E, N * dim), conn_u, n_dofs)


def coupling_rhs(p, conn_p, conn_u, psi_p_at_uq, dref_u, jinv_u, jxw_u,
                 biot_coef, n_udofs):
    """f[(n,i)] = ∫ b p tr(eps(phi_ni)) dx = ∫ b p d phi_n/d x_i dx —
    the pore-pressure coupling RHS (PoroElasticDisplacementSolver.h:227-234).
    """
    E, N = conn_u.shape[0], dref_u.shape[1]
    dim = dref_u.shape[2]
    pe = p[conn_p]
    pv = jnp.einsum("qj,ej->eq", psi_p_at_uq, pe)   # pressure at disp q-pts
    w = biot_coef * jxw_u * pv                      # (E, Q)
    t = w[..., None, None] * jinv_u                 # (E,Q,m,c)
    ye = jnp.einsum("qnm,eqmc->enc", dref_u, t)
    return scatter_add(ye.reshape(E, N * dim), conn_u, n_udofs)


# --------------------------------------------------------------------------
# strain projection (StrainProjector.h:109-198)
# --------------------------------------------------------------------------

def strain_projection_rhs(u, conn_u, conn_p, psi_p, dref_u_at_pq, jinv_p,
                          jxw_p, n_pdofs):
    """RHS of the L2 projection of all unique strain components onto the
    pressure space: rhs[c][i] = ∫ psi_i eps_c(u) dx, assembled for every
    Voigt component in one sweep (the reference assembles all requested
    components per cell sweep too, StrainProjector.h:159-196).

    Returns ``(n_voigt, n_pdofs)``.
    """
    E, Nu = conn_u.shape[0], dref_u_at_pq.shape[1]
    dim = dref_u_at_pq.shape[2]
    pairs = VOIGT_PAIRS[dim]
    ue = u[conn_u].reshape(E, Nu, dim)
    r = jnp.einsum("qnm,eni->eqim", dref_u_at_pq, ue)
    h = jnp.einsum("eqim,eqmj->eqij", r, jinv_p)    # grad u at pressure q-pts
    eps = 0.5 * (h + jnp.swapaxes(h, -1, -2))
    comps = jnp.stack([eps[..., a, b] for (a, b) in pairs], axis=-1)  # (E,Q,C)
    ye = jnp.einsum("qi,eqc->eic", psi_p, comps * jxw_p[..., None])
    flat = jax.vmap(lambda y: scatter_add(y, conn_p, n_pdofs),
                    in_axes=-1, out_axes=0)(ye)
    return flat


# --------------------------------------------------------------------------
# diagonals (Jacobi preconditioning)
# --------------------------------------------------------------------------

def mass_diagonal(conn, psi, jxw, n_dofs):
    de = jnp.einsum("eq,qn->en", jxw, psi * psi)
    return scatter_add(de, conn, n_dofs)


def laplace_diagonal(conn, dref, jinv, jxw, n_dofs):
    g = jnp.einsum("qnm,eqmd->eqnd", dref, jinv)
    de = jnp.einsum("eq,eqnd->en", jxw, g * g)
    return scatter_add(de, conn, n_dofs)


def elasticity_diagonal(conn_u, dref, jinv, jxw, lam, mu, n_udofs):
    """diag K[(n,c)] = ∫ [lam G_nc² + mu (Σ_j G_nj² + G_nc²)] dx."""
    g = jnp.einsum("qnm,eqmd->eqnd", dref, jinv)    # physical gradients
    g2 = g * g
    sum_g2 = jnp.sum(g2, axis=-1, keepdims=True)
    de = jnp.einsum("eq,eqnc->enc", jxw, (lam + mu) * g2 + mu * sum_g2)
    E, N = conn_u.shape[0], dref.shape[1]
    dim = dref.shape[2]
    return scatter_add(de.reshape(E, N * dim), conn_u, n_udofs)


# --------------------------------------------------------------------------
# Dirichlet-constrained operator wrapper
# --------------------------------------------------------------------------

def constrained_apply(apply_fn, free_mask):
    """Restrict an SPD operator to the free-dof subspace.

    Equivalent to the reference's keep-constrained-dofs assembly +
    ``ConstraintMatrix`` condensation (PoroElasticDisplacementSolver.h:279-286):
    constrained rows/columns are zeroed and replaced by the identity, so CG
    iterates only move on free dofs while the operator stays SPD.
    """
    def apply(x):
        xm = x * free_mask
        y = apply_fn(xm)
        return y * free_mask + x * (1.0 - free_mask)
    return apply
