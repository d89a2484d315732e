"""Global Q_k node numbering on a conforming quad/hex mesh.

The deal.II ``DoFHandler::distribute_dofs`` analogue
(``PoroElasticPressureSolver.h:73``, ``PoroElasticDisplacementSolver.h:110``)
rebuilt as vectorized numpy entity dedup: continuity across cells is enforced
topologically (shared vertices / edges / faces get one global node), which is
what guarantees a conforming space without any constraint matrix on uniform
meshes.

Numbering order: mesh vertices first (so Q1 node i == vertex i), then edge
nodes, then (3D) face nodes, then cell-interior nodes.  Deterministic given
cell ordering.

Supported: any degree k in 2D; k <= 2 in 3D (Q2 has a single, orientation-free
interior node per face; higher-order 3D face-node orientation is future work —
the reference only ever uses Q1/Q2).
"""

from __future__ import annotations

import numpy as np

from ..ops.shape import node_lattice, shape_tables
from .core import FESpace, Mesh


def build_fe_space(mesh: Mesh, degree: int) -> FESpace:
    k = degree
    dim = mesh.dim
    if k < 1:
        raise ValueError("degree must be >= 1")
    if dim == 3 and k > 2:
        raise NotImplementedError("3D Q_k for k>2 (face-node orientation)")

    lat = node_lattice(k, dim)                       # (n_loc, dim)
    n_loc = lat.shape[0]
    n_cells = mesh.n_cells
    cells = mesh.cells.astype(np.int64)              # (n_cells, 2**dim)

    cell_nodes = np.zeros((n_cells, n_loc), dtype=np.int64)
    n_vert = mesh.n_vertices
    next_base = n_vert

    # --- classify local lattice nodes --------------------------------------
    on_hi = lat == k
    on_lo = lat == 0
    on_bnd = on_hi | on_lo
    n_interior_axes = dim - on_bnd.sum(axis=1)

    def corner_index(bits):
        """local corner id from per-axis 0/1 bits (x = bit 0)."""
        return int(sum(int(b) << d for d, b in enumerate(bits)))

    # --- vertex nodes -------------------------------------------------------
    for a in np.nonzero(n_interior_axes == 0)[0]:
        ci = corner_index(on_hi[a])
        cell_nodes[:, a] = cells[:, ci]

    # --- edge nodes (dim >= 2: in 1D an axis-interior node is CELL-interior
    # — counting it here too once orphaned a duplicate node set and made the
    # 1D operator singular) -------------------------------------------------
    edge_base = None
    edge_uid_of = {}
    if k >= 2 and dim >= 2:
        edge_locals = np.nonzero(n_interior_axes == 1)[0]
        if len(edge_locals):
            # collect (endpoint0, endpoint1) global ids per (cell, edge node)
            e0_list, e1_list, t_list = [], [], []
            for a in edge_locals:
                d = int(np.nonzero(~on_bnd[a])[0][0])  # interior axis
                bits0 = on_hi[a].copy(); bits0[d] = False
                bits1 = on_hi[a].copy(); bits1[d] = True
                e0_list.append(cells[:, corner_index(bits0)])
                e1_list.append(cells[:, corner_index(bits1)])
                t_list.append(int(lat[a, d]))
            e0 = np.stack(e0_list, axis=1)   # (n_cells, n_edge_locals)
            e1 = np.stack(e1_list, axis=1)
            t = np.array(t_list)             # (n_edge_locals,)
            lo = np.minimum(e0, e1)
            hi = np.maximum(e0, e1)
            keys = lo * (mesh.n_vertices + 1) + hi  # unique scalar key
            uniq, inv = np.unique(keys.reshape(-1), return_inverse=True)
            inv = inv.reshape(keys.shape)
            # per-edge node offset: position measured from the lower-id end
            offs = np.where(e0 <= e1, t[None, :] - 1, k - 1 - t[None, :])
            gids = next_base + inv * (k - 1) + offs
            for j, a in enumerate(edge_locals):
                cell_nodes[:, a] = gids[:, j]
            # coordinates for unique edge nodes
            lo_u = (uniq // (mesh.n_vertices + 1)).astype(np.int64)
            hi_u = (uniq % (mesh.n_vertices + 1)).astype(np.int64)
            frac = (np.arange(1, k) / k)[None, :, None]
            edge_coords = (mesh.vertices[lo_u][:, None, :] * (1 - frac)
                           + mesh.vertices[hi_u][:, None, :] * frac)
            edge_coords = edge_coords.reshape(-1, dim)
            edge_base = next_base
            next_base += len(uniq) * (k - 1)
        else:
            edge_coords = np.zeros((0, dim))
    else:
        edge_coords = np.zeros((0, dim))

    # --- face-interior nodes (3D only) --------------------------------------
    face_coords = np.zeros((0, dim))
    if dim == 3 and k == 2:
        face_locals = np.nonzero(n_interior_axes == 2)[0]
        if len(face_locals):
            fkeys, fcorners = [], []
            for a in face_locals:
                interior = np.nonzero(~on_bnd[a])[0]
                fixed = int(np.nonzero(on_bnd[a])[0][0])
                ids = []
                for b1 in (False, True):
                    for b0 in (False, True):
                        bits = on_hi[a].copy()
                        bits[interior[0]] = b0
                        bits[interior[1]] = b1
                        ids.append(cells[:, corner_index(bits)])
                quad = np.sort(np.stack(ids, axis=1), axis=1)  # (n_cells, 4)
                fcorners.append(quad)
            quads = np.stack(fcorners, axis=1)  # (n_cells, n_face_locals, 4)
            flat = quads.reshape(-1, 4)
            uniq, inv = np.unique(flat, axis=0, return_inverse=True)
            inv = inv.reshape(n_cells, len(face_locals))
            gids = next_base + inv
            for j, a in enumerate(face_locals):
                cell_nodes[:, a] = gids[:, j]
            face_coords = mesh.vertices[uniq].mean(axis=1)
            next_base += uniq.shape[0]

    # --- cell-interior nodes -------------------------------------------------
    int_locals = np.nonzero(n_interior_axes == dim)[0]
    n_int = len(int_locals)
    if n_int:
        gids = next_base + np.arange(n_cells)[:, None] * n_int + np.arange(n_int)
        cell_nodes[:, int_locals] = gids
        # coordinates via isoparametric Q1 map at the lattice points
        ref_pts = lat[int_locals].astype(np.float64) / k * 2.0 - 1.0
        phi1, _ = shape_tables(1, dim, ref_pts)      # (n_int, 2**dim)
        corner_xyz = mesh.vertices[mesh.cells]        # (n_cells, 2**dim, dim)
        int_coords = np.einsum("ic,ecd->eid", phi1, corner_xyz).reshape(-1, dim)
        next_base += n_cells * n_int
    else:
        int_coords = np.zeros((0, dim))

    node_coords = np.concatenate(
        [mesh.vertices, edge_coords, face_coords, int_coords], axis=0)
    assert node_coords.shape[0] == next_base, (node_coords.shape, next_base)

    return FESpace(mesh=mesh, degree=k,
                   node_coords=node_coords,
                   cell_nodes=cell_nodes.astype(np.int32))
