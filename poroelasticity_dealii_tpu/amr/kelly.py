"""Kelly error estimator + fixed-error-fraction marking (2D).

Replicates the reference's AMR driver pair
(``KellyErrorEstimator::estimate`` on the pressure solution +
``GridRefinement::refine_and_coarsen_fixed_fraction(0.6, 0.4)``,
``PoroelasticityFSS.h:452-462``): per-cell indicators

    eta_K^2 = sum_{F in dK} (h_F / 24) * int_F [d p / d n]^2 ds

with the normal-derivative jump of the Q1 pressure field across every
(possibly coarse-fine) interior face, 2-point Gauss per fine face segment.
"""

from __future__ import annotations

from typing import Set, Tuple

import numpy as np

from .forest import QuadForest


def _cell_geom(leaf, forest, R):
    l, ix, iy = leaf
    s = R // (2 ** l)
    lo = forest.lower
    sz = forest.upper - forest.lower
    x0 = lo + sz * np.array([ix * s, iy * s]) / R
    h = sz * s / R
    return x0, h


def _grad_at(points, x0, h, pv):
    """Gradient of the bilinear with corner values pv (lex order) at
    physical points (Np, 2) inside the cell at x0 with size h."""
    xi = (points - x0) / h                       # in [0,1]^2
    dpdx = ((pv[1] - pv[0]) * (1 - xi[:, 1]) + (pv[3] - pv[2]) * xi[:, 1]) / h[0]
    dpdy = ((pv[2] - pv[0]) * (1 - xi[:, 0]) + (pv[3] - pv[1]) * xi[:, 0]) / h[1]
    return np.stack([dpdx, dpdy], axis=-1)


def kelly_estimate(forest: QuadForest, mesh, p: np.ndarray) -> np.ndarray:
    """Per-cell eta_K (NOT squared), cells in ``forest.sorted_leaves`` ==
    ``mesh`` ordering.  ``p``: Q1 nodal pressure (vertex values)."""
    records, leaves = forest.interior_faces()
    R = 2 ** forest.max_level
    sz = forest.upper - forest.lower
    eta2 = np.zeros(len(leaves))
    # 2-point Gauss on [0,1]
    gp = np.array([0.5 - 0.5 / np.sqrt(3), 0.5 + 0.5 / np.sqrt(3)])
    gw = np.array([0.5, 0.5])
    cellv = p[mesh.cells]                        # (E, 4) corner values

    for rec in records:
        a, b, axis, line, lo, span = rec
        t_axis = 1 - axis
        # physical face segment
        length = sz[t_axis] * span / R
        line_phys = forest.lower[axis] + sz[axis] * line / R
        lo_phys = forest.lower[t_axis] + sz[t_axis] * lo / R
        pts = np.zeros((2, 2))
        pts[:, axis] = line_phys
        pts[:, t_axis] = lo_phys + gp * length

        xa, ha = _cell_geom(leaves[a], forest, R)
        xb, hb = _cell_geom(leaves[b], forest, R)
        ga = _grad_at(pts, xa, ha, cellv[a])[:, axis]
        gb = _grad_at(pts, xb, hb, cellv[b])[:, axis]
        jump2 = (ga - gb) ** 2
        integral = length * np.sum(gw * jump2)
        # deal.II: each adjacent cell receives the face term with its own
        # face diameter factor h_F/24
        eta2[a] += (length / 24.0) * integral
        eta2[b] += (length / 24.0) * integral
    return np.sqrt(eta2)


def _grad_trilinear(points, x0, h, pv):
    """Gradient of the trilinear with corner values pv (lex order, x
    fastest) at physical points (Np, 3) inside the cell at x0, size h."""
    xi = (points - x0) / h                       # in [0,1]^3
    V = pv.reshape(2, 2, 2)                      # [z, y, x]
    w = [np.stack([1 - xi[:, d], xi[:, d]]) for d in range(3)]  # (2, Np)
    g = np.zeros((points.shape[0], 3))
    # derivative along physical axis d = difference along numpy axis 2-d,
    # blended bilinearly over the other two axes
    for d in range(3):
        dV = np.take(V, 1, axis=2 - d) - np.take(V, 0, axis=2 - d)  # (2,2)
        rem = [a for a in (2, 1, 0) if a != d]   # physical labels of dV dims
        acc = np.zeros(points.shape[0])
        for i0 in range(2):
            for i1 in range(2):
                acc += dV[i0, i1] * w[rem[0]][i0] * w[rem[1]][i1]
        g[:, d] = acc / h[d]
    return g


def kelly_estimate_3d(forest, mesh, p: np.ndarray) -> np.ndarray:
    """3D Kelly indicator: face-jump integrals of the normal derivative of
    the Q1 pressure over all interior quad faces, 2x2 Gauss per fine face
    square; eta_K^2 accumulates (h_F / 24) * integral per adjacent cell
    (h_F = face diameter), matching the 2D convention and deal.II's
    ``KellyErrorEstimator`` (PoroelasticityFSS.h:452-458)."""
    records, leaves = forest.interior_faces()
    R = 2 ** forest.max_level
    lo_phys = forest.lower
    sz = forest.upper - forest.lower
    eta2 = np.zeros(len(leaves))
    gp = np.array([0.5 - 0.5 / np.sqrt(3), 0.5 + 0.5 / np.sqrt(3)])
    cellv = p[mesh.cells]                        # (E, 8)

    def cell_geom(leaf):
        l = leaf[0]
        s = R // (2 ** l)
        x0 = lo_phys + sz * np.array([v * s for v in leaf[1:]]) / R
        return x0, sz * s / R

    for rec in records:
        t1, t2 = [a for a in range(3) if a != rec.axis]
        a1 = sz[t1] * rec.span / R               # physical side lengths
        a2 = sz[t2] * rec.span / R
        area = a1 * a2
        diam = float(np.hypot(a1, a2))
        plane_phys = lo_phys[rec.axis] + sz[rec.axis] * rec.plane / R
        lo1_phys = lo_phys[t1] + sz[t1] * rec.lo1 / R
        lo2_phys = lo_phys[t2] + sz[t2] * rec.lo2 / R
        pts = np.zeros((4, 3))
        pts[:, rec.axis] = plane_phys
        pts[:, t1] = lo1_phys + np.repeat(gp, 2) * a1
        pts[:, t2] = lo2_phys + np.tile(gp, 2) * a2

        xa, ha = cell_geom(leaves[rec.cell_a])
        xb, hb = cell_geom(leaves[rec.cell_b])
        ga = _grad_trilinear(pts, xa, ha, cellv[rec.cell_a])[:, rec.axis]
        gb = _grad_trilinear(pts, xb, hb, cellv[rec.cell_b])[:, rec.axis]
        integral = area * np.mean((ga - gb) ** 2)   # 4 equal Gauss weights
        eta2[rec.cell_a] += (diam / 24.0) * integral
        eta2[rec.cell_b] += (diam / 24.0) * integral
    return np.sqrt(eta2)


def fixed_fraction_marks(forest: QuadForest, eta: np.ndarray,
                         top_fraction: float = 0.6,
                         bottom_fraction: float = 0.4,
                         min_level: int = 0,
                         max_level: int = 30) -> Tuple[Set, Set]:
    """deal.II ``refine_and_coarsen_fixed_fraction`` semantics: refine the
    smallest cell set carrying ``top_fraction`` of the total error, coarsen
    the largest bottom set carrying at most ``bottom_fraction``; then apply
    the reference's level clamps (``PoroelasticityFSS.h:463-472``)."""
    leaves = forest.sorted_leaves()
    order = np.argsort(eta)[::-1]
    total = eta.sum()
    refine, coarsen = set(), set()
    if total > 0:
        csum = np.cumsum(eta[order])
        n_ref = int(np.searchsorted(csum, top_fraction * total) + 1)
        n_ref = min(n_ref, len(leaves))
        refine = {leaves[i] for i in order[:n_ref]}
        rev = order[::-1]
        csum_low = np.cumsum(eta[rev])
        n_coar = int(np.searchsorted(csum_low, bottom_fraction * total,
                                     side="right"))
        coarsen = {leaves[i] for i in rev[:n_coar]}
    # level clamps
    refine = {c for c in refine if c[0] < max_level}
    coarsen = {c for c in coarsen if c[0] > min_level}
    return refine, coarsen
