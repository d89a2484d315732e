"""Generate the committed irregular 2D gmsh asset (configs/irregular_2d.msh).

A genuinely irregular all-quad mesh of the golden deck's 10 x 10 domain
(centered at the origin, boundary ids 0=x-min 1=x-max 2=y-min 3=y-max —
the deal.II colorize convention the golden deck's BC lists use, matching
``create_mesh``'s colorized ``hyper_rectangle``
/root/reference/lib/include/PoroelasticityFSS.h:419-435):
geometrically graded axis spacing, a smooth sinusoidal warp, and random
jitter of every interior vertex.  Every element is a different
non-axis-aligned quad; only the outer boundary stays on the bounding box
so the deck's boundary labels keep their meaning.

Deterministic (fixed seed): re-running reproduces the committed file.
Usage: python scripts/make_irregular_msh.py [out.msh]
"""

import sys

import numpy as np


def build_vertices(nx=13, ny=11, L=10.0, seed=7):
    # graded 1D spacings (geometric, ratio ~1.25)
    def graded(n, ratio):
        w = ratio ** np.arange(n)
        edges = np.concatenate([[0.0], np.cumsum(w)])
        return edges / edges[-1] * L - L / 2
    xs = graded(nx, 1.22)
    ys = graded(ny, 0.82)
    X, Y = np.meshgrid(xs, ys, indexing="xy")      # (ny+1, nx+1)
    # smooth warp (zero on the boundary)
    bx = (X - xs[0]) * (xs[-1] - X) / (L / 2) ** 2
    by = (Y - ys[0]) * (ys[-1] - Y) / (L / 2) ** 2
    Xw = X + 0.55 * np.sin(2 * np.pi * Y / L) * bx * by * (L / 10)
    Yw = Y + 0.45 * np.sin(2 * np.pi * X / L + 0.7) * bx * by * (L / 10)
    # random jitter of interior vertices
    rng = np.random.default_rng(seed)
    hx = np.min(np.diff(xs))
    hy = np.min(np.diff(ys))
    jx = rng.uniform(-0.25, 0.25, X.shape) * hx
    jy = rng.uniform(-0.25, 0.25, Y.shape) * hy
    interior = np.ones(X.shape, bool)
    interior[0, :] = interior[-1, :] = False
    interior[:, 0] = interior[:, -1] = False
    Xw[interior] += jx[interior]
    Yw[interior] += jy[interior]
    return Xw, Yw, nx, ny


def main(out="configs/irregular_2d.msh"):
    X, Y, nx, ny = build_vertices()
    nvx, nvy = nx + 1, ny + 1
    vid = lambda i, j: j * nvx + i + 1          # gmsh ids are 1-based

    lines = []
    eid = 1
    # boundary line elements, physical ids (deal.II colorize convention):
    # 0 = x-min (left), 1 = x-max (right), 2 = y-min (bottom), 3 = y-max
    for j in range(ny):
        lines.append(f"{eid} 1 2 0 0 {vid(0, j)} {vid(0, j + 1)}"); eid += 1
    for j in range(ny):
        lines.append(f"{eid} 1 2 1 1 {vid(nx, j)} {vid(nx, j + 1)}"); eid += 1
    for i in range(nx):
        lines.append(f"{eid} 1 2 2 2 {vid(i, 0)} {vid(i + 1, 0)}"); eid += 1
    for i in range(nx):
        lines.append(f"{eid} 1 2 3 3 {vid(i, ny)} {vid(i + 1, ny)}"); eid += 1
    # quads (counter-clockwise corner order)
    for j in range(ny):
        for i in range(nx):
            lines.append(f"{eid} 3 2 5 5 {vid(i, j)} {vid(i + 1, j)} "
                         f"{vid(i + 1, j + 1)} {vid(i, j + 1)}")
            eid += 1

    with open(out, "w") as fh:
        fh.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        fh.write(f"{nvx * nvy}\n")
        for j in range(nvy):
            for i in range(nvx):
                fh.write(f"{vid(i, j)} {X[j, i]:.12g} {Y[j, i]:.12g} 0\n")
        fh.write("$EndNodes\n$Elements\n")
        fh.write(f"{len(lines)}\n")
        fh.write("\n".join(lines) + "\n$EndElements\n")
    print(f"wrote {out}: {nvx * nvy} nodes, {nx * ny} quads")


if __name__ == "__main__":
    main(*sys.argv[1:])
