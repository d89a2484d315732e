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


def build_vertices_3d(nx=7, ny=6, nz=5, L=10.0, seed=11):
    """Graded + warped + jittered hex-grid vertices on the 10 m cube."""
    def graded(n, ratio):
        w = ratio ** np.arange(n)
        edges = np.concatenate([[0.0], np.cumsum(w)])
        return edges / edges[-1] * L - L / 2
    xs, ys, zs = graded(nx, 1.25), graded(ny, 0.8), graded(nz, 1.15)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    def bump(A, a):
        return (A - a[0]) * (a[-1] - A) / (L / 2) ** 2
    bx, by, bz = bump(X, xs), bump(Y, ys), bump(Z, zs)
    Xw = X + 0.5 * np.sin(2 * np.pi * Y / L) * bx * by * bz * L / 8
    Yw = Y + 0.4 * np.sin(2 * np.pi * Z / L + 0.5) * bx * by * bz * L / 8
    Zw = Z + 0.45 * np.sin(2 * np.pi * X / L + 1.1) * bx * by * bz * L / 8
    rng = np.random.default_rng(seed)
    h = min(np.diff(xs).min(), np.diff(ys).min(), np.diff(zs).min())
    interior = np.ones(X.shape, bool)
    for axis in range(3):
        sl = [slice(None)] * 3
        for end in (0, -1):
            sl[axis] = end
            interior[tuple(sl)] = False
    for W, jit in ((Xw, 0.22), (Yw, 0.22), (Zw, 0.22)):
        W[interior] += rng.uniform(-jit, jit, X.shape)[interior] * h
    return Xw, Yw, Zw, nx, ny, nz


def main_3d(out="configs/irregular_3d.msh"):
    X, Y, Z, nx, ny, nz = build_vertices_3d()
    nvx, nvy, nvz = nx + 1, ny + 1, nz + 1
    vid = lambda i, j, k: (k * nvy + j) * nvx + i + 1

    lines = []
    eid = 1
    # boundary quads, colorize ids: 0/1 x-low/high, 2/3 y, 4/5 z
    for k in range(nz):
        for j in range(ny):
            for i, pid in ((0, 0), (nx, 1)):
                lines.append(
                    f"{eid} 3 2 {pid} {pid} {vid(i, j, k)} {vid(i, j+1, k)} "
                    f"{vid(i, j+1, k+1)} {vid(i, j, k+1)}"); eid += 1
    for k in range(nz):
        for i in range(nx):
            for j, pid in ((0, 2), (ny, 3)):
                lines.append(
                    f"{eid} 3 2 {pid} {pid} {vid(i, j, k)} {vid(i+1, j, k)} "
                    f"{vid(i+1, j, k+1)} {vid(i, j, k+1)}"); eid += 1
    for j in range(ny):
        for i in range(nx):
            for k, pid in ((0, 4), (nz, 5)):
                lines.append(
                    f"{eid} 3 2 {pid} {pid} {vid(i, j, k)} {vid(i+1, j, k)} "
                    f"{vid(i+1, j+1, k)} {vid(i, j+1, k)}"); eid += 1
    # hexes, gmsh corner order (bottom quad ccw, then top quad)
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                lines.append(
                    f"{eid} 5 2 9 9 "
                    f"{vid(i, j, k)} {vid(i+1, j, k)} {vid(i+1, j+1, k)} "
                    f"{vid(i, j+1, k)} {vid(i, j, k+1)} {vid(i+1, j, k+1)} "
                    f"{vid(i+1, j+1, k+1)} {vid(i, j+1, k+1)}"); eid += 1

    with open(out, "w") as fh:
        fh.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        fh.write(f"{nvx * nvy * nvz}\n")
        for k in range(nvz):
            for j in range(nvy):
                for i in range(nvx):
                    fh.write(f"{vid(i, j, k)} {X[k, j, i]:.12g} "
                             f"{Y[k, j, i]:.12g} {Z[k, j, i]:.12g}\n")
        fh.write("$EndNodes\n$Elements\n")
        fh.write(f"{len(lines)}\n")
        fh.write("\n".join(lines) + "\n$EndElements\n")
    print(f"wrote {out}: {nvx * nvy * nvz} nodes, {nx * ny * nz} hexes")


if __name__ == "__main__":
    if "--3d" in sys.argv:
        main_3d(*[a for a in sys.argv[1:] if a != "--3d"])
    else:
        main(*sys.argv[1:])
