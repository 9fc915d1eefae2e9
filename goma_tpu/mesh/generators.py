"""Structured mesh generators (host-side).

The reference reads Exodus II meshes produced by external tools (cubit etc.,
``src/rd_mesh.c``); for self-contained tests and benchmarks we also generate
structured meshes directly. Names of node/side sets: "left", "right",
"bottom", "top" (+ "front"/"back" in 3D).
"""

from __future__ import annotations

import numpy as np

from goma_tpu.mesh.mesh import Block, Mesh, SideSet


def rectangle_mesh(
    nx: int,
    ny: int,
    elem: str = "QUAD9",
    xlim=(0.0, 1.0),
    ylim=(0.0, 1.0),
) -> Mesh:
    if elem in ("QUAD9", "TRI6", "QUAD8"):
        gx, gy = 2 * nx + 1, 2 * ny + 1
    else:
        gx, gy = nx + 1, ny + 1
    xs = np.linspace(xlim[0], xlim[1], gx)
    ys = np.linspace(ylim[0], ylim[1], gy)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def nid(i, j):
        return j * gx + i

    stride = 2 if elem in ("QUAD9", "TRI6", "QUAD8") else 1

    quad_cells = []
    for ey in range(ny):
        for ex in range(nx):
            i0, j0 = stride * ex, stride * ey
            quad_cells.append((i0, j0))

    if elem == "QUAD4":
        conn = np.array(
            [[nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)] for i, j in quad_cells],
            dtype=np.int32,
        )
        blocks = [Block("body", "QUAD4", conn)]
    elif elem == "QUAD9":
        conn = np.array(
            [
                [
                    nid(i, j), nid(i + 2, j), nid(i + 2, j + 2), nid(i, j + 2),
                    nid(i + 1, j), nid(i + 2, j + 1), nid(i + 1, j + 2), nid(i, j + 1),
                    nid(i + 1, j + 1),
                ]
                for i, j in quad_cells
            ],
            dtype=np.int32,
        )
        blocks = [Block("body", "QUAD9", conn)]
    elif elem == "QUAD8":
        conn = np.array(
            [
                [
                    nid(i, j), nid(i + 2, j), nid(i + 2, j + 2), nid(i, j + 2),
                    nid(i + 1, j), nid(i + 2, j + 1), nid(i + 1, j + 2), nid(i, j + 1),
                ]
                for i, j in quad_cells
            ],
            dtype=np.int32,
        )
        # drop the unused cell-center nodes and compress numbering
        used = np.zeros(coords.shape[0], dtype=bool)
        used[conn.ravel()] = True
        remap = np.cumsum(used) - 1
        coords = coords[used]
        conn = remap[conn].astype(np.int32)
        blocks = [Block("body", "QUAD8", conn)]
    elif elem == "TRI3":
        conn = []
        for i, j in quad_cells:
            c = [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            conn.append([c[0], c[1], c[2]])
            conn.append([c[0], c[2], c[3]])
        blocks = [Block("body", "TRI3", np.array(conn, dtype=np.int32))]
    elif elem == "TRI6":
        conn = []
        for i, j in quad_cells:
            c = [nid(i, j), nid(i + 2, j), nid(i + 2, j + 2), nid(i, j + 2)]
            m = {
                "b": nid(i + 1, j), "r": nid(i + 2, j + 1),
                "t": nid(i + 1, j + 2), "l": nid(i, j + 1), "c": nid(i + 1, j + 1),
            }
            conn.append([c[0], c[1], c[2], m["b"], m["r"], m["c"]])
            conn.append([c[0], c[2], c[3], m["c"], m["t"], m["l"]])
        blocks = [Block("body", "TRI6", np.array(conn, dtype=np.int32))]
    else:
        raise ValueError(elem)

    mesh = Mesh(2, coords, blocks)
    eps = 1e-12 * max(abs(xlim[1] - xlim[0]), abs(ylim[1] - ylim[0]), 1.0)
    mesh.nodesets = {
        "left": np.where(np.abs(coords[:, 0] - xlim[0]) < eps)[0].astype(np.int32),
        "right": np.where(np.abs(coords[:, 0] - xlim[1]) < eps)[0].astype(np.int32),
        "bottom": np.where(np.abs(coords[:, 1] - ylim[0]) < eps)[0].astype(np.int32),
        "top": np.where(np.abs(coords[:, 1] - ylim[1]) < eps)[0].astype(np.int32),
    }

    # side sets
    def cell_id(ex, ey):
        return ey * nx + ex

    if elem in ("QUAD4", "QUAD8", "QUAD9"):
        sidesets = {
            "bottom": [(cell_id(ex, 0), 0) for ex in range(nx)],
            "right": [(cell_id(nx - 1, ey), 1) for ey in range(ny)],
            "top": [(cell_id(ex, ny - 1), 2) for ex in range(nx)],
            "left": [(cell_id(0, ey), 3) for ey in range(ny)],
        }
    else:  # triangles: cell -> elements (2*cell, 2*cell+1); A=(c0,c1,c2), B=(c0,c2,c3)
        sidesets = {
            "bottom": [(2 * cell_id(ex, 0), 0) for ex in range(nx)],
            "right": [(2 * cell_id(nx - 1, ey), 1) for ey in range(ny)],
            "top": [(2 * cell_id(ex, ny - 1) + 1, 1) for ex in range(nx)],
            "left": [(2 * cell_id(0, ey) + 1, 2) for ey in range(ny)],
        }
    mesh.sidesets = {
        k: SideSet(
            np.array([e for e, _ in v], dtype=np.int32),
            np.array([f for _, f in v], dtype=np.int32),
        )
        for k, v in sidesets.items()
    }
    return mesh


def box_mesh(
    nx: int,
    ny: int,
    nz: int,
    elem: str = "HEX27",
    xlim=(0.0, 1.0),
    ylim=(0.0, 1.0),
    zlim=(0.0, 1.0),
) -> Mesh:
    stride = 2 if elem in ("HEX27", "TET10", "HEX20") else 1
    gx, gy, gz = stride * nx + 1, stride * ny + 1, stride * nz + 1
    xs = np.linspace(xlim[0], xlim[1], gx)
    ys = np.linspace(ylim[0], ylim[1], gy)
    zs = np.linspace(zlim[0], zlim[1], gz)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    # node id = (k*gy + j)*gx + i
    coords = np.stack(
        [X.transpose(2, 1, 0).ravel(), Y.transpose(2, 1, 0).ravel(), Z.transpose(2, 1, 0).ravel()],
        axis=1,
    )

    def nid(i, j, k):
        return (k * gy + j) * gx + i

    cells = [(stride * ex, stride * ey, stride * ez)
             for ez in range(nz) for ey in range(ny) for ex in range(nx)]

    if elem == "HEX8":
        conn = np.array(
            [
                [
                    nid(i, j, k), nid(i + 1, j, k), nid(i + 1, j + 1, k), nid(i, j + 1, k),
                    nid(i, j, k + 1), nid(i + 1, j, k + 1), nid(i + 1, j + 1, k + 1), nid(i, j + 1, k + 1),
                ]
                for i, j, k in cells
            ],
            dtype=np.int32,
        )
        blocks = [Block("body", "HEX8", conn)]
    elif elem == "HEX27":
        offs = [
            (0, 0, 0), (2, 0, 0), (2, 2, 0), (0, 2, 0),
            (0, 0, 2), (2, 0, 2), (2, 2, 2), (0, 2, 2),
            (1, 0, 0), (2, 1, 0), (1, 2, 0), (0, 1, 0),
            (1, 0, 2), (2, 1, 2), (1, 2, 2), (0, 1, 2),
            (0, 0, 1), (2, 0, 1), (2, 2, 1), (0, 2, 1),
            (1, 1, 0), (1, 1, 2), (1, 0, 1), (2, 1, 1), (1, 2, 1), (0, 1, 1),
            (1, 1, 1),
        ]
        conn = np.array(
            [[nid(i + a, j + b, k + c) for a, b, c in offs] for i, j, k in cells],
            dtype=np.int32,
        )
        blocks = [Block("body", "HEX27", conn)]
    elif elem == "HEX20":
        offs = [
            (0, 0, 0), (2, 0, 0), (2, 2, 0), (0, 2, 0),
            (0, 0, 2), (2, 0, 2), (2, 2, 2), (0, 2, 2),
            (1, 0, 0), (2, 1, 0), (1, 2, 0), (0, 1, 0),
            (1, 0, 2), (2, 1, 2), (1, 2, 2), (0, 1, 2),
            (0, 0, 1), (2, 0, 1), (2, 2, 1), (0, 2, 1),
        ]
        conn = np.array(
            [[nid(i + a, j + b, k + c) for a, b, c in offs] for i, j, k in cells],
            dtype=np.int32,
        )
        used = np.zeros(coords.shape[0], dtype=bool)
        used[conn.ravel()] = True
        remap = np.cumsum(used) - 1
        coords = coords[used]
        conn = remap[conn].astype(np.int32)
        blocks = [Block("body", "HEX20", conn)]
    elif elem in ("TET4", "TET10"):
        # conforming Kuhn 6-tet decomposition of every grid cell: tets are
        # the monotone lattice paths 0 -> e_p0 -> e_p0+e_p1 -> (1,1,1), one
        # per axis permutation; identical in every cell, so shared cube
        # faces triangulate identically (conforming). TET10 midsides land
        # exactly on the stride-2 grid nodes.
        from itertools import permutations

        s = stride
        tedges = ((0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3))
        conn = []
        for i, j, k in cells:
            for perm in permutations(range(3)):
                offs = [np.zeros(3, dtype=int)]
                acc = np.zeros(3, dtype=int)
                for p in perm:
                    acc = acc.copy()
                    acc[p] = 1
                    offs.append(acc)
                # odd permutations give negative volume: swap verts 1,2
                par = (np.array(perm) != np.arange(3)).sum()
                if par == 2:  # one transposition away from identity
                    offs[1], offs[2] = offs[2], offs[1]
                verts = [nid(i + s * o[0], j + s * o[1], k + s * o[2])
                         for o in offs]
                if elem == "TET4":
                    conn.append(verts)
                else:
                    mids = []
                    for a, b in tedges:
                        om = offs[a] + offs[b]  # s=2: midpoint = offset sum
                        mids.append(nid(i + om[0], j + om[1], k + om[2]))
                    conn.append(verts + mids)
        conn = np.array(conn, dtype=np.int32)
        blocks = [Block("body", elem, conn)]
    else:
        raise ValueError(elem)

    mesh = Mesh(3, coords, blocks)
    eps = 1e-12
    mesh.nodesets = {
        "left": np.where(np.abs(coords[:, 0] - xlim[0]) < eps)[0].astype(np.int32),
        "right": np.where(np.abs(coords[:, 0] - xlim[1]) < eps)[0].astype(np.int32),
        "front": np.where(np.abs(coords[:, 1] - ylim[0]) < eps)[0].astype(np.int32),
        "back": np.where(np.abs(coords[:, 1] - ylim[1]) < eps)[0].astype(np.int32),
        "bottom": np.where(np.abs(coords[:, 2] - zlim[0]) < eps)[0].astype(np.int32),
        "top": np.where(np.abs(coords[:, 2] - zlim[1]) < eps)[0].astype(np.int32),
    }

    if elem in ("TET4", "TET10"):
        # boundary triangle faces, classified by coordinate plane
        # (outward-order face defs from elements/shapes.py _tet_faces)
        defs = ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2))
        c4 = blocks[0].conn[:, :4]
        facemap: dict = {}
        for e in range(c4.shape[0]):
            for f, nd in enumerate(defs):
                key = tuple(sorted(int(c4[e, i]) for i in nd))
                facemap.setdefault(key, []).append((e, f))
        planes = (("left", 0, xlim[0]), ("right", 0, xlim[1]),
                  ("front", 1, ylim[0]), ("back", 1, ylim[1]),
                  ("bottom", 2, zlim[0]), ("top", 2, zlim[1]))
        sides = {name: [] for name, _, _ in planes}
        for key, lst in facemap.items():
            if len(lst) != 1:
                continue
            pts = coords[list(key)]
            for name, ax, val in planes:
                if np.all(np.abs(pts[:, ax] - val) < eps):
                    sides[name].append(lst[0])
                    break
        mesh.sidesets = {
            k: SideSet(np.array([e for e, _ in v], dtype=np.int32),
                       np.array([f for _, f in v], dtype=np.int32))
            for k, v in sides.items()
        }
        return mesh

    def cell_id(ex, ey, ez):
        return (ez * ny + ey) * nx + ex

    # hex face order: 0:z- 1:z+ 2:y- 3:x+ 4:y+ 5:x-
    sidesets = {
        "bottom": [(cell_id(ex, ey, 0), 0) for ey in range(ny) for ex in range(nx)],
        "top": [(cell_id(ex, ey, nz - 1), 1) for ey in range(ny) for ex in range(nx)],
        "front": [(cell_id(ex, 0, ez), 2) for ez in range(nz) for ex in range(nx)],
        "right": [(cell_id(nx - 1, ey, ez), 3) for ez in range(nz) for ey in range(ny)],
        "back": [(cell_id(ex, ny - 1, ez), 4) for ez in range(nz) for ex in range(nx)],
        "left": [(cell_id(0, ey, ez), 5) for ez in range(nz) for ey in range(ny)],
    }
    mesh.sidesets = {
        k: SideSet(
            np.array([e for e, _ in v], dtype=np.int32),
            np.array([f for _, f in v], dtype=np.int32),
        )
        for k, v in sidesets.items()
    }
    return mesh
