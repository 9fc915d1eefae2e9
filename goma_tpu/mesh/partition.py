"""Element partitioning & locality reordering (host).

Parity: reference METIS decomposition (``src/metis_decomp.c``) — here RCB
(the reference's ``-rcb`` mode) over element centroids via the native C++
kernel, plus Morton-order element reordering so device gathers touch
compact dof ranges.
"""

from __future__ import annotations

import numpy as np

from goma_tpu.mesh.mesh import Mesh
from goma_tpu.native import morton_order, rcb_partition


def element_centroids(mesh: Mesh) -> np.ndarray:
    out = []
    for b in mesh.blocks:
        out.append(mesh.coords[b.conn].mean(axis=1))
    return np.concatenate(out, axis=0)


def element_dual_graph(mesh: Mesh, ncommon: int | None = None):
    """CSR element dual graph: elements are adjacent when they share at
    least ``ncommon`` nodes (default: mesh.dim, i.e. a full edge in 2D / a
    face-ish contact in 3D — the reference's METIS_MeshToDual ncommon
    semantics). Edge weight = number of shared nodes. Returns
    (xadj, adjncy, adjwgt)."""
    if ncommon is None:
        ncommon = mesh.dim
    ne_off, elems, nodes = 0, [], []
    for b in mesh.blocks:
        ne, nn = b.conn.shape
        elems.append(np.repeat(np.arange(ne_off, ne_off + ne), nn))
        nodes.append(b.conn.ravel())
        ne_off += ne
    elems = np.concatenate(elems).astype(np.int64)
    nodes = np.concatenate(nodes).astype(np.int64)
    order = np.argsort(nodes, kind="stable")
    nodes, elems = nodes[order], elems[order]
    starts = np.searchsorted(nodes, np.arange(mesh.coords.shape[0]))
    counts = np.diff(np.append(starts, nodes.shape[0]))
    K = int(counts.max()) if counts.size else 0
    pa, pb = [], []
    for i in range(K):
        for j in range(K):
            if i == j:
                continue
            sel = counts > max(i, j)
            if not sel.any():
                continue
            s = starts[sel]
            pa.append(elems[s + i])
            pb.append(elems[s + j])
    if not pa:
        xadj = np.zeros(ne_off + 1, dtype=np.int64)
        return xadj, np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.concatenate(pa)
    b = np.concatenate(pb)
    keys, wgt = np.unique(a * np.int64(ne_off) + b, return_counts=True)
    keep = wgt >= ncommon
    keys, wgt = keys[keep], wgt[keep]
    src = keys // ne_off
    dst = keys % ne_off
    xadj = np.zeros(ne_off + 1, dtype=np.int64)
    np.add.at(xadj, src + 1, 1)
    xadj = np.cumsum(xadj)
    return xadj, dst.astype(np.int64), wgt.astype(np.int64)


def recursive_bisection(xadj: np.ndarray, adjncy: np.ndarray,
                        adjwgt: np.ndarray, nparts: int) -> np.ndarray:
    """K-way partition by recursive FM bisection (nparts a power of two).
    Each level runs the native multilevel FM bisector on the subgraph."""
    from goma_tpu.native import bisect_partition

    n = xadj.shape[0] - 1
    out = np.zeros(n, dtype=np.int32)

    def rec(verts: np.ndarray, base: int, k: int) -> None:
        if k <= 1 or verts.shape[0] == 0:
            out[verts] = base
            return
        # subgraph extraction
        local = np.full(n, -1, dtype=np.int64)
        local[verts] = np.arange(verts.shape[0])
        deg = (xadj[verts + 1] - xadj[verts]).astype(np.int64)
        srcs = np.repeat(np.arange(verts.shape[0]), deg)
        offs = np.concatenate([np.arange(xadj[v], xadj[v + 1]) for v in verts]) \
            if verts.shape[0] else np.empty(0, np.int64)
        dst = local[adjncy[offs]]
        keep = dst >= 0
        srcs, dst, w = srcs[keep], dst[keep], adjwgt[offs][keep]
        sx = np.zeros(verts.shape[0] + 1, dtype=np.int64)
        np.add.at(sx, srcs + 1, 1)
        sx = np.cumsum(sx)
        part = bisect_partition(sx, dst.astype(np.int64), w.astype(np.int64))
        rec(verts[part == 0], base, k // 2)
        rec(verts[part == 1], base + k // 2, k // 2)

    rec(np.arange(n, dtype=np.int64), 0, nparts)
    return out


def partition_elements(mesh: Mesh, nparts: int, method: str = "kway") -> np.ndarray:
    """(n_elem,) part id per global element, balanced.

    method="kway": multilevel k-way over the element dual graph (the
    reference's METIS KWAY default, src/metis_decomp.c:372) — minimizes
    the edge cut, i.e. halo/ghost traffic of the partitioned-DOF sharding.
    method="rcb": recursive coordinate bisection of centroids (the -rcb
    mode); spatially compact, cheaper to build.
    method="auto": build the kway, rcb and (power-of-two) recursive-FM
    candidates and keep the smallest edge cut — halo traffic decides."""
    if method == "rcb":
        return rcb_partition(element_centroids(mesh), nparts)
    from goma_tpu.native import graph_edge_cut, kway_partition

    xadj, adjncy, adjwgt = element_dual_graph(mesh)
    if method == "kway":
        return kway_partition(xadj, adjncy, adjwgt, nparts)
    cands = [kway_partition(xadj, adjncy, adjwgt, nparts),
             rcb_partition(element_centroids(mesh), nparts)]
    if nparts & (nparts - 1) == 0:
        cands.append(recursive_bisection(xadj, adjncy, adjwgt, nparts))
    cuts = [graph_edge_cut(xadj, adjncy, adjwgt, p) for p in cands]
    return cands[int(np.argmin(cuts))]


def reorder_elements(mesh: Mesh, order_by: str = "morton", nparts: int | None = None) -> Mesh:
    """Return a mesh with elements of each block permuted for locality
    ("morton") or grouped by RCB partition then morton within parts
    ("partition"). Side sets are remapped."""
    cent = element_centroids(mesh)
    if order_by == "partition":
        assert nparts
        part = rcb_partition(cent, nparts)
        sub = morton_order(cent)
        key = part[sub].astype(np.int64)
        order = sub[np.argsort(key, kind="stable")]
    else:
        order = morton_order(cent)

    # order is a global-element permutation: new position i <- old element order[i]
    # split per block (blocks keep their element ranges contiguous)
    new_blocks = []
    offset = 0
    inv = np.empty(mesh.n_elem, dtype=np.int64)
    global_new = []
    for b in mesh.blocks:
        ids = np.arange(offset, offset + b.n_elem)
        in_block = order[np.isin(order, ids)]
        global_new.append(in_block)
        offset += b.n_elem
    global_new = np.concatenate(global_new)
    inv[global_new] = np.arange(mesh.n_elem)

    offset = 0
    for b in mesh.blocks:
        ids = global_new[(global_new >= offset) & (global_new < offset + b.n_elem)]
        local = ids - offset
        from goma_tpu.mesh.mesh import Block

        new_blocks.append(Block(b.name, b.elem_type, b.conn[local], b.material))
        offset += b.n_elem

    m2 = Mesh(mesh.dim, mesh.coords, new_blocks, dict(mesh.nodesets), {})
    from goma_tpu.mesh.mesh import SideSet

    for name, ss in mesh.sidesets.items():
        m2.sidesets[name] = SideSet(inv[ss.elems].astype(np.int32), ss.faces.copy())
    return m2
