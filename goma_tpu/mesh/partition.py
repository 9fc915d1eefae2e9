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


def partition_elements(mesh: Mesh, nparts: int) -> np.ndarray:
    """(n_elem,) part id per global element, spatially compact and balanced."""
    return rcb_partition(element_centroids(mesh), nparts)


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
