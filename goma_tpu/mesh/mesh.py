"""Mesh data structure (host-side; numpy).

Parity: the reference's ``Exo_DB`` struct (``include/exo_struct.h``) +
derived connectivity (``src/exo_conn.c``). Unlike the reference, the mesh is
*organized for vectorized assembly from the start*: elements grouped into
same-element-type blocks with dense (n_elem, nodes_per_elem) connectivity,
so every physics kernel can `vmap` over a whole block.

Node sets = named node id arrays (Dirichlet BCs); side sets = named
(global_elem, local_face) pair arrays (integrated/weak BCs), mirroring
Exodus II node/side sets (``src/rd_mesh.c``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from goma_tpu.elements import element_type


@dataclass
class Block:
    name: str
    elem_type: str  # key into elements.shapes registry
    conn: np.ndarray  # (n_elem, n_nodes_per_elem) int32, global node ids
    material: str = "default"

    @property
    def n_elem(self) -> int:
        return self.conn.shape[0]


@dataclass
class SideSet:
    """Faces: parallel arrays of global element ids and local face ids."""

    elems: np.ndarray  # (n_face,) int32 global element ids
    faces: np.ndarray  # (n_face,) int32 local face index


@dataclass
class Mesh:
    dim: int
    coords: np.ndarray  # (n_nodes, dim) float64
    blocks: list[Block]
    nodesets: dict[str, np.ndarray] = field(default_factory=dict)
    sidesets: dict[str, SideSet] = field(default_factory=dict)

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_elem(self) -> int:
        return sum(b.n_elem for b in self.blocks)

    def block_elem_offset(self, bi: int) -> int:
        return sum(b.n_elem for b in self.blocks[:bi])

    def global_elem_block(self, eid: int) -> tuple[int, int]:
        """global element id -> (block index, local element id)."""
        off = 0
        for bi, b in enumerate(self.blocks):
            if eid < off + b.n_elem:
                return bi, eid - off
            off += b.n_elem
        raise IndexError(eid)

    def nodeset_union(self, names) -> np.ndarray:
        ids = [self.nodesets[n] for n in names]
        return np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int32)

    def sideset_nodes(self, name: str) -> np.ndarray:
        """All nodes lying on the faces of a sideset (corner + higher-order)."""
        from goma_tpu.elements import faces as elem_faces, interp_local_nodes, geom_interp
        from goma_tpu.elements.shapes import eval_basis

        ss = self.sidesets[name]
        out = []
        for e, f in zip(ss.elems, ss.faces):
            bi, le = self.global_elem_block(int(e))
            b = self.blocks[bi]
            et = element_type(b.elem_type)
            face = elem_faces(et.family)[int(f)]
            # face nodes = parent nodes whose ref coords lie on the face plane
            out.extend(b.conn[le, list(_face_all_nodes(et, int(f)))])
        return np.unique(np.asarray(out, dtype=np.int32))


def _face_all_nodes(et, face_id: int) -> tuple[int, ...]:
    """All local node ids (incl. mid-side/face) lying on a given face."""
    from goma_tpu.elements import faces as elem_faces
    from goma_tpu.elements.shapes import _quad_nodes, _hex_nodes  # noqa

    face = elem_faces(et.family)[face_id]
    ref = _ref_nodes(et)
    # a node is on the face iff its ref coords satisfy the face's affine span
    p0 = face.ref_origin
    J = face.ref_jac  # (dim, dim-1)
    out = []
    for i in range(et.n_nodes):
        d = ref[i] - p0
        # least squares: is d in span(J)?
        coef, res, *_ = np.linalg.lstsq(J, d, rcond=None)
        resid = d - J @ coef
        if np.linalg.norm(resid) < 1e-12:
            # for tensor faces the param range is [-1,1]; simplex [0,1]
            out.append(i)
    return tuple(out)


def _ref_nodes(et) -> np.ndarray:
    from goma_tpu.elements.shapes import _quad_nodes, _hex_nodes

    if et.family == "quad":
        return _quad_nodes(et.order)
    if et.family == "hex":
        return _hex_nodes(et.order)
    if et.family == "tri":
        full = np.array([[0, 0], [1, 0], [0, 1], [0.5, 0], [0.5, 0.5], [0, 0.5]], float)
        return full[: et.n_nodes]
    if et.family == "tet":
        full = np.array(
            [
                [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                [0.5, 0, 0], [0.5, 0.5, 0], [0, 0.5, 0],
                [0, 0, 0.5], [0.5, 0, 0.5], [0, 0.5, 0.5],
            ],
            float,
        )
        return full[: et.n_nodes]
    if et.family == "bar":
        return np.array([[-1.0], [1.0], [0.0]])[: et.n_nodes]
    raise ValueError(et)
