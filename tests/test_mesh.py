"""Mesh generator tests: element volumes via isoparametric quadrature sum to
the domain measure; side sets cover boundary with correct measure/orientation."""

import numpy as np
import pytest

from goma_tpu.elements import element_type, eval_basis, face_rule, faces, geom_interp, volume_rule
from goma_tpu.mesh import box_mesh, rectangle_mesh


def mesh_volume(mesh):
    vol = 0.0
    for b in mesh.blocks:
        et = element_type(b.elem_type)
        pts, wts = volume_rule(et.family, 3)
        _, dN = eval_basis(et.family, geom_interp(et), pts)
        X = mesh.coords[b.conn]  # (ne, nn, dim)
        # J[q] = dN[q].T @ X  -> (ne, nq, dim, dim)
        J = np.einsum("qnd,enk->eqdk", dN, X)
        detJ = np.linalg.det(J)
        assert np.all(detJ > 0), "negative element volume"
        vol += np.sum(detJ * wts[None, :])
    return vol


def sideset_measure(mesh, name):
    ss = mesh.sidesets[name]
    total = 0.0
    for e, f in zip(ss.elems, ss.faces):
        bi, le = mesh.global_elem_block(int(e))
        b = mesh.blocks[bi]
        et = element_type(b.elem_type)
        face = faces(et.family)[int(f)]
        fpts, fwts = face_rule(et.family, 3)
        epts = face.ref_map(fpts)
        _, dN = eval_basis(et.family, geom_interp(et), epts)
        X = mesh.coords[b.conn[le]]
        J = np.einsum("qnd,nk->qkd", dN, X)  # dx/dxi (dim, dim)
        T = np.einsum("qkd,dm->qkm", J, face.ref_jac)  # surface tangents (dim, dim-1)
        if mesh.dim == 2:
            dA = np.linalg.norm(T[:, :, 0], axis=1)
        else:
            dA = np.linalg.norm(np.cross(T[:, :, 0], T[:, :, 1]), axis=1)
        total += np.sum(dA * fwts)
    return total


@pytest.mark.parametrize("elem", ["QUAD4", "QUAD9", "TRI3", "TRI6"])
def test_rectangle(elem):
    mesh = rectangle_mesh(3, 4, elem=elem, xlim=(0, 2.0), ylim=(0, 1.5))
    np.testing.assert_allclose(mesh_volume(mesh), 3.0, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "bottom"), 2.0, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "top"), 2.0, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "left"), 1.5, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "right"), 1.5, rtol=1e-12)
    # nodesets nonempty and on the right coordinates
    assert np.allclose(mesh.coords[mesh.nodesets["left"], 0], 0.0)
    assert np.allclose(mesh.coords[mesh.nodesets["top"], 1], 1.5)


@pytest.mark.parametrize("elem", ["HEX8", "HEX27"])
def test_box(elem):
    mesh = box_mesh(2, 2, 3, elem=elem, xlim=(0, 1), ylim=(0, 2), zlim=(0, 1))
    np.testing.assert_allclose(mesh_volume(mesh), 2.0, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "top"), 2.0, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "left"), 2.0, rtol=1e-12)
    np.testing.assert_allclose(sideset_measure(mesh, "front"), 1.0, rtol=1e-12)


def test_sideset_nodes():
    mesh = rectangle_mesh(2, 2, elem="QUAD9")
    ns = mesh.sideset_nodes("top")
    assert np.allclose(mesh.coords[ns, 1], 1.0)
    assert len(ns) == 5  # 2*2+1 nodes along top for quadratic mesh
