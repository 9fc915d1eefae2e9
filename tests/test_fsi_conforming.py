"""Conforming fluid<->solid interface (SOLID_FLUID / FLUID_SOLID row moves,
src/bc_colloc.c:537 put_liquid_stress_in_solid): pressurized static fluid
compressing a linear-elastic solid column. Exact uniaxial-strain response:
interface displacement u = P0 Ls / (2G + lam)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.bc import FlowPressure
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.mesh.interface import find_interface_faces
from goma_tpu.mesh.mesh import Block, Mesh, SideSet
from goma_tpu.physics import Continuity, Momentum
from goma_tpu.physics.solid import SOLID_VAR, RealSolid, tie_fluid_solid
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _fsi_mesh(nx=8, ny=4, xsplit=1.0, L=2.0, H=1.0):
    m0 = rectangle_mesh(nx, ny, elem="QUAD9", xlim=(0, L), ylim=(0, H))
    blk = m0.blocks[0]
    xc = m0.coords[blk.conn].mean(axis=1)[:, 0]
    left = xc < xsplit
    mesh = Mesh(2, m0.coords, [
        Block("fluid", blk.elem_type, blk.conn[left]),
        Block("solid", blk.elem_type, blk.conn[~left]),
    ])
    c = mesh.coords
    mesh.nodesets = {
        "left": np.where(np.isclose(c[:, 0], 0.0))[0].astype(np.int32),
        "right": np.where(np.isclose(c[:, 0], L))[0].astype(np.int32),
        "iface": np.where(np.isclose(c[:, 0], xsplit))[0].astype(np.int32),
    }
    fn = np.unique(mesh.blocks[0].conn)
    sn = np.unique(mesh.blocks[1].conn)
    mesh.nodesets["fluid_tb"] = fn[
        (np.isclose(c[fn, 1], 0.0) | np.isclose(c[fn, 1], H))].astype(np.int32)
    mesh.nodesets["solid_tb"] = sn[
        (np.isclose(c[sn, 1], 0.0) | np.isclose(c[sn, 1], H))].astype(np.int32)
    mesh.sidesets = {}
    pairs = find_interface_faces(mesh, 0, 1)
    mesh.sidesets["iface_fluid"] = SideSet(elems=pairs.elems_a,
                                           faces=pairs.faces_a)
    # left inlet sideset of the fluid block (face 3 = x-min edge)
    fl = [e for e in range(mesh.blocks[0].n_elem)
          if np.isclose(c[mesh.blocks[0].conn[e]][:, 0].min(), 0.0)]
    mesh.sidesets["left"] = SideSet(
        elems=np.asarray(fl, dtype=np.int32),
        faces=np.full(len(fl), 3, dtype=np.int32))
    return mesh


def test_fsi_pressurized_column():
    P0, G, lam = 0.2, 10.0, 5.0
    L, xsplit = 2.0, 1.0
    mesh = _fsi_mesh()
    eqs = [[Momentum(dim=2, interp="Q2", transient=False, convection=False),
            Continuity(interp="Q1")],
           [RealSolid(dim=2, interp="Q2", model="linear")]]
    mats = [{"rho": 1.0, "mu": 1.0},
            {"lame_mu": G, "lame_lambda": lam}]
    prob = Problem(mesh, eqs, mats)
    # fluid: pressurized from the left, no-slip walls
    prob.add_face_kernel("left", FlowPressure(dim=2, p0=P0))
    prob.add_dirichlet("fluid_tb", "velocity", 0, 0.0)
    prob.add_dirichlet("fluid_tb", "velocity", 1, 0.0)
    # solid: fixed right end, uniaxial-strain side walls
    prob.add_dirichlet("right", SOLID_VAR, 0, 0.0)
    prob.add_dirichlet("right", SOLID_VAR, 1, 0.0)
    prob.add_dirichlet("solid_tb", SOLID_VAR, 1, 0.0)
    tie_fluid_solid(prob, "iface", dim=2)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=8, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    dx = prob.get_nodal_field(res.x, SOLID_VAR, 0)
    c = mesh.coords
    # exact uniaxial strain: u(x) = (P0/(2G+lam)) (L - x)
    sn = np.unique(mesh.blocks[1].conn)
    u_ex = P0 / (2 * G + lam) * (L - c[sn, 0])
    np.testing.assert_allclose(dx[sn], u_ex, atol=2e-5 * P0)
    # fluid stayed static with p = P0
    u = prob.get_nodal_field(res.x, "velocity", 0)
    fn = np.unique(mesh.blocks[0].conn)
    assert np.nanmax(np.abs(u[fn])) < 1e-6
    p = prob.get_nodal_field(res.x, "pressure", 0)
    pf = p[fn]
    np.testing.assert_allclose(pf[np.isfinite(pf)], P0, atol=1e-8)
