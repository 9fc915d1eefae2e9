"""AD-vs-FD Jacobian guard over this round's new kernel families
(the reference's mm_numjac role): sqrt-conformation stress, TFMP film pair,
overset FSI coupling rows, DG stress face terms, and the Hermite beam.
"""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.utils.numjac import numerical_jacobian_check


def _check(prob, x, n_columns=16, **kw):
    chk = numerical_jacobian_check(prob, x, prob.base_params(**kw),
                                   n_columns=n_columns)
    assert chk.ok, chk.report()


def test_numjac_sqrtconf():
    from goma_tpu.physics import Continuity, Momentum, SqrtConformationStress

    lam, mu_p = 0.4, 1.0
    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [
        Momentum(dim=2, interp="Q2", transient=False,
                 sqrtconf_modes=((0, lam, mu_p),)),
        Continuity(interp="Q1"),
        SqrtConformationStress(0, lam=lam, mu_p=mu_p, model="ptt_linear",
                               eps_ptt=0.1, interp="Q1", transient=False),
    ], {"rho": 1.0, "mu": 0.5})
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()
    rng = np.random.RandomState(3)
    x = 0.05 * rng.randn(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "bconf0", 0, 1.0)
    x = prob.set_nodal_field(x, "bconf0", 2, 1.0)
    _check(prob, x)


def test_numjac_tfmp():
    from goma_tpu.physics import attach_shell_block
    from goma_tpu.physics.lubrication import TFMPBound, TFMPMass

    mesh = rectangle_mesh(5, 1, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.05))
    attach_shell_block(mesh, "bottom", "film")
    prob = Problem(mesh, [[], [TFMPMass(interp="Q2", transient=True, supg=0.3),
                               TFMPBound(interp="Q2", transient=True)]],
                   [{}, {"gap": 0.5, "mu_l": 1.0, "mu_g": 0.5,
                         "rho_g": lambda P: 1.0 + 0.4 * P, "D_tfmp": 1e-3}])
    prob.finalize()
    rng = np.random.RandomState(5)
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "tfmp_sat", 0,
                             0.5 + 0.1 * rng.rand(mesh.n_nodes))
    x = prob.set_nodal_field(x, "tfmp_pres", 0, rng.rand(mesh.n_nodes))
    _check(prob, x, ct=jnp.asarray(2.0),
           hist=jnp.asarray(0.1 * rng.randn(prob.dofmap.n_dof)))


def test_numjac_overset_fsi():
    from goma_tpu.mesh.immersed import merge_mesh
    from goma_tpu.physics import (Continuity, Momentum, OversetLM, RealSolid,
                                  attach_shell_block)
    from goma_tpu.physics.overset import OversetFSI

    fluid = rectangle_mesh(3, 5, elem="QUAD9", xlim=(0, 0.6), ylim=(0, 1))
    fluid.nodesets["pin"] = np.array([0], dtype=np.int32)
    solid = rectangle_mesh(3, 2, elem="QUAD9", xlim=(0, 0.6), ylim=(0, 0.4))
    mesh = fluid
    sbi = merge_mesh(mesh, solid, prefix="s")
    bbi = attach_shell_block(mesh, "s:top", "ifc")
    prob = Problem(mesh, [
        [Momentum(dim=2, interp="Q2", transient=False, convection=False),
         Continuity(interp="Q1")],
        [RealSolid(dim=2, interp="Q2", model="linear")],
        [OversetLM(dim=2)],
    ], [{"rho": 1.0, "mu": 1.0},
        {"lame_mu": 2.0, "lame_lambda": 1.0, "solid_rho": 1.0}, {}])
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_overset(bbi, 0, OversetFSI(dim=2), solid=(sbi, "s:top"))
    prob.finalize()
    rng = np.random.RandomState(7)
    x = 0.02 * rng.randn(prob.dofmap.n_dof)
    _check(prob, x, ct=jnp.asarray(1.5),
           hist=jnp.asarray(0.05 * rng.randn(prob.dofmap.n_dof)))


def test_numjac_dg_stress():
    from goma_tpu.mesh.interface import interior_face_pairs
    from goma_tpu.physics import Continuity, Momentum, VEStress
    from goma_tpu.physics.viscoelastic import DGStressInflow, DGStressUpwind

    mesh = rectangle_mesh(4, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.5))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)
    prob = Problem(mesh, [
        Momentum(dim=2, interp="Q2", transient=False),
        Continuity(interp="Q1"),
        VEStress(0, dim=2, lam=0.3, mu_p=1.0, interp="P1E", supg=0.0,
                 use_projected_gradient=False, transient=False),
    ], {"rho": 1.0, "mu": 1.0})
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_interface_kernel(interior_face_pairs(mesh, 0),
                              DGStressUpwind(0, lam=0.3))
    prob.add_face_kernel("left", DGStressInflow(0, lam=0.3,
                                                s_in=(1.0, 0.2, 0.1)))
    prob.finalize()
    rng = np.random.RandomState(11)
    x = 0.1 * rng.randn(prob.dofmap.n_dof)
    _check(prob, x)


def test_numjac_hermite_beam():
    from goma_tpu.physics import attach_shell_block
    from goma_tpu.physics.shell import BeamBending

    mesh = rectangle_mesh(5, 1, elem="QUAD9", xlim=(0, 2), ylim=(0, 0.1))
    attach_shell_block(mesh, "bottom", "beam")
    blk = mesh.blocks[-1]
    blk.elem_type = "BAR2"
    blk.conn = blk.conn[:, :2].copy()
    prob = Problem(mesh, [[], [BeamBending(EI=2.0, load=1.0, tension=0.5)]],
                   [{}, {}])
    prob.finalize()
    rng = np.random.RandomState(13)
    x = 0.1 * rng.randn(prob.dofmap.n_dof)
    _check(prob, x)


def test_numjac_em_edge():
    """Edge-element curl-curl (quad, tri w/ signs, and 3D hex) AD columns
    match finite differences, incl. the sigma re/im coupling."""
    from goma_tpu.mesh import box_mesh
    from goma_tpu.physics import EMWaveEdge

    for elem, dim in (("QUAD9", 2), ("TRI6", 2)):
        mesh = rectangle_mesh(3, 3, elem=elem)
        prob = Problem(mesh, [EMWaveEdge("real", omega=2.0, dim=dim),
                              EMWaveEdge("imag", omega=2.0, dim=dim)],
                       {"mu_m": 1.0, "eps": 1.0, "sigma_em": 0.3})
        prob.finalize()
        rng = np.random.RandomState(17)
        x = 0.1 * rng.randn(prob.dofmap.n_dof)
        _check(prob, x, n_columns=12)

    mesh = box_mesh(2, 2, 2, elem="HEX27")
    prob = Problem(mesh, [EMWaveEdge("real", omega=1.5, dim=3)],
                   {"mu_m": 1.0, "eps": 1.0})
    prob.finalize()
    rng = np.random.RandomState(19)
    x = 0.1 * rng.randn(prob.dofmap.n_dof)
    _check(prob, x, n_columns=12)
