"""Derived nodal post-variables (mm_post_proc.c post_process_nodal parity)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import Continuity, Energy, Momentum
from goma_tpu.post.derived import derived_nodal_field, project_to_nodes


def _flow_problem():
    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(
        mesh,
        [Momentum(2, transient=False), Continuity(),
         Energy(interp="Q2", transient=False, convection=False)],
        {"rho": 2.0, "mu": 0.5, "k": 3.0},
    )
    prob.finalize()
    return mesh, prob


def test_derived_fields_on_manufactured_state():
    mesh, prob = _flow_problem()
    x = np.zeros(prob.dofmap.n_dof)
    # u = (y^2, x), p = x + 2y, T = x^2
    x = prob.set_nodal_field(x, "velocity", 0, lambda X: X[:, 1] ** 2)
    x = prob.set_nodal_field(x, "velocity", 1, lambda X: X[:, 0])
    x = prob.set_nodal_field(x, "pressure", 0, lambda X: X[:, 0] + 2 * X[:, 1])
    x = prob.set_nodal_field(x, "temperature", 0, lambda X: X[:, 0] ** 2)

    X = mesh.coords
    vort = derived_nodal_field(prob, x, "VORTICITY")
    np.testing.assert_allclose(vort, 1.0 - 2 * X[:, 1], atol=1e-8)

    div = derived_nodal_field(prob, x, "DIV_VELOCITY")
    np.testing.assert_allclose(div, 0.0, atol=1e-8)

    gd = derived_nodal_field(prob, x, "SHEAR_RATE")
    np.testing.assert_allclose(gd, np.abs(2 * X[:, 1] + 1.0), atol=1e-6)

    p = derived_nodal_field(prob, x, "PRESSURE_NODAL")
    np.testing.assert_allclose(p, X[:, 0] + 2 * X[:, 1], atol=1e-8)

    tau = derived_nodal_field(prob, x, "STRESS_TENSOR")
    # tau = mu (gu + gu^T): tau_xx = 0, tau_xy = mu(2y + 1), tau_yy = 0
    np.testing.assert_allclose(tau[:, 0], 0.0, atol=1e-8)
    np.testing.assert_allclose(tau[:, 1], 0.5 * (2 * X[:, 1] + 1.0), atol=1e-8)
    np.testing.assert_allclose(tau[:, 2], 0.0, atol=1e-8)

    qf = derived_nodal_field(prob, x, "ENERGY_FLUX")
    np.testing.assert_allclose(qf[:, 0], -3.0 * 2 * X[:, 0], atol=1e-7)
    np.testing.assert_allclose(qf[:, 1], 0.0, atol=1e-8)

    ke = derived_nodal_field(prob, x, "KINETIC_ENERGY")
    np.testing.assert_allclose(ke, 0.5 * 2.0 * (X[:, 1] ** 4 + X[:, 0] ** 2),
                               atol=6e-2)  # quartic not in Q2: lumped-projection boundary error

    sp = derived_nodal_field(prob, x, "SPEED")
    np.testing.assert_allclose(sp, np.sqrt(X[:, 1] ** 4 + X[:, 0] ** 2), atol=4e-2)


def test_custom_projection():
    mesh, prob = _flow_problem()
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "temperature", 0,
                             lambda X: 3.0 * X[:, 1])
    out = project_to_nodes(prob, x,
                           lambda fv, mat, params: fv.grad["temperature"][:, 0, 1])
    np.testing.assert_allclose(out, 3.0, atol=1e-8)


def test_ls_normal_projection():
    """LS_NORMAL derived field (assemble_normals parity): nodal unit
    normals of a planar level set are exact."""
    from goma_tpu.fem import Problem
    from goma_tpu.fem.equations import Equation
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.post.derived import derived_nodal_field

    class Carrier(Equation):
        def __init__(self):
            super().__init__("fill", 1, "Q2")

        def residual(self, fv, mat, params):
            z = 0.0 * fv.val["fill"][:, :, None]
            return z * fv.phi["fill"][:, None, :]

    mesh = rectangle_mesh(5, 5, elem="QUAD9")
    prob = Problem(mesh, [Carrier()], {})
    prob.finalize()
    # F = (x + 2 y)/sqrt(5): unit normal (1, 2)/sqrt(5)
    f = (mesh.coords[:, 0] + 2 * mesh.coords[:, 1]) / np.sqrt(5)
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill", 0, f)
    n = derived_nodal_field(prob, x, "LS_NORMAL")
    np.testing.assert_allclose(n[:, 0], 1 / np.sqrt(5), atol=1e-10)
    np.testing.assert_allclose(n[:, 1], 2 / np.sqrt(5), atol=1e-10)


def test_density_viscosity_and_residual_fields():
    mesh, prob = _flow_problem()
    x = np.zeros(prob.dofmap.n_dof)
    x = prob.set_nodal_field(x, "velocity", 0, lambda X: X[:, 1] ** 2)
    x = prob.set_nodal_field(x, "temperature", 0, lambda X: X[:, 0] ** 2)

    rho = derived_nodal_field(prob, x, "DENSITY")
    np.testing.assert_allclose(rho, 2.0, atol=1e-10)
    mu = derived_nodal_field(prob, x, "VISCOSITY")
    np.testing.assert_allclose(mu, 0.5, atol=1e-10)

    from goma_tpu.post.derived import residual_nodal_field

    Rn = residual_nodal_field(prob, x, "velocity")
    assert Rn.shape == (mesh.n_nodes, 2)
    # the NS_RESIDUALS route returns the same map
    Rn2 = derived_nodal_field(prob, x, "NS_RESIDUALS")
    np.testing.assert_allclose(Rn, Rn2)
    # u=(y^2,0), mu=0.5: interior x-momentum residual = -mu u'' = -1 per
    # unit test-function mass; just assert interiors are nonzero, Dirichlet
    # masks absent (no BCs) -> all rows live
    assert np.abs(Rn[:, 0]).max() > 0


def test_porous_saturation_fields():
    from goma_tpu.physics import PorousFlow, VanGenuchten
    from goma_tpu.post.derived import derived_nodal_field

    mesh = rectangle_mesh(8, 8, elem="QUAD4")
    model = VanGenuchten(alpha=1.5, n=2.0)
    prob = Problem(mesh, [PorousFlow(model=model, interp="Q1",
                                     transient=False)],
                   {"permeability": 1.0, "mu": 1.0})
    prob.finalize()
    pfun = lambda X: -(0.5 + X[:, 1])
    x = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                             "porous_pressure", 0, pfun)
    X = mesh.coords
    # the lumped Q1 projection biases BOUNDARY nodes inward by ~h/3 (the
    # hat-function centroid), so assert exactly on interior nodes only
    interior = (X[:, 1] > 1e-9) & (X[:, 1] < 1 - 1e-9)
    s = derived_nodal_field(prob, x, "POROUS_SATURATION")
    np.testing.assert_allclose(
        s[interior],
        np.asarray(model.saturation(jnp.asarray(pfun(X[interior])))),
        atol=6e-3)
    pc = derived_nodal_field(prob, x, "CAPILLARY_PRESSURE")
    np.testing.assert_allclose(pc[interior], -pfun(X[interior]), atol=1e-8)
    kr = derived_nodal_field(prob, x, "REL_LIQ_PERM")
    np.testing.assert_allclose(
        kr[interior],
        np.asarray(model.krel(jnp.asarray(pfun(X[interior])))), atol=6e-3)


def test_strain_and_diffusion_fields():
    from goma_tpu.physics import LinearElasticMesh, Species

    mesh = rectangle_mesh(4, 4, elem="QUAD9")
    prob = Problem(
        mesh,
        [LinearElasticMesh(dim=2), Species(n_species=1, transient=False,
                                           convection=False)],
        {"diffusivity": 2.0})
    prob.finalize()
    x = np.zeros(prob.dofmap.n_dof)
    # d = (0.1 x, -0.05 y): eps = diag(0.1, -0.05)
    x = prob.set_nodal_field(x, "mesh_displacement", 0,
                             lambda X: 0.1 * X[:, 0])
    x = prob.set_nodal_field(x, "mesh_displacement", 1,
                             lambda X: -0.05 * X[:, 1])
    x = prob.set_nodal_field(x, "species", 0, lambda X: 3.0 * X[:, 0])

    eps = derived_nodal_field(prob, x, "STRAIN_TENSOR")
    np.testing.assert_allclose(eps[:, 0], 0.1, atol=1e-8)   # xx
    np.testing.assert_allclose(eps[:, 1], 0.0, atol=1e-8)   # xy
    np.testing.assert_allclose(eps[:, 2], -0.05, atol=1e-8)  # yy
    i1 = derived_nodal_field(prob, x, "FIRST_INVAR_STRAIN")
    np.testing.assert_allclose(i1, 0.05, atol=1e-8)
    i2 = derived_nodal_field(prob, x, "SEC_INVAR_STRAIN")
    np.testing.assert_allclose(i2, -0.005, atol=1e-8)

    # species gradient is taken in the DEFORMED (ALE) configuration:
    # x_def = 1.1 x, so dc/dx_def = 3/1.1
    dv = derived_nodal_field(prob, x, "DIFFUSION_VECTORS")
    np.testing.assert_allclose(dv[:, 0], -2.0 * 3.0 / 1.1, atol=1e-7)
    np.testing.assert_allclose(dv[:, 1], 0.0, atol=1e-7)
