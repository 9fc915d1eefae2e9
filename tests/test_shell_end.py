"""Bar-endpoint (point) face kernels — the curve-shell end-BC machinery
(reference: SHELL_GRAD_* endpoint closures, src/mm_shell_bc.c; special end
BCs src/bc_special.c:77)."""

import numpy as np
import jax.numpy as jnp

from goma_tpu.bc import EndpointAdvectiveOutflow, EndpointFlux, shell_end_sidesets
from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.physics import ReynoldsFilm, ShellConduction, attach_shell_block
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def _direct(prob, x0=None):
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=6, tol_residual=1e-11,
                            linear_solver="direct")
    ).solve(np.zeros(prob.dofmap.n_dof) if x0 is None else x0,
            prob.base_params())
    assert res.converged
    return res


def test_reynolds_film_end_flux_exact():
    """Flat-gap Reynolds film, flux Q specified at the left end, pressure
    pinned at the right: the volumetric flux q = -h^3/(12 mu) p' + U h/2 is
    constant = -Q (left outward normal is -x), so p is linear with slope
    p' = (U h / 2 + Q) 12 mu / h^3."""
    mu, U, h, L, Q = 0.3, 1.2, 0.15, 2.0, 0.05
    mesh = rectangle_mesh(16, 1, elem="QUAD9", xlim=(0, L), ylim=(0, 0.05))
    bi = attach_shell_block(mesh, "bottom", "film")
    ends = shell_end_sidesets(mesh, bi, prefix="film_end")
    assert len(ends) == 2  # ordered by x: film_end_0 at x=0, film_end_1 at x=L
    eqs = [[], [ReynoldsFilm(interp="Q2")]]
    prob = Problem(mesh, eqs, [{}, {"gap": h, "mu_lub": mu,
                                    "wall_velocity": np.array([U, 0.0])}])
    prob.add_face_kernel("film_end_0", EndpointFlux("lub_pressure", Q))
    right = np.array([n for n in mesh.nodesets["bottom"]
                      if abs(mesh.coords[n, 0] - L) < 1e-12], dtype=np.int32)
    mesh.nodesets["film_right"] = right
    prob.add_dirichlet("film_right", "lub_pressure", 0, 0.0)
    prob.finalize()
    res = _direct(prob)
    p = prob.get_nodal_field(res.x, "lub_pressure")
    bot = mesh.nodesets["bottom"]
    xb = mesh.coords[bot, 0]
    dpdx = (U * h / 2 + Q) * 12 * mu / h**3
    np.testing.assert_allclose(p[bot], dpdx * (xb - L), rtol=1e-9, atol=1e-9)


def test_conduction_end_flux_on_curved_arc():
    """Laplace-Beltrami conduction on a curved boundary with an endpoint
    flux: T is linear in ARC LENGTH regardless of the curve's shape —
    checks the endpoint conormal/measure on a genuinely curved bar chain."""
    # bottom boundary deformed into an arc y = 0.2 sin(pi x / L)
    L, ks, g = 1.0, 2.5, 0.7
    mesh = rectangle_mesh(24, 2, elem="QUAD9", xlim=(0, L))
    y0 = mesh.coords[:, 1].copy()
    mesh.coords[:, 1] = y0 + 0.2 * np.sin(np.pi * mesh.coords[:, 0] / L) * (1 - y0)
    bi = attach_shell_block(mesh, "bottom", "wire")
    ends = shell_end_sidesets(mesh, bi, prefix="wire_end")
    eqs = [[], [ShellConduction(ks, var="temperature", interp="Q2")]]
    prob = Problem(mesh, eqs, [{}, {}])
    # outward heat flux -ks dT/ds = g at the right end; T=0 pinned at left
    prob.add_face_kernel("wire_end_1", EndpointFlux("temperature", g))
    left = np.array([n for n in mesh.nodesets["bottom"]
                     if abs(mesh.coords[n, 0]) < 1e-12], dtype=np.int32)
    mesh.nodesets["wire_left"] = left
    prob.add_dirichlet("wire_left", "temperature", 0, 0.0)
    prob.finalize()
    res = _direct(prob)
    T = prob.get_nodal_field(res.x, "temperature")
    # arc length along the bottom, computed from the shell block's own nodes
    blk = mesh.blocks[bi]
    nodes = np.unique(blk.conn)
    order = np.argsort(mesh.coords[nodes, 0])
    nd = nodes[order]
    seg = np.linalg.norm(np.diff(mesh.coords[nd], axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    # exact: T(s) = -(g/ks) s (flux conservation: -ks T' = g everywhere)
    np.testing.assert_allclose(T[nd], -(g / ks) * s, rtol=5e-4, atol=5e-5)


def test_endpoint_advective_outflow_conserves():
    """Advection-diffusion along a film with an advective outflow closure:
    steady state of c_t + (U c - D c')' = 0 with inflow flux F at the left
    endpoint and open outflow at the right has constant total flux F;
    far from the inlet boundary layer, c -> F / U."""
    U, D, L, F = 2.0, 0.05, 4.0, 1.0
    mesh = rectangle_mesh(80, 1, elem="QUAD9", xlim=(0, L), ylim=(0, 0.02))
    bi = attach_shell_block(mesh, "bottom", "film")
    shell_end_sidesets(mesh, bi, prefix="ad_end")

    from goma_tpu.fem.equations import Equation

    class CurveAdvDiff(Equation):
        """int (U c - D c') . grad(phi) ds (conservative weak form, so
        endpoint closures are exactly the boundary flux terms)."""

        def __init__(self):
            super().__init__("conc", 1, "Q2")

        def residual(self, fv, mat, params):
            c = fv.val["conc"][:, 0]
            gc = fv.grad["conc"][:, 0, :]
            u = jnp.broadcast_to(jnp.asarray(mat["u_adv"], dtype=c.dtype),
                                 (c.shape[0], fv.x.shape[1]))
            flux = u * c[:, None] - mat["D"] * gc
            return -jnp.einsum("qk,qik->qi", flux, fv.gphi["conc"])[:, None, :]

    eqs = [[], [CurveAdvDiff()]]
    prob = Problem(mesh, eqs, [{}, {"u_adv": np.array([U, 0.0]), "D": D}])
    # inflow: total flux . n_out = -F at the left endpoint
    prob.add_face_kernel("ad_end_0", EndpointFlux("conc", -F))
    # outflow: advective closure (u.n) c, diffusive flux dropped (open)
    prob.add_face_kernel(
        "ad_end_1", EndpointAdvectiveOutflow("conc", velocity="u_adv"))
    prob.finalize()
    res = _direct(prob)
    c = prob.get_nodal_field(res.x, "conc")
    bot = mesh.nodesets["bottom"]
    xb = mesh.coords[bot, 0]
    mid = bot[(xb > 1.0) & (xb < 3.5)]
    np.testing.assert_allclose(c[mid], F / U, rtol=1e-6)
