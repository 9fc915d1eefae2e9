"""Confined-lubrication <-> free-film junction (LUBP_SH_FP_MATCH +
LUBP_SH_FP_FLUX, src/mm_shell_bc.c:1667/1743): pressure continuity and flux
continuity at the node where a LUBP shell region meets a SHELL_FILMP
region. Exact piecewise-linear pressure with the flux-continuity kink."""

import numpy as np
import pytest

from goma_tpu.fem import Problem
from goma_tpu.mesh import rectangle_mesh
from goma_tpu.mesh.mesh import SideSet
from goma_tpu.physics import attach_shell_block
from goma_tpu.physics.lubrication import LUB_VAR, ReynoldsFilm, tie_lub_film
from goma_tpu.physics.shell_film import FILMH, FILMP, FilmHeight, FilmPressure
from goma_tpu.solvers import NewtonOptions, NewtonSolver


def test_lub_film_junction_flux_and_pressure_continuity():
    P0, H1, H2, mu = 1.0, 0.4, 0.3, 1.0
    xj = 0.5
    nx = 8
    mesh = rectangle_mesh(nx, 1, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.05))
    # split the bottom sideset at the junction
    ss = mesh.sidesets["bottom"]
    xc = np.array([mesh.coords[
        mesh.blocks[0].conn[e]][:, 0].mean() for e in ss.elems])
    left = xc < xj
    mesh.sidesets["bot_lub"] = SideSet(elems=ss.elems[left],
                                       faces=ss.faces[left])
    mesh.sidesets["bot_film"] = SideSet(elems=ss.elems[~left],
                                        faces=ss.faces[~left])
    bl = attach_shell_block(mesh, "bot_lub", "lub")
    bf = attach_shell_block(mesh, "bot_film", "film")

    eqs = [[] for _ in mesh.blocks]
    mats = [{} for _ in mesh.blocks]
    eqs[bl] = [ReynoldsFilm(interp="Q2")]
    mats[bl] = {"gap": H1, "mu_lub": mu}
    eqs[bf] = [FilmPressure(interp="Q2", transient=False),
               FilmHeight(interp="Q2")]
    mats[bf] = {"mu": mu, "sigma": 1.0}
    prob = Problem(mesh, eqs, mats)

    lub_nodes = np.unique(mesh.blocks[bl].conn)
    film_nodes = np.unique(mesh.blocks[bf].conn)
    junction = np.intersect1d(lub_nodes, film_nodes)
    assert junction.size == 1
    mesh.nodesets["junction"] = junction.astype(np.int32)
    mesh.nodesets["lub_in"] = lub_nodes[
        np.isclose(mesh.coords[lub_nodes, 0], 0.0)].astype(np.int32)
    mesh.nodesets["film_out"] = film_nodes[
        np.isclose(mesh.coords[film_nodes, 0], 1.0)].astype(np.int32)
    mesh.nodesets["film_all"] = film_nodes.astype(np.int32)

    prob.add_dirichlet("lub_in", LUB_VAR, 0, P0)
    prob.add_dirichlet("film_out", FILMP, 0, 0.0)
    # flat film: pin the height field (its equation rows become identities)
    prob.add_dirichlet("film_all", FILMH, 0, H2)
    tie_lub_film(prob, "junction")
    prob.finalize()
    # seed H = H2 (mobility ~ H^3: a zero start would be singular)
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), FILMH, 0, H2)
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=6, tol_residual=1e-11, linear_solver="direct")).solve(
        x0, prob.base_params())
    assert res.converged

    # exact: constant flux Q through both regions
    mA = H1**3 / (12.0 * mu)
    mB = H2**3 / (3.0 * mu)
    Q = P0 / (xj / mA + (1 - xj) / mB)
    p_lub = prob.get_nodal_field(res.x, LUB_VAR, 0)
    p_film = prob.get_nodal_field(res.x, FILMP, 0)
    c = mesh.coords
    for n in lub_nodes:
        exact = P0 - Q * c[n, 0] / mA
        assert abs(p_lub[n] - exact) < 1e-8 * P0, (n, p_lub[n], exact)
    for n in film_nodes:
        exact = Q * (1 - c[n, 0]) / mB
        assert abs(p_film[n] - exact) < 1e-8 * P0, (n, p_film[n], exact)
    # junction: pressure continuity (the MATCH row)
    j = junction[0]
    assert abs(p_lub[j] - p_film[j]) < 1e-10


def test_velo_normal_lub_end_flux():
    """VELO_NORMAL_LUB at a lubrication-shell endpoint: the bulk normal
    velocity at the feed point equals the film's mean end velocity
    v.n = q.n / H (lubflux=0). Drive the film with end-to-end pressure
    Dirichlets so q = H^3 P0/(12 mu L) exactly, and check the bulk corner
    velocity picks up q/H."""
    import jax.numpy as jnp
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.physics import Continuity, Momentum
    from goma_tpu.physics.lubrication import LubEndKinematic
    from goma_tpu.bc.shell_end import shell_end_sidesets

    P0, H, mu = 1.0, 0.3, 1.0
    L = 1.0
    mesh = rectangle_mesh(6, 3, elem="QUAD9", xlim=(0, L), ylim=(0, 0.3))
    bi = attach_shell_block(mesh, "bottom", "lub")
    eqs = [[Momentum(dim=2, interp="Q2", transient=False, convection=False),
            Continuity(interp="Q1")],
           [ReynoldsFilm(interp="Q2"), PassiveVar("velocity", 2, "Q2")]]
    mats = [{"rho": 1.0, "mu": mu},
            {"gap": H, "mu_lub": mu}]
    prob = Problem(mesh, eqs, mats)
    ends = shell_end_sidesets(mesh, bi, prefix="lub_end")
    lub_nodes = np.unique(mesh.blocks[bi].conn)
    mesh.nodesets["lub_in"] = lub_nodes[
        np.isclose(mesh.coords[lub_nodes, 0], 0.0)].astype(np.int32)
    mesh.nodesets["lub_out"] = lub_nodes[
        np.isclose(mesh.coords[lub_nodes, 0], L)].astype(np.int32)
    mesh.nodesets["pin"] = np.array([int(lub_nodes[1])], dtype=np.int32)
    prob.add_dirichlet("lub_in", LUB_VAR, 0, P0)
    prob.add_dirichlet("lub_out", LUB_VAR, 0, 0.0)
    # the x=1 endpoint node must stay free of velocity Dirichlet rows (the
    # end-kinematic penalty lives there; Dirichlet would wipe it)
    rn = mesh.nodesets["right"]
    mesh.nodesets["right_nc"] = rn[mesh.coords[rn, 1] > 1e-9].astype(np.int32)
    for ns in ("top", "left", "right_nc"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.add_face_kernel(ends[1], LubEndKinematic(
        dim=2, var="velocity", lubflux=0.0, penalty=1e8))
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(
        max_iter=6, tol_residual=1e-10, linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged
    q_exact = H**3 * P0 / (12.0 * mu * L)
    u = prob.get_nodal_field(res.x, "velocity", 0)
    end_node = lub_nodes[np.isclose(mesh.coords[lub_nodes, 0], L)]
    np.testing.assert_allclose(u[end_node], q_exact / H, rtol=1e-6)


def test_tfmp_free_flux_values():
    """SHELL_TFMP_FREE_LIQ/GAS: the endpoint kernels re-add exactly the
    analytic phase fluxes -(h^3/12 mu) Kr (dP/ds) n at a crafted linear-P,
    uniform-S state."""
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.physics.lubrication import (TFMP_P, TFMP_S, TFMPFreeFlux,
                                              TFMPBound, TFMPMass)
    from goma_tpu.bc.shell_end import shell_end_sidesets
    import jax.numpy as jnp

    h, mu_l, mu_g, S0, dPdx = 0.2, 1.5, 0.7, 0.4, 3.0
    mesh = rectangle_mesh(6, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.1))
    bi = attach_shell_block(mesh, "bottom", "tfmp")
    eqs = [[], [TFMPMass(interp="Q2", transient=False),
                TFMPBound(interp="Q2", transient=False)]]
    mats = [{}, {"gap": h, "mu_l": mu_l, "mu_g": mu_g}]
    prob = Problem(mesh, eqs, mats)
    ends = shell_end_sidesets(mesh, bi, prefix="tf_end")
    prob.add_face_kernel(ends[1], TFMPFreeFlux("liquid"))
    prob.add_face_kernel(ends[1], TFMPFreeFlux("gas"))
    sn = np.unique(mesh.blocks[bi].conn)
    mesh.nodesets["sn"] = sn.astype(np.int32)
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, TFMP_P, 0, dPdx * mesh.coords[:, 0])
    x0 = prob.set_nodal_field(x0, TFMP_S, 0, S0)
    R = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params()))
    dm = prob.dofmap
    # the interior weak rows telescope: total row sum = -(end fluxes added)
    # + the interior operator's own boundary defect; evaluate just the
    # endpoint-node rows' kernel contribution by comparing with/without
    prob2 = Problem(mesh, eqs, mats)
    prob2.finalize()
    R0 = np.asarray(prob2.residual(jnp.asarray(x0), prob2.base_params()))
    dR = R - R0
    q_l = -(h**3 / (12 * mu_l)) * S0**3 * dPdx
    q_g = -(h**3 / (12 * mu_g)) * (1 - S0) ** 3 * dPdx
    dS = dm.dof_of_node_svar[:, dm.svar(TFMP_S, 0)]
    dP = dm.dof_of_node_svar[:, dm.svar(TFMP_P, 0)]
    np.testing.assert_allclose(dR[dS[dS >= 0]].sum(), q_l, rtol=1e-12)
    np.testing.assert_allclose(dR[dP[dP >= 0]].sum(), q_g, rtol=1e-12)


def test_shell_flow_developed_penalty():
    """SHELL_FLOW_DEVELOPED: the endpoint penalty drives n.grad(P) -> 0;
    crafted sloped film pressure produces exactly penalty * dP/ds at the
    end row."""
    from goma_tpu.physics.lubrication import ShellFlowDeveloped
    from goma_tpu.physics.shell_film import FILMP, FilmPressure, FilmHeight
    from goma_tpu.bc.shell_end import shell_end_sidesets
    import jax.numpy as jnp

    dPdx = 2.5
    mesh = rectangle_mesh(6, 2, elem="QUAD9", xlim=(0, 1), ylim=(0, 0.1))
    bi = attach_shell_block(mesh, "bottom", "film")
    eqs = [[], [FilmPressure(interp="Q2", transient=False),
                FilmHeight(interp="Q2")]]
    mats = [{}, {"mu": 1.0, "sigma": 1.0}]
    prob = Problem(mesh, eqs, mats)
    ends = shell_end_sidesets(mesh, bi, prefix="fd_end")
    prob.add_face_kernel(ends[1], ShellFlowDeveloped(penalty=1e4))
    prob.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    x0 = prob.set_nodal_field(x0, FILMP, 0, dPdx * mesh.coords[:, 0])
    x0 = prob.set_nodal_field(x0, "film_height", 0, 0.5)
    prob2 = Problem(mesh, eqs, mats)
    prob2.finalize()
    R = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params()))
    R0 = np.asarray(prob2.residual(jnp.asarray(x0), prob2.base_params()))
    dm = prob.dofmap
    dP = dm.dof_of_node_svar[:, dm.svar(FILMP, 0)]
    diff = (R - R0)[dP[dP >= 0]]
    np.testing.assert_allclose(diff.sum(), 1e4 * dPdx, rtol=1e-12)


def test_shell_tangent_traction_and_lubp_load():
    """SH_S11_WEAK + SH_LUBP_SOLID: crafted-state row-sum checks — the
    tangent traction integrates to -(t.T) t per unit length, the lub
    pressure load to +scale p n."""
    from goma_tpu.bc.sheet import LubPressureLoad, ShellTangentTraction
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.fem.fields import MESH_VAR
    from goma_tpu.physics.mesh_motion import LinearElasticMesh
    import jax.numpy as jnp

    T = (2.0, 0.5)
    pl, scale = 1.3, 0.8
    mesh = rectangle_mesh(6, 3, elem="QUAD9")
    prob = Problem(mesh, [LinearElasticMesh(dim=2),
                          PassiveVar("lub_pressure", 1, "Q2")],
                   {"mesh_shear_modulus": 1.0, "mesh_lambda": 1.0})
    mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
    prob.add_dirichlet("all", "lub_pressure", 0, pl)
    prob.add_face_kernel("bottom", ShellTangentTraction(dim=2, traction=T))
    prob.add_face_kernel("bottom", LubPressureLoad(dim=2, scale=scale))
    prob.finalize()
    prob0 = Problem(mesh, [LinearElasticMesh(dim=2),
                           PassiveVar("lub_pressure", 1, "Q2")],
                    {"mesh_shear_modulus": 1.0, "mesh_lambda": 1.0})
    prob0.add_dirichlet("all", "lub_pressure", 0, pl)
    prob0.finalize()
    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof),
                              "lub_pressure", 0, pl)
    dR = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params())) - \
        np.asarray(prob0.residual(jnp.asarray(x0), prob0.base_params()))
    dm = prob.dofmap
    dx = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 0)]
    dy = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 1)]
    fx = dR[dx[dx >= 0]].sum()
    fy = dR[dy[dy >= 0]].sum()
    # residual = -(t.T) t phi (Traction convention: applied force (t.T)t);
    # invariant under t -> -t, so the row sum is deterministically
    # (-(t.T) t_x) = -2 per unit length; lub load rows: -scale p (n=(0,-1))
    np.testing.assert_allclose(fx, -2.0, rtol=1e-12)
    np.testing.assert_allclose(fy, -scale * pl, rtol=1e-12)


def test_sheet_weak_terms_and_shear_to_shell():
    """SH_SDET / SH_MESH2_WEAK / SHEAR_TO_SHELL crafted-state values: the
    sdet energy integrates to L/2 * factor on a unit-slope boundary, the
    dy_ds term to -dy_ds * L, and the bulk Couette shear loads mu*U into
    the tension rows."""
    from goma_tpu.bc.sheet import (SdetWeak, ShMesh2Weak,
                                   bulk_shear_to_tension)
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.fem.fields import MESH_VAR
    from goma_tpu.physics.mesh_motion import LinearElasticMesh
    from goma_tpu.physics.shell import ShellGradBC
    import jax.numpy as jnp

    mesh = rectangle_mesh(6, 3, elem="QUAD9")
    fac, dyds = 0.7, 1.4
    prob = Problem(mesh, [LinearElasticMesh(dim=2)],
                   {"mesh_shear_modulus": 1.0, "mesh_lambda": 1.0})
    prob.add_face_kernel("bottom", SdetWeak(dim=2, factor=fac))
    prob.add_face_kernel("bottom", ShMesh2Weak(dim=2, dy_ds=dyds))
    prob.finalize()
    prob0 = Problem(mesh, [LinearElasticMesh(dim=2)],
                    {"mesh_shear_modulus": 1.0, "mesh_lambda": 1.0})
    prob0.finalize()
    x0 = np.zeros(prob.dofmap.n_dof)
    dR = np.asarray(prob.residual(jnp.asarray(x0), prob.base_params())) - \
        np.asarray(prob0.residual(jnp.asarray(x0), prob0.base_params()))
    dm = prob.dofmap
    dx = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 0)]
    dy = dm.dof_of_node_svar[:, dm.svar(MESH_VAR, 1)]
    # undeformed bottom: detJ is the face arc Jacobian; int 1/2 detJ^2 phi
    # over the partition of unity = 1/2 * detJ * L with detJ = h/2 per
    # element mapping... integrate numerically instead: total = sum over
    # qps of 0.5 detJ^2 wdA; for uniform elements detJ = dx/2? assert
    # against the independently computed closed form 0.5*fac*detJ*L with
    # detJ = (1/6)/2
    # sdet = h/2 per face (xi in [-1,1]); total = 1/2 fac sdet^2 * L
    sdet = (1.0 / 6.0) / 2.0
    np.testing.assert_allclose(dR[dx[dx >= 0]].sum(),
                               0.5 * fac * sdet**2 * 1.0, rtol=1e-12)
    np.testing.assert_allclose(dR[dy[dy >= 0]].sum(), -dyds * 1.0,
                               rtol=1e-12)

    # SHEAR_TO_SHELL: Couette u = U y over the bottom shell: t.Pi.n = -+
    # mu U; check the tension-row load magnitude
    U, mu = 0.8, 1.3
    mesh2 = rectangle_mesh(6, 3, elem="QUAD9")
    bi = attach_shell_block(mesh2, "bottom", "web")
    eqs = [[PassiveVar("velocity", 2, "Q2"),
            PassiveVar("sh_tens", 1, "Q2", reg=1e-10)],
           [PassiveVar("sh_tens", 1, "Q2", reg=1e-10)]]
    p2 = Problem(mesh2, eqs, [{"mu": mu}, {}])
    mesh2.nodesets["all2"] = np.arange(mesh2.n_nodes, dtype=np.int32)
    p2.add_dirichlet("all2", "velocity", 0, lambda c: U * c[:, 1])
    p2.add_dirichlet("all2", "velocity", 1, 0.0)
    p2.add_face_kernel("bottom", ShellGradBC(
        "sh_tens", bulk_shear_to_tension(1.0)))
    p2.finalize()
    p0 = Problem(mesh2, eqs, [{"mu": mu}, {}])
    p0.add_dirichlet("all2", "velocity", 0, lambda c: U * c[:, 1])
    p0.add_dirichlet("all2", "velocity", 1, 0.0)
    p0.finalize()
    x0 = p2.set_nodal_field(np.zeros(p2.dofmap.n_dof), "velocity", 0,
                            U * mesh2.coords[:, 1])
    dR2 = np.asarray(p2.residual(jnp.asarray(x0), p2.base_params())) - \
        np.asarray(p0.residual(jnp.asarray(x0), p0.base_params()))
    dmT = p2.dofmap
    dT = dmT.dof_of_node_svar[:, dmT.svar("sh_tens", 0)]
    tot = dR2[dT[dT >= 0]].sum()
    # t.Pi.n with t = +-x, n = (0,-1): -(mu U); sign absorbed by |.|
    np.testing.assert_allclose(abs(tot), mu * U, rtol=1e-10)


def test_porous_ls_wicking_flux():
    """POR_LIQ_FLUX_FILL: wetted boundary (H=0) relaxes the porous liquid
    pressure to pc1 exactly (Robin balance with interior diffusion); dry
    boundary (H=1) leaves the no-flux solution untouched."""
    from goma_tpu.bc.porous_leak import PorousLSWickingFlux
    from goma_tpu.fem.equations import PassiveVar
    from goma_tpu.physics.porous import PorousFlow
    import jax.numpy as jnp

    pc1, perm_c = 2.5, 10.0
    for Fval, expect in ((-1.0, pc1), (1.0, 0.7)):
        mesh = rectangle_mesh(6, 2, elem="QUAD4", xlim=(0, 1), ylim=(0, 0.2))
        mesh.nodesets["all"] = np.arange(mesh.n_nodes, dtype=np.int32)
        eqs = [PorousFlow(interp="Q1", transient=False),
               PassiveVar("fill", 1, "Q1")]
        prob = Problem(mesh, eqs, {"permeability": 1.0, "mu_liquid": 1.0})
        prob.add_dirichlet("all", "fill", 0, Fval)
        if Fval > 0:
            prob.add_dirichlet("left", "porous_pressure", 0, 0.7)
        prob.add_face_kernel("right", PorousLSWickingFlux(
            perm_c=perm_c, pc1=pc1, eps=0.25))
        prob.finalize()
        x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "fill", 0,
                                  Fval)
        res = NewtonSolver(prob, NewtonOptions(
            max_iter=8, tol_residual=1e-11, linear_solver="direct")).solve(
            x0, prob.base_params())
        assert res.converged
        p = prob.get_nodal_field(res.x, "porous_pressure", 0)
        np.testing.assert_allclose(p[np.isfinite(p)], expect, atol=1e-8)
