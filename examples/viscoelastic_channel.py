"""BASELINE config #4: viscoelastic (Oldroyd-B / Giesekus / log-conformation)
pressure-driven channel flow, EVSS-F with SUPG + DEVSS.

Analytic steady solution for Oldroyd-B Poiseuille flow with shear rate
gd(y) = G(H-2y)/(2 mu_tot): S12 = mu_p gd, S11 = 2 lam mu_p gd^2.

Run: python examples/viscoelastic_channel.py [model]   (oldroyd_b|giesekus|logconf)
"""

import sys

import numpy as np


def run(model="oldroyd_b", n=8, lam=0.3, mu_p=1.0, mu_s=0.5, G=2.0, H=1.0,
        linear_solver="direct"):
    from goma_tpu.fem import Problem
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import (
        Continuity,
        LogConformationStress,
        Momentum,
        VelocityGradientProjection,
        VEStress,
    )
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mu_tot = mu_p + mu_s
    mesh = rectangle_mesh(2 * n, n, elem="QUAD9", xlim=(0, 2.0), ylim=(0, H))
    mesh.nodesets["pin"] = np.array([0], dtype=np.int32)

    if model == "logconf":
        eqs = [
            Momentum(dim=2, transient=False, convection=False,
                     logconf_modes=((0, lam, mu_p),), devss_mu=mu_p,
                     supg=0.0),
            Continuity(),
            LogConformationStress(0, lam=lam, mu_p=mu_p, interp="Q1", transient=False),
            VelocityGradientProjection(dim=2, interp="Q1"),
        ]
    else:
        eqs = [
            Momentum(dim=2, transient=False, convection=False,
                     ve_stress_modes=1, devss_mu=mu_p),
            Continuity(),
            VEStress(0, dim=2, lam=lam, mu_p=mu_p, model=model,
                     alpha=0.3 if model == "giesekus" else 0.0,
                     interp="Q1", transient=False),
            VelocityGradientProjection(dim=2, interp="Q1"),
        ]
    prob = Problem(mesh, eqs, {"rho": 0.0, "mu": mu_s,
                               "body_force": np.array([G, 0.0])})
    uex = lambda c: G / (2 * mu_tot) * c[:, 1] * (H - c[:, 1])
    for ns in ("top", "bottom"):
        prob.add_dirichlet(ns, "velocity", 0, 0.0)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    for ns in ("left", "right"):
        prob.add_dirichlet(ns, "velocity", 0, uex)
        prob.add_dirichlet(ns, "velocity", 1, 0.0)
    prob.add_dirichlet("pin", "pressure", 0, 0.0)
    prob.finalize()

    x0 = prob.set_nodal_field(np.zeros(prob.dofmap.n_dof), "velocity", 0, uex)
    if model == "logconf":
        # Psi = log(c) is degenerate (c = I) at rest, where AD through the
        # eigendecomposition is ill-posed; start from the analytic profile
        gd_n = G * (H - 2 * mesh.coords[:, 1]) / (2 * mu_tot)
        psi = np.zeros((mesh.n_nodes, 3))
        for i, gd in enumerate(gd_n):
            c = np.array([[1 + 2 * (lam * gd) ** 2, lam * gd], [lam * gd, 1.0]])
            w, v = np.linalg.eigh(c + 1e-8 * np.eye(2))
            P = v @ np.diag(np.log(w)) @ v.T
            psi[i] = [P[0, 0], P[0, 1], P[1, 1]]
        for comp in range(3):
            x0 = prob.set_nodal_field(x0, "logconf0", comp, psi[:, comp])
    res = NewtonSolver(
        prob, NewtonOptions(max_iter=25, tol_residual=1e-9,
                            linear_solver=linear_solver)
    ).solve(x0, prob.base_params())
    assert res.converged, res.summary()
    return prob, res


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "oldroyd_b"
    lam, mu_p, mu_s, G, H = 0.3, 1.0, 0.5, 2.0, 1.0
    prob, res = run(model, lam=lam, mu_p=mu_p, mu_s=mu_s, G=G, H=H)
    print(res.summary())
    mesh = prob.mesh
    if model == "logconf":
        from goma_tpu.physics.viscoelastic import _sym_expand
        p11 = prob.get_nodal_field(res.x, "logconf0", 0)
        print("log-conformation solved; Psi11 range:",
              np.nanmin(p11).round(4), np.nanmax(p11).round(4))
    else:
        s12 = prob.get_nodal_field(res.x, "stress0", 1)
        ok = ~np.isnan(s12)
        y = mesh.coords[ok, 1]
        gd = G * (H - 2 * y) / (2 * (mu_p + mu_s))
        if model == "oldroyd_b":
            err = np.max(np.abs(s12[ok] - mu_p * gd))
            print(f"S12 vs analytic Oldroyd-B Poiseuille: max err {err:.2e}")
