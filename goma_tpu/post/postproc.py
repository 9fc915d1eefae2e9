"""Post-processing: side-set flux/force integrals, volume integrals, derived
nodal fields (stream function via an auxiliary solve).

Parity: reference ``src/mm_flux.c`` (``evaluate_flux:114`` side-set integrals,
``evaluate_volume_integral:4113``) and ``src/mm_post_proc.c``
(``post_process_nodal:4216``, stream function & friends via global L2
projection / auxiliary solves). These feed augmenting conditions exactly as
in the reference (AC_FLUX/AC_VOLUME).

All integrals are jitted device reductions over the same vmapped face/volume
machinery the assembler uses.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from goma_tpu.fem.assembly import Problem, eval_surfacevars
from goma_tpu.fem.fields import eval_fieldvars


def sideset_integral(problem: Problem, sideset: str, integrand: Callable):
    """Build a jitted function f(x, params) -> value integrating
    ``integrand(sfv, mat, params)`` (shape (nq,) or (nq, k)) over a side set.

    Examples: heat flux ``-k n.grad T``, force ``sigma.n``, flow rate
    ``u.n``. Reference: evaluate_flux (src/mm_flux.c:114).
    """
    fsets = problem._build_face_set(sideset, kernels=[])
    dtype = problem.dtype
    dim = problem.mesh.dim

    def f(x, params):
        x = jnp.asarray(x).astype(dtype)
        hist = params["hist"]
        total = None
        for fs in fsets:
            bd = problem.dofmap.blocks[fs.block_index]
            blk = problem.mesh.blocks[fs.block_index]
            mat = problem.materials[fs.block_index]
            fe = fs.face_elems
            gather = jnp.asarray(bd.gather[fe], dtype=jnp.int32)
            Xref = jnp.asarray(problem.mesh.coords[blk.conn[fe]], dtype=dtype)
            ftabs = {k: jnp.asarray(v, dtype=dtype) for k, v in fs.ftabs.items()}
            fwts = jnp.asarray(fs.fwts, dtype=dtype)

            def one_face(q_e, h_e, X_e, ftab):
                qdot_e = params["ct"] * q_e + h_e
                sfv = eval_surfacevars(q_e, qdot_e, X_e, ftab, fwts, bd.slots,
                                       dim, dtype, problem.coord)
                g = integrand(sfv, mat, params)
                g = jnp.asarray(g)
                if g.ndim == 1:
                    return jnp.sum(sfv.wdA * g)
                return jnp.einsum("q,qk->k", sfv.wdA, g)

            vals = jax.vmap(one_face, in_axes=(0, 0, 0, 0))(
                x[gather], hist[gather], Xref, ftabs
            )
            s = jnp.sum(vals, axis=0)
            total = s if total is None else total + s
        return total

    return jax.jit(f)


def volume_integral(problem: Problem, integrand: Callable, blocks=None):
    """Jitted f(x, params) -> integral of ``integrand(fv, mat, params)`` over
    the (current, possibly displaced) volume.
    Reference: evaluate_volume_integral (src/mm_flux.c:4113)."""
    dtype = problem.dtype
    idxs = range(len(problem.mesh.blocks)) if blocks is None else blocks

    def f(x, params):
        x = jnp.asarray(x).astype(dtype)
        hist = params["hist"]
        total = None
        for bi in idxs:
            bd = problem.dofmap.blocks[bi]
            blk = problem.mesh.blocks[bi]
            mat = problem.materials[bi]
            tables = problem.tables[bi]
            gather = jnp.asarray(bd.gather, dtype=jnp.int32)
            Xref = jnp.asarray(problem.mesh.coords[blk.conn], dtype=dtype)
            conn = jnp.asarray(blk.conn, dtype=jnp.int32)
            ext = problem._ext_gather(params, conn)

            def one_elem(q_e, h_e, X_e, ext_e):
                qdot_e = params["ct"] * q_e + h_e
                fv = eval_fieldvars(q_e, qdot_e, X_e, tables, bd.slots, dtype,
                                    ext_e, problem.external_fields,
                                    problem.coord)
                g = jnp.asarray(integrand(fv, mat, params))
                if g.ndim == 1:
                    return jnp.sum(fv.wdetJ * g)
                return jnp.einsum("q,qk->k", fv.wdetJ, g)

            vals = jax.vmap(one_elem, in_axes=(0, 0, 0, 0))(
                x[gather], hist[gather], Xref, ext
            )
            s = jnp.sum(vals, axis=0)
            total = s if total is None else total + s
        return total

    return jax.jit(f)


def flux_sensitivity(problem, flux_fn, x, params, wrt: str):
    """Total sensitivity dF/dp of a flux/volume integral F = f(x(p), p) with
    respect to a scalar parameter ``params[wrt]`` (BC value, material
    constant, ...).

    Reference parity: ``evaluate_flux_sens`` (``src/mm_flux.c:5792``) — there
    via stored solution sensitivities (``soln_sens``,
    ``src/mm_sol_nonlinear.c:3119``); here via AD:

        dF/dp = (dF/dx) . w + dF/dp|_x,   J w = -dR/dp   (adjoint-free jvp)

    ``flux_fn`` is a function f(x, params) -> scalar/vector (e.g. the output
    of :func:`sideset_integral` / :func:`volume_integral`). The linear solve
    is the host direct path (sensitivities are a post-processing step).
    """
    from goma_tpu.solvers.linear import direct_solve_host

    x = jnp.asarray(x, dtype=problem.dtype)
    p0 = jnp.asarray(params[wrt], dtype=problem.dtype)
    if p0.ndim != 0:
        raise ValueError(f"flux_sensitivity: params[{wrt!r}] must be scalar")

    def R_of_p(pv):
        pr = dict(params)
        pr[wrt] = pv
        return problem._assemble(x, pr)[0]

    _, dRdp = jax.jvp(R_of_p, (p0,), (jnp.ones((), dtype=p0.dtype),))
    _, vals = problem._assemble(x, params)
    w = direct_solve_host(problem.pattern, np.asarray(vals, dtype=np.float64),
                          -np.asarray(dRdp, dtype=np.float64))

    def F_of(xv, pv):
        pr = dict(params)
        pr[wrt] = pv
        return flux_fn(xv, pr)

    _, dF = jax.jvp(F_of, (x, p0),
                    (jnp.asarray(w, dtype=x.dtype), jnp.ones((), dtype=p0.dtype)))
    return np.asarray(jax.device_get(dF))


# ------------------------------------------------------------ derived fields
def traction_integrand(comp: int | None = None):
    """sigma.n on a face for Newtonian flow; returns (nq, dim) or (nq,).

    Convention: n is the outward normal of the domain, so the integral is the
    force exerted ON the fluid BY the boundary; negate for the force the
    fluid exerts on the wall (reference FORCE_X/FORCE_Y flux cards)."""

    def f(sfv, mat, params):
        from goma_tpu.physics.materials import prop

        mu = prop(mat, "mu", sfv, params)
        gu = sfv.grad["velocity"]
        p = sfv.val["pressure"][:, 0]
        d = gu.shape[-1]
        sig = mu * (gu + jnp.swapaxes(gu, 1, 2)) - p[:, None, None] * jnp.eye(d)[None]
        t = jnp.einsum("qak,qk->qa", sig, sfv.normal)
        return t if comp is None else t[:, comp]

    return f


def flow_rate(sfv, mat, params):
    """u . n over a face (volumetric flow through the side set)."""
    return jnp.einsum("qk,qk->q", sfv.val["velocity"], sfv.normal)


def heat_flux(sfv, mat, params):
    from goma_tpu.physics.materials import prop

    k = prop(mat, "k", sfv, params, 1.0)
    gT = sfv.grad["temperature"][:, 0, :]
    return -k * jnp.einsum("qk,qk->q", gT, sfv.normal)


def stream_function(problem: Problem, x, walls=("left", "right", "top", "bottom"),
                    psi_ref=0.0):
    """Stream function psi from a velocity solution: solve lap(psi) = -omega
    with psi = psi_ref on the given wall node sets (2D only).

    Reference: stream function post variable (src/mm_post_proc.c).
    Returns per-node psi.
    """
    from goma_tpu.fem import Problem as P
    from goma_tpu.physics import Energy

    assert problem.mesh.dim == 2
    ux = problem.get_nodal_field(x, "velocity", 0, fill=0.0)
    uy = problem.get_nodal_field(x, "velocity", 1, fill=0.0)

    def vorticity_source(fv, mat, params):
        # -lap psi = omega ->  Energy kernel solves -div(k grad T) = H
        return fv.ext_grad["uy"][:, 0] - fv.ext_grad["ux"][:, 1]

    aux = P(
        problem.mesh,
        [Energy(interp="Q2" if _has_q2(problem) else "Q1", transient=False,
                convection=False)],
        {"k": 1.0, "heat_source": vorticity_source},
        external_fields=("ux", "uy"),
    )
    for w in walls:
        aux.add_dirichlet(w, "temperature", 0, psi_ref)
    aux.finalize()
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    params = aux.base_params(ext_ux=jnp.asarray(ux, dtype=aux.dtype),
                             ext_uy=jnp.asarray(uy, dtype=aux.dtype))
    res = NewtonSolver(
        aux, NewtonOptions(max_iter=3, tol_residual=1e-10, linear_tol=1e-11,
                           linear_maxiter=2000)
    ).solve(np.zeros(aux.dofmap.n_dof), params)
    return aux.get_nodal_field(res.x, "temperature")


def _has_q2(problem):
    return any(s.interp in ("Q2", "P2") for b in problem.dofmap.blocks for s in b.slots)
