"""Fused hand-derived residual+Jacobian for the incompressible NS Q2/Q1
block — the framework's hottest element kernel (BASELINE config #1 and the
velocity/pressure core of configs #2-#5).

Why this exists: the generic path AD's the per-element residual
(``jax.jacfwd`` with ~22 tangents, ``fem/assembly.py``). That is exact and
fully general, but every intermediate carries tiny trailing axes
((nq, dim, dim) etc.), so on TPU the vector lanes are ~2/128 occupied —
measured 231 ms for the 4096-element cavity Jacobian, ~27x slower than one
C++ core. This module computes the same residual and exact Jacobian with
the ELEMENT axis LAST: every operation is elementwise/broadcast over a
trailing ``ne`` axis that XLA maps onto the 128-wide lanes, with the small
q/i/j/a/b axes unrolled or riding the sublanes. The Jacobian entries are the
hand-derived linearization (matching the reference's hand-coded ``lec->J``
of ``src/mm_fill_momentum.c:98`` / ``src/mm_fill_continuity.c:113``), and
are verified against the AD path in tests (the ``mm_numjac`` idea, AD as
the oracle).

Scope (recognized by ``match_ns_q2q1``): one 2D block, equations exactly
[Momentum(dim=2), Continuity], any nodal velocity/pressure interpolation
pair, Galerkin terms only (no SUPG/PSPG/VE/DEVSS/body force/mass source),
constant scalar rho/mu, fixed geometry (no ALE), optional transient term
(ct/hist). Everything else falls back to the generic AD path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_tables(problem, bi: int):
    """Host-precomputed geometry tables for a fixed-geometry block, laid out
    element-last: gphi (nq, nbf_u, dim, ne), gpsi (nq, nbf_p, dim, ne),
    w (nq, ne), plus the constant basis values N_u (nq, nbf_u),
    N_p (nq, nbf_p)."""
    from goma_tpu.elements import element_type, eval_basis, geom_interp, volume_rule

    bd = problem.dofmap.blocks[bi]
    blk = problem.mesh.blocks[bi]
    et = element_type(blk.elem_type)
    qpts, qwts = volume_rule(et.family, problem.quad_order)
    gi = geom_interp(et)
    Ng, dNg = eval_basis(et.family, gi, qpts)
    X = problem.mesh.coords[blk.conn]  # (ne, nn, dim)
    Jm = np.einsum("qnd,enk->eqkd", dNg, X)
    detJ = np.linalg.det(Jm)
    invJ = np.linalg.inv(Jm)  # (ne, nq, d, k): dxi_d/dx_k

    su = bd.slot("velocity")
    sp = bd.slot("pressure")
    Nu, dNu = eval_basis(et.family, su.interp, qpts)
    Np_, dNp = eval_basis(et.family, sp.interp, qpts)
    gphi = np.einsum("qnd,eqdk->qnke", dNu, invJ)  # (nq, nbf_u, dim, ne)
    gpsi = np.einsum("qnd,eqdk->qnke", dNp, invJ)
    w = (qwts[None, :] * detJ).T  # (nq, ne)
    return {
        "fns:gphi": gphi.astype(np.float64),
        "fns:gpsi": gpsi.astype(np.float64),
        "fns:w": w.astype(np.float64),
    }, {"Nu": Nu, "Np": Np_, "su": (su.start, su.size, su.nbf),
        "sp": (sp.start, sp.size, sp.nbf)}


def match_ns_q2q1(problem, bi: int):
    """Return static meta if block bi is the recognized NS Galerkin block."""
    from goma_tpu.fem.fields import MESH_VAR
    from goma_tpu.physics.fluid import Continuity, Momentum

    bd = problem.dofmap.blocks[bi]
    eqs = problem.equations[bi]
    if len(eqs) != 2:
        return None
    mom = next((e for e in eqs if type(e) is Momentum), None)
    con = next((e for e in eqs if type(e) is Continuity), None)
    if mom is None or con is None or mom.dim != 2:
        return None
    if (mom.ve_stress_modes or mom.logconf_modes or mom.sqrtconf_modes
            or mom.supg > 0.0 or mom.devss_mu > 0.0 or con.pspg > 0.0):
        return None
    mat = problem.materials[bi]
    rho, mu = mat.get("rho", 1.0), mat.get("mu", None)
    if callable(rho) or callable(mu) or mu is None:
        return None
    if mat.get("body_force") is not None or mat.get("mass_source") is not None:
        return None
    if any(s.var == MESH_VAR for s in bd.slots):
        return None
    if bd.edge_signs is not None or problem.external_fields:
        return None
    if getattr(problem, "coord", "cartesian") != "cartesian":
        return None  # axisymmetric hoop terms live in the generic path
    from goma_tpu.elements import element_type

    if element_type(bd.elem_type).dim != 2:
        return None
    return {
        "rho": float(rho), "mu": float(mu),
        "transient": bool(mom.transient), "convection": bool(mom.convection),
    }


def ns_q2q1_rj(q, hist, T, meta, static, ct, dtype, with_jac=True):
    """Residual (ne, nl) and exact Jacobian (ne, nl, nl) of the NS Galerkin
    block, computed element-last.

    q, hist: (ne, nl) gathered local dofs (velocity comp-major then pressure,
    the dofmap slot layout). T: device tables from :func:`build_tables`.
    """
    rho = jnp.asarray(meta["rho"], dtype=dtype)
    mu = jnp.asarray(meta["mu"], dtype=dtype)
    ct = jnp.asarray(ct, dtype=dtype)
    u0, usz, nbu = static["su"]
    p0, psz, nbp = static["sp"]
    ne, nl = q.shape
    qT = q.astype(dtype).T  # (nl, ne)
    hT = hist.astype(dtype).T
    gphi = T["fns:gphi"].astype(dtype)  # (nq, nbu, 2, ne)
    gpsi = T["fns:gpsi"].astype(dtype)
    w = T["fns:w"].astype(dtype)  # (nq, ne)
    Nu = jnp.asarray(static["Nu"], dtype=dtype)  # (nq, nbu)
    Np_ = jnp.asarray(static["Np"], dtype=dtype)  # (nq, nbp)
    nq = Nu.shape[0]

    uu = qT[u0:u0 + usz].reshape(2, nbu, ne)
    pp = qT[p0:p0 + psz].reshape(nbp, ne)
    hu = hT[u0:u0 + usz].reshape(2, nbu, ne)

    # field evaluation, element-last
    uval = jnp.einsum("qi,aie->qae", Nu, uu)            # (nq, 2, ne)
    gu = jnp.einsum("qike,aie->qake", gphi, uu)         # (nq, 2, 2, ne)
    pval = jnp.einsum("qj,je->qe", Np_, pp)             # (nq, ne)
    udot = ct * uval + jnp.einsum("qi,aie->qae", Nu, hu)

    r_u = jnp.zeros((2, nbu, ne), dtype=dtype)
    r_p = jnp.zeros((nbp, ne), dtype=dtype)
    if with_jac:
        Juu = jnp.zeros((2, nbu, 2, nbu, ne), dtype=dtype)
        Jup = jnp.zeros((2, nbu, nbp, ne), dtype=dtype)
        Jpu = jnp.zeros((nbp, 2, nbu, ne), dtype=dtype)

    eye2 = jnp.eye(2, dtype=dtype)

    # quadrature loop as lax.fori_loop: an unrolled 9-point loop of 5-D
    # broadcast ops produced a pathologically slow remote compile (~6 min
    # measured); the rolled loop compiles ~an order of magnitude faster at
    # the same runtime (the per-iteration work is thousands of lanes wide)
    def qstep(iq, carry):
        r_u, r_p, Juu, Jup, Jpu = carry
        take = lambda a: jax.lax.dynamic_index_in_dim(a, iq, 0, keepdims=False)
        wq = take(w)                    # (ne,)
        g = take(gphi)                  # (nbu, 2, ne)
        Ni = take(Nu)                   # (nbu,)
        Pj = take(Np_)                  # (nbp,)
        uq = take(uval)                 # (2, ne)
        guq = take(gu)                  # (2, 2, ne)
        pq = take(pval)                 # (ne,)

        inert = jnp.zeros((2, ne), dtype=dtype)
        if meta["transient"]:
            inert = inert + take(udot)
        if meta["convection"]:
            inert = inert + jnp.einsum("ke,ake->ae", uq, guq)
        # sigma = mu (gu + gu^T) - p I
        sig = mu * (guq + jnp.swapaxes(guq, 0, 1)) - pq[None, None, :] * eye2[:, :, None]
        # r_u[a,i] += w (rho inert_a N_i + sigma[a,k] g[i,k])
        r_u = r_u + wq * (rho * inert[:, None, :] * Ni[None, :, None]
                          + jnp.einsum("ake,ike->aie", sig, g))
        divu = guq[0, 0] + guq[1, 1]
        r_p = r_p + (wq * divu)[None, :] * Pj[:, None]

        if with_jac:
            # --- velocity-velocity block
            # cg[j] = u . grad(phi_j); gg[i,j] = grad(phi_i) . grad(phi_j)
            if meta["convection"]:
                cg = jnp.einsum("ke,jke->je", uq, g)    # (nbu, ne)
                # delta_ab rho N_i cg_j  +  rho gu[a,b] N_i N_j
                conv_d = rho * Ni[:, None, None] * cg[None, :, :]  # (i,j,ne)
                NN = Ni[:, None] * Ni[None, :]                     # (i,j)
                conv_ab = rho * NN[None, None, :, :, None] * \
                    guq[:, :, None, None, :]
            gg = jnp.einsum("ike,jke->ije", g, g)       # (i, j, ne)
            visc_d = mu * gg                            # delta_ab part
            # mu g[i,b] g[j,a] cross part -> (a, b, i, j, ne)
            visc_ab = mu * jnp.einsum("ibe,jae->abije", g, g)
            diag = visc_d
            if meta["convection"]:
                diag = diag + conv_d
            if meta["transient"]:
                diag = diag + rho * ct * (Ni[:, None] * Ni[None, :])[:, :, None]
            block = visc_ab + eye2[:, :, None, None, None] * diag[None, None]
            if meta["convection"]:
                block = block + conv_ab
            Juu = Juu + wq * jnp.transpose(block, (0, 2, 1, 3, 4))  # (a,i,b,j,ne)
            # --- velocity-pressure: -w g[i,a] P_j
            Jup = Jup - wq * jnp.einsum("iae,j->aije", g, Pj)
            # --- pressure-velocity: w P_j' g[j,b]
            Jpu = Jpu + wq * jnp.einsum("j,ibe->jbie", Pj, g)
        return (r_u, r_p, Juu, Jup, Jpu)

    if not with_jac:
        Juu = Jup = Jpu = jnp.zeros((0,), dtype=dtype)
    r_u, r_p, Juu, Jup, Jpu = jax.lax.fori_loop(
        0, nq, qstep, (r_u, r_p, Juu, Jup, Jpu))

    R = jnp.concatenate([r_u.reshape(usz, ne), r_p], axis=0)  # (nl, ne)
    # restore the slot layout in case velocity/pressure aren't contiguous
    # from 0 (they are in practice: slots are [velocity, pressure])
    if u0 != 0 or p0 != usz:
        full = jnp.zeros((nl, ne), dtype=dtype)
        full = full.at[u0:u0 + usz].set(R[:usz])
        full = full.at[p0:p0 + psz].set(R[usz:])
        R = full
    r_out = R.T  # (ne, nl)
    if not with_jac:
        return r_out, None
    J = jnp.zeros((nl, nl, ne), dtype=dtype)
    J = J.at[u0:u0 + usz, u0:u0 + usz].set(Juu.reshape(usz, usz, ne))
    J = J.at[u0:u0 + usz, p0:p0 + psz].set(Jup.reshape(usz, nbp, ne))
    J = J.at[p0:p0 + psz, u0:u0 + usz].set(Jpu.reshape(nbp, usz, ne))
    return r_out, jnp.transpose(J, (2, 0, 1))  # (ne, nl, nl)
