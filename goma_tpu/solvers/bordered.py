"""Bordered Newton: designated dofs solved as augmenting conditions.

Parity: the reference's overlap AC variant of overset contact —
``src/mm_augc_util.c:2914 create_overlap_acs`` creates one augmenting
condition per overlap Lagrange-multiplier component and the Newton driver
solves them by BORDERING the base matrix
(``src/mm_sol_nonlinear.c:1523-1724``): k+1 base solves build the Schur
complement of the multiplier block. Here the SAME monolithic (R, J) the
framework already assembles is split at a dof mask — no separate AC
assembly is needed because AD already provides every coupling block the
reference hand-codes (bAC/cAC/dAC):

    [J_bb  B][dx]   [-R_b]     w0  = J_bb^-1 R_b,  W_j = J_bb^-1 B_j
    [C     D][dl] = [-R_l]  => S   = D - C W
                               dl  = -S^-1 (R_l - C w0)
                               dx  = -(w0 - W dl)   [signs: x <- x + dx]

The base block (multiplier rows/columns deleted) is elliptic — exactly
why the reference prefers this formulation for direct solvers — so it
factors with the on-device multifrontal NDLU without saddle deferral.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class BorderedResult:
    x: np.ndarray
    converged: bool
    iters: int
    res_norms: list


def multiplier_dof_mask(problem, var: str = "lm") -> np.ndarray:
    """(n_dof,) bool mask of the overset multiplier dofs (the ``lm``
    elemental variable of the bar block)."""
    dofmap = problem.dofmap
    mask = np.zeros(dofmap.n_dof, dtype=bool)
    for bd in dofmap.blocks:
        for s in bd.slots:
            if s.var == var:
                mask[bd.gather[:, s.start:s.start + s.size].ravel()] = True
    return mask


class BorderedNewtonSolver:
    """Newton with the masked dofs bordered out of the base solve.

    ``border``: bool (n_dof,) mask (e.g. :func:`multiplier_dof_mask`).
    The base solve is the on-device multifrontal LU (``ndlu``) or host
    scipy (``direct``). Intended for modest border counts (k base-solve
    RHS columns per iteration, like the reference's overlap ACs).
    """

    def __init__(self, problem, border: np.ndarray, options=None,
                 base_solver: str = "ndlu", leaf_max: int = 96):
        from goma_tpu.solvers.newton import NewtonOptions

        self.problem = problem
        self.opts = options or NewtonOptions()
        self.base_solver = base_solver
        pat = problem.pattern
        self.border = np.asarray(border, dtype=bool)
        self.base_ids = np.flatnonzero(~self.border)
        self.lam_ids = np.flatnonzero(self.border)
        nb, k = self.base_ids.shape[0], self.lam_ids.shape[0]
        self.k = k
        if k == 0:
            raise ValueError("bordered solve with an empty border mask")

        # split the CSR pattern once: entry classes by (row, col) membership
        new_id = np.full(pat.n, -1, dtype=np.int64)
        new_id[self.base_ids] = np.arange(nb)
        lam_id = np.full(pat.n, -1, dtype=np.int64)
        lam_id[self.lam_ids] = np.arange(k)
        r_b = new_id[pat.rows] >= 0
        c_b = new_id[pat.indices] >= 0
        self.sel_bb = np.flatnonzero(r_b & c_b)
        self.sel_B = np.flatnonzero(r_b & ~c_b)   # base rows, border cols
        self.sel_C = np.flatnonzero(~r_b & c_b)
        self.sel_D = np.flatnonzero(~r_b & ~c_b)
        # sub-pattern of the base block
        import scipy.sparse as sp

        bb = sp.csr_matrix(
            (np.ones(self.sel_bb.shape[0], dtype=np.int8),
             new_id[pat.indices[self.sel_bb]].astype(np.int32),
             np.concatenate(([0], np.cumsum(np.bincount(
                 new_id[pat.rows[self.sel_bb]].astype(np.int64),
                 minlength=nb)))).astype(np.int64)),
            shape=(nb, nb))
        from goma_tpu.fem.sparsity import CSRPattern

        rows_bb = new_id[pat.rows[self.sel_bb]].astype(np.int32)
        cols_bb = new_id[pat.indices[self.sel_bb]].astype(np.int32)
        keys = rows_bb.astype(np.int64) * nb + cols_bb
        diag = np.searchsorted(keys, np.arange(nb, dtype=np.int64) * nb
                               + np.arange(nb))
        self.sub_pattern = CSRPattern(
            n=nb, indptr=bb.indptr.astype(np.int64), indices=cols_bb,
            rows=rows_bb, keys=keys, diag=diag.astype(np.int64))
        # dense scatter maps for B (nb, k), C (k, nb), D (k, k)
        self.B_rc = (new_id[pat.rows[self.sel_B]],
                     lam_id[pat.indices[self.sel_B]])
        self.C_rc = (lam_id[pat.rows[self.sel_C]],
                     new_id[pat.indices[self.sel_C]])
        self.D_rc = (lam_id[pat.rows[self.sel_D]],
                     lam_id[pat.indices[self.sel_D]])
        self._ndlu = None
        if base_solver == "ndlu":
            from goma_tpu.solvers.ndlu import NDLU

            self._ndlu = NDLU(self.sub_pattern, leaf_max=leaf_max,
                              dtype=jnp.float32)

    def _base_solve(self, vals_bb, rhs_cols):
        """J_bb^-1 applied to each column of rhs_cols (nb, m)."""
        if self._ndlu is not None:
            nd = self._ndlu
            fac = nd.factor(vals_bb)
            mslv = jax.vmap(lambda b: nd._solve_jit(fac, b, nd.tabs),
                            in_axes=1, out_axes=1)
            sol = mslv(rhs_cols).astype(vals_bb.dtype)
            # two refinement sweeps against the assembled-precision operator
            from goma_tpu.fem.sparsity import EllOperator

            if not hasattr(self, "_ell"):
                self._ell = EllOperator(self.sub_pattern)
            mmv = jax.vmap(lambda v: self._ell.matvec(vals_bb, v),
                           in_axes=1, out_axes=1)
            for _ in range(2):
                sol = sol + mslv(rhs_cols - mmv(sol)).astype(vals_bb.dtype)
            return sol
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        A = sp.csr_matrix((np.asarray(vals_bb, dtype=np.float64),
                           self.sub_pattern.indices, self.sub_pattern.indptr),
                          shape=(self.sub_pattern.n,) * 2)
        return jnp.asarray(spla.splu(A.tocsc()).solve(
            np.asarray(rhs_cols, dtype=np.float64)))

    def solve(self, x0, params) -> BorderedResult:
        opts = self.opts
        prob = self.problem
        x = jnp.asarray(x0, dtype=prob.dtype)
        nb, k = self.base_ids.shape[0], self.k
        base_ids = jnp.asarray(self.base_ids)
        lam_ids = jnp.asarray(self.lam_ids)
        res_norms = []
        converged = False
        it = 0
        for it in range(opts.max_iter):
            R, vals = prob._assemble(x, params)
            l2 = float(jnp.linalg.norm(R))
            linf = float(jnp.max(jnp.abs(R)))
            res_norms.append((l2, linf))
            if linf < opts.tol_residual:
                converged = True
                break
            vals_bb = vals[jnp.asarray(self.sel_bb)]
            B = jnp.zeros((nb, k), vals.dtype).at[
                jnp.asarray(self.B_rc[0]), jnp.asarray(self.B_rc[1])].add(
                vals[jnp.asarray(self.sel_B)])
            C = jnp.zeros((k, nb), vals.dtype).at[
                jnp.asarray(self.C_rc[0]), jnp.asarray(self.C_rc[1])].add(
                vals[jnp.asarray(self.sel_C)])
            D = jnp.zeros((k, k), vals.dtype).at[
                jnp.asarray(self.D_rc[0]), jnp.asarray(self.D_rc[1])].add(
                vals[jnp.asarray(self.sel_D)])
            Rb = R[base_ids]
            Rl = R[lam_ids]
            # k+1 base solves: [w0 | W] = J_bb^-1 [Rb | B]
            rhs = jnp.concatenate([Rb[:, None], B], axis=1)
            sol = self._base_solve(vals_bb, rhs)
            w0, W = sol[:, 0], sol[:, 1:]
            S = D - C @ W
            dl = -jnp.linalg.solve(S.astype(jnp.float64),
                                   (Rl - C @ w0).astype(jnp.float64))
            dx_b = -(w0 + W @ dl.astype(w0.dtype))
            x = x.at[base_ids].add(opts.damp * dx_b.astype(x.dtype))
            x = x.at[lam_ids].add(opts.damp * dl.astype(x.dtype))
        return BorderedResult(x=np.asarray(x), converged=converged,
                              iters=it, res_norms=res_norms)
