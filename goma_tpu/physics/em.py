"""Time-harmonic electromagnetics: vector curl-curl wave equation.

Parity: reference ``src/mm_fill_em.c`` (``assemble_emwave:75`` nodal E/H
formulation, ``assemble_ewave_curlcurl:856``) and the absorbing/incident
boundary terms of ``src/mm_em_bc.c``. Complex fields are carried as coupled
real/imaginary nodal vector variables (reference vars EM_E1_REAL.. —
``include/rf_fem_const.h`` EM block).

Formulation (E-field, e^{+i omega t} convention):

    curl(1/mu curl E) - omega^2 eps_c E = -i omega J_s,  eps_c = eps - i sigma/omega

discretized on nodal (Q1/Q2) vector elements with the grad-div regularized
weak form (the standard nodal-FEM gauge for smooth media; the reference's
Nedelec edge path is the alternative discretization of the same operator):

    int (1/mu) curl(E).curl(phi) + alpha (div E)(div phi)
        - omega^2 eps_c E.phi  dV  (+ boundary terms)

First-order absorbing (Silver-Mueller) boundary via ``EMAbsorbingBC``:
    n x (curl E) -> -i k n x (n x E), contributing the weak term
    + int (1/mu) [i k (E_t)] . phi_t dA with E_t = E - (n.E) n.
"""

from __future__ import annotations

import jax.numpy as jnp

from goma_tpu.fem.equations import Equation, FaceKernel
from goma_tpu.physics.materials import prop

E_RE, E_IM = "em_e_real", "em_e_imag"
H_RE, H_IM = "em_h_real", "em_h_imag"
EDGE_RE, EDGE_IM = "em_edge_real", "em_edge_imag"


def _curl(gE, dim):
    """curl from the gradient gE[q, a, k] = dE_a/dx_k.

    2D (in-plane E): scalar curl_z = dEy/dx - dEx/dy, returned as (nq, 1).
    3D: (nq, 3)."""
    if dim == 2:
        return (gE[:, 1, 0] - gE[:, 0, 1])[:, None]
    cx = gE[:, 2, 1] - gE[:, 1, 2]
    cy = gE[:, 0, 2] - gE[:, 2, 0]
    cz = gE[:, 1, 0] - gE[:, 0, 1]
    return jnp.stack([cx, cy, cz], axis=1)


def _curl_basis(gphi, dim):
    """curl of the vector basis functions: for component a and scalar basis
    i, curl(phi_i e_a). 2D -> (nq, 2, nbf, 1); 3D -> (nq, 3, nbf, 3)."""
    nq, nbf, _ = gphi.shape
    if dim == 2:
        # curl_z(phi e_x) = -dphi/dy ; curl_z(phi e_y) = +dphi/dx
        cb = jnp.stack([-gphi[:, :, 1], gphi[:, :, 0]], axis=1)  # (nq, 2, nbf)
        return cb[..., None]
    z = jnp.zeros((nq, nbf))
    # curl(phi e_x) = (0, dphi/dz, -dphi/dy) etc.
    cx = jnp.stack([z, gphi[:, :, 2], -gphi[:, :, 1]], axis=-1)
    cy = jnp.stack([-gphi[:, :, 2], z, gphi[:, :, 0]], axis=-1)
    cz = jnp.stack([gphi[:, :, 1], -gphi[:, :, 0], z], axis=-1)
    return jnp.stack([cx, cy, cz], axis=1)  # (nq, 3, nbf, 3)


class EMWave(Equation):
    """One real part of the complex curl-curl equation.

    part: "real" | "imag". Material keys: mu_m (magnetic permeability),
    eps (permittivity), sigma_em (conductivity, couples re/im), and the
    optional source currents ``J_re``/``J_im`` (callables or constants,
    entering as -i omega J).
    """

    def __init__(self, part: str, omega: float, dim: int = 2,
                 interp: str = "Q2", alpha: float = 1.0):
        super().__init__(E_RE if part == "real" else E_IM, dim, interp)
        self.part = part
        self.omega = omega
        self.dim = dim
        self.alpha = alpha

    def residual(self, fv, mat, params):
        d = self.dim
        nq = fv.x.shape[0]
        w = self.omega
        mu_m = prop(mat, "mu_m", fv, params, 1.0)
        eps = prop(mat, "eps", fv, params, 1.0)
        sig = prop(mat, "sigma_em", fv, params, 0.0)

        E_s = fv.val[self.var]  # same-part field
        other = E_IM if self.part == "real" else E_RE
        E_o = fv.val[other]
        g_s = fv.grad[self.var]
        curl_s = _curl(g_s, d)
        div_s = jnp.trace(g_s, axis1=1, axis2=2)

        phi = fv.phi[self.var]
        gphi = fv.gphi[self.var]
        curl_b = _curl_basis(gphi, d)  # (nq, d, nbf, ncurl)

        # (1/mu) curl E . curl phi + alpha div E div phi
        c = jnp.einsum("qc,qanc->qan", curl_s, curl_b) / mu_m
        c = c + self.alpha * jnp.einsum("q,qna->qan", div_s, gphi)
        # - omega^2 (eps E_s +/- (sigma/omega) E_o) . phi
        # complex: -w^2 (eps - i sigma/w)(E_re + i E_im):
        #   real part: -w^2 eps E_re - w sigma E_im
        #   imag part: -w^2 eps E_im + w sigma E_re
        if self.part == "real":
            react = -(w * w) * eps * E_s - w * sig * E_o
        else:
            react = -(w * w) * eps * E_s + w * sig * E_o
        c = c + jnp.einsum("qa,qn->qan", react, phi)

        # source: -i omega (J_re + i J_im) -> real: +w J_im ; imag: -w J_re
        key = "J_im" if self.part == "real" else "J_re"
        Js = mat.get(key, None)
        if Js is not None:
            Jv = Js(fv, mat, params) if callable(Js) else jnp.broadcast_to(
                jnp.asarray(Js), (nq, d))
            sgn = w if self.part == "real" else -w
            c = c - sgn * jnp.einsum("qa,qn->qan", Jv, phi)
        return c


class EMWaveH(Equation):
    """One real part of the complex H-field curl-curl equation.

    Parity: reference ``src/mm_fill_em.c`` magnetic-field equations
    (``assemble_emwave:75`` with R_EM_H1..H3 real/imag,
    ``include/rf_fem_const.h`` EM_H* variables). Dual of :class:`EMWave`:

        curl(1/eps_c curl H) - omega^2 mu H = curl(J/eps_c),
        eps_c = eps - i sigma/omega

    The complex admittance 1/eps_c = (eps + i sigma/omega)/|eps_c|^2 couples
    the real/imaginary parts inside the *curl* (and gauge) terms — unlike the
    E-form, where 1/mu is real and the coupling sits in the reaction term.
    Nodal grad-div gauge ``alpha`` regularizes exactly as in :class:`EMWave`.
    Free-current source via material keys ``Jc_re``/``Jc_im`` shaped like the
    curl (scalar in 2D, 3-vector in 3D), entering weakly as
    int (1/eps_c) J . curl(phi).
    """

    def __init__(self, part: str, omega: float, dim: int = 2,
                 interp: str = "Q2", alpha: float = 1.0):
        super().__init__(H_RE if part == "real" else H_IM, dim, interp)
        self.part = part
        self.omega = omega
        self.dim = dim
        self.alpha = alpha

    def residual(self, fv, mat, params):
        d = self.dim
        w = self.omega
        mu_m = prop(mat, "mu_m", fv, params, 1.0)
        eps = prop(mat, "eps", fv, params, 1.0)
        sig = prop(mat, "sigma_em", fv, params, 0.0)

        # 1/eps_c = a + i b
        s = sig / w
        den = eps * eps + s * s
        a, b = eps / den, s / den
        # complex product (a+ib)(X_re + i X_im): real = a X_re - b X_im,
        # imag = a X_im + b X_re -> self coeff a, other coeff -/+ b
        ob = -b if self.part == "real" else b

        H_s = fv.val[self.var]
        other = H_IM if self.part == "real" else H_RE
        H_o = fv.val[other]
        g_s, g_o = fv.grad[self.var], fv.grad[other]
        curl_s, curl_o = _curl(g_s, d), _curl(g_o, d)
        div_s = jnp.trace(g_s, axis1=1, axis2=2)
        div_o = jnp.trace(g_o, axis1=1, axis2=2)

        phi = fv.phi[self.var]
        gphi = fv.gphi[self.var]
        curl_b = _curl_basis(gphi, d)

        c = jnp.einsum("qc,qanc->qan", a * curl_s + ob * curl_o, curl_b)
        c = c + self.alpha * jnp.einsum(
            "q,qna->qan", a * div_s + ob * div_o, gphi)
        c = c - (w * w) * mu_m * jnp.einsum("qa,qn->qan", H_s, phi)

        J_re, J_im = mat.get("Jc_re", None), mat.get("Jc_im", None)
        if J_re is not None or J_im is not None:
            ncurl = curl_s.shape[1]

            def _ev(Jx):
                if Jx is None:
                    return jnp.zeros_like(curl_s)
                v = Jx(fv, mat, params) if callable(Jx) else jnp.asarray(Jx)
                return jnp.broadcast_to(jnp.atleast_1d(v),
                                        (curl_s.shape[0], ncurl))
            Jr, Ji = _ev(J_re), _ev(J_im)
            Jpart = a * Jr + ob * Ji if self.part == "real" \
                else a * Ji - ob * Jr
            c = c - jnp.einsum("qc,qanc->qan", Jpart, curl_b)
        return c


class EMAbsorbingBCH(FaceKernel):
    """First-order absorbing (Silver-Mueller) boundary for :class:`EMWaveH`.

    Dual of :class:`EMAbsorbingBC` under mu <-> eps: n x curl H =
    -i k n x (n x H) with k = omega sqrt(mu eps), giving the weak term
    + (k/eps) (i H_t) . phi_t. In lossy media the lossless k is used (same
    approximation as the E-field version). Reference: ``src/mm_em_bc.c``
    H-side absorbing conditions."""

    def __init__(self, part: str, omega: float, dim: int = 2):
        super().__init__(H_RE if part == "real" else H_IM, dim)
        self.part = part
        self.omega = omega
        self.dim = dim

    def residual(self, sfv, mat, params):
        mu_m = prop(mat, "mu_m", sfv, params, 1.0)
        eps = prop(mat, "eps", sfv, params, 1.0)
        k = self.omega * jnp.sqrt(mu_m * eps)
        other = H_IM if self.part == "real" else H_RE
        H_o = sfv.val[other]
        n = sfv.normal
        Ht = H_o - jnp.einsum("qa,qa->q", n, H_o)[:, None] * n
        sgn = -1.0 if self.part == "real" else 1.0
        phi = sfv.phi[self.var]
        return sgn * (k / eps) * jnp.einsum("qa,qn->qan", Ht, phi)


class EMWaveEdge(Equation):
    """Nedelec edge-element (H(curl)-conforming) curl-curl equation, 2D.

    Parity: the reference's edge-element discretization of the same operator
    (``src/mm_fill_em.c`` I_N1 path, ``include/mm_as_const.h`` I_N1). The dof
    is the tangential circulation on each element edge (carried by the edge's
    midside node of the quadratic parent); the covariant Piola transform and
    curl scaling live in ``goma_tpu.fem.fields.eval_fieldvars``.

    Weak form (no grad-div gauge needed — the edge space is curl-conforming):

        int (1/mu) curl E curl phi - omega^2 eps_c E . phi  dV = int f . phi

    part: "real" | "imag". If the opposite-part variable is not registered
    the sigma coupling is dropped (lossless single-part solves). PEC
    (n x E = 0) is a strong Dirichlet on the boundary edge circulations.
    Source: ``J_re``/``J_im`` material entries enter as -i omega J exactly as
    in the nodal ``EMWave``.
    """

    def __init__(self, part: str, omega: float, dim: int = 2):
        super().__init__(EDGE_RE if part == "real" else EDGE_IM, 1, "N1")
        self.part = part
        self.omega = omega
        self.dim = dim

    def residual(self, fv, mat, params):
        w = self.omega
        mu_m = prop(mat, "mu_m", fv, params, 1.0)
        eps = prop(mat, "eps", fv, params, 1.0)
        sig = prop(mat, "sigma_em", fv, params, 0.0)

        E = fv.val[self.var]          # (nq, dim)
        curl = fv.curl[self.var]      # (nq,) 2D scalar | (nq, 3) 3D vector
        phi = fv.phi[self.var]        # (nq, nbf, dim)
        cphi = fv.curl_phi[self.var]  # (nq, nbf) | (nq, nbf, 3)

        if self.dim == 3:
            c = jnp.einsum("qk,qnk->qn", curl, cphi) / mu_m
        else:
            c = cphi * (curl / mu_m)[:, None]  # (nq, nbf)

        other = EDGE_IM if self.part == "real" else EDGE_RE
        E_o = fv.val.get(other)
        react = -(w * w) * eps * E
        if E_o is not None:
            react = react + (-1.0 if self.part == "real" else 1.0) * w * sig * E_o
        c = c + jnp.einsum("qk,qnk->qn", react, phi)

        key = "J_im" if self.part == "real" else "J_re"
        Js = mat.get(key, None)
        if Js is not None:
            Jv = Js(fv, mat, params) if callable(Js) else jnp.broadcast_to(
                jnp.asarray(Js), E.shape)
            sgn = w if self.part == "real" else -w
            c = c - sgn * jnp.einsum("qk,qnk->qn", Jv, phi)
        return c[:, None, :]  # (nq, ncomp=1, nbf)


class EMAbsorbingBC(FaceKernel):
    """First-order absorbing (Silver-Mueller) boundary for EMWave.

    n x curl E = -i k n x (n x E) with k = omega sqrt(mu eps); the weak
    curl-curl boundary term becomes + (k/mu) * (i E_t) . phi_t, i.e. the
    real equation gets -(k/mu) E_t^imag and the imaginary +(k/mu) E_t^real
    (tangential projection E_t = E - (n.E) n).
    Reference: ``src/mm_em_bc.c`` absorbing conditions."""

    def __init__(self, part: str, omega: float, dim: int = 2):
        super().__init__(E_RE if part == "real" else E_IM, dim)
        self.part = part
        self.omega = omega
        self.dim = dim

    def residual(self, sfv, mat, params):
        mu_m = prop(mat, "mu_m", sfv, params, 1.0)
        eps = prop(mat, "eps", sfv, params, 1.0)
        k = self.omega * jnp.sqrt(mu_m * eps)
        other = E_IM if self.part == "real" else E_RE
        E_o = sfv.val[other]  # (nq, d)
        n = sfv.normal
        Et = E_o - jnp.einsum("qa,qa->q", n, E_o)[:, None] * n
        sgn = -1.0 if self.part == "real" else 1.0
        phi = sfv.phi[self.var]
        return sgn * (k / mu_m) * jnp.einsum("qa,qn->qan", Et, phi)
