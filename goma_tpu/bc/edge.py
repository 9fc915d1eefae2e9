"""3D edge (curve) boundary conditions: integrated terms on sideset
intersections.

Parity: reference ``src/bc_curve.c`` (``apply_integrated_curve_bc:74``):
a "curve" is the set of element edges where two side sets meet (e.g. the
contact line where a free surface meets a die face). The reference walks
elements' edge lists built in rf_pre_proc; here the intersection, the 1D
quadrature along each reference edge, and the local frame (edge tangent +
both faces' outward normals) are precomputed on host, and the kernels are
vmapped over edges like face kernels — with jacfwd supplying the Jacobians
the reference hand-codes.

Kernels: :class:`VeloTangentEdge` (VELO_TANGENT_EDGE,
``src/mm_ns_bc.c:1819 fvelo_tangent_edge_bc``), :class:`VeloNormalEdge`
(VELO_NORMAL_EDGE), :class:`EdgeTraction` (line loads / contact-line
forces, the 3D CAP_ENDFORCE analog), :class:`CAEdge` (CA_EDGE /
CA_EDGE_INT static contact angle, ``src/mm_ns_bc.c:9748 fapply_CA``) and
:class:`VarCAEdge` (VAR_CA_EDGE velocity-dependent contact angle,
``src/mm_ns_bc.c:9843 fapply_var_CA``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from goma_tpu.elements import element_type, eval_basis, faces as elem_faces, geom_interp
from goma_tpu.fem.equations import EdgeKernel


@dataclass
class EdgeSet:
    """Edges (element, refA, refB edge) of one block where two sidesets
    meet, with stacked per-edge basis tables."""

    block_index: int
    kernels: list
    edge_elems: np.ndarray          # (ne_edges,) local element ids
    etabs: dict                     # stacked tables (ne_edges, nq, ...)
    ewts: np.ndarray                # (nq_e,) 1D rule weights
    name: str = ""


class EdgeVars:
    """Fields along one element edge at the 1D quadrature points.

    x (nq, 3); wds (nq,) arc-length weights; tangent (nq, 3) unit edge
    tangent; normal_a / normal_b (nq, 3) the two faces' outward normals;
    val/grad/dot/phi/gphi dicts as in FieldVars."""

    def __init__(self):
        self.val = {}
        self.grad = {}
        self.dot = {}
        self.phi = {}
        self.gphi = {}
        self.x = None
        self.wds = None
        self.tangent = None
        self.normal_a = None
        self.normal_b = None
        self.dim = 3


def build_edge_sets(problem, sideset_a: str, sideset_b: str, kernels,
                    quad_order: int | None = None) -> list[EdgeSet]:
    """Find the element edges shared by two sidesets and precompute tables.

    An edge belongs to the curve when ONE element has a face in set A and a
    face in set B sharing exactly two corner nodes (reference: the
    edge-of-element lists of rf_pre_proc consumed by bc_curve.c)."""
    from goma_tpu.elements.quadrature import gauss_1d

    mesh = problem.mesh
    ssa, ssb = mesh.sidesets[sideset_a], mesh.sidesets[sideset_b]
    qo = quad_order or problem.quad_order
    # (elem -> faces) maps
    fa: dict[int, list[int]] = {}
    for e, f in zip(ssa.elems, ssa.faces):
        fa.setdefault(int(e), []).append(int(f))
    out: list[EdgeSet] = []
    per_block: dict[int, list] = {}
    for e, f in zip(ssb.elems, ssb.faces):
        e = int(e)
        if e not in fa:
            continue
        bi, le = mesh.global_elem_block(e)
        et = element_type(mesh.blocks[bi].elem_type)
        if et.dim != 3:
            raise NotImplementedError("edge (curve) BCs are 3D-only; in 2D "
                                      "the analog is a point (bc_special)")
        faces = elem_faces(et.family)
        for f_a in fa[e]:
            shared = tuple(sorted(set(faces[f_a].corner_nodes)
                                  & set(faces[int(f)].corner_nodes)))
            if len(shared) == 2:
                per_block.setdefault(bi, []).append((le, f_a, int(f), shared))

    spts, swts = gauss_1d(qo)  # on [-1, 1]
    for bi, lst in per_block.items():
        # drop duplicate (elem, edge) pairs (two face pairs can share an edge)
        seen = set()
        uniq = []
        for le, f_a, f_b, shared in lst:
            key = (le, shared)
            if key not in seen:
                seen.add(key)
                uniq.append((le, f_a, f_b, shared))
        blk = mesh.blocks[bi]
        bd = problem.dofmap.blocks[bi]
        et = element_type(blk.elem_type)
        gi = geom_interp(et)
        from goma_tpu.mesh.mesh import _ref_nodes

        ref = _ref_nodes(et)
        interps = {s.interp for s in bd.slots if s.interp != "N1"}
        Ngs, dNgs, tjacs, nra, nrb = [], [], [], [], []
        Ni = {i: [] for i in interps}
        dNi = {i: [] for i in interps}
        elems = []
        for le, f_a, f_b, shared in uniq:
            p0, p1 = ref[shared[0]], ref[shared[1]]
            # straight reference edge: param s in [-1,1]
            epts = 0.5 * (1 - spts[:, None]) * p0[None] + \
                0.5 * (1 + spts[:, None]) * p1[None]
            Ng, dNg = eval_basis(et.family, gi, epts)
            Ngs.append(Ng)
            dNgs.append(dNg)
            tjacs.append(0.5 * (p1 - p0))  # d(ref)/ds
            # outward reference normals of the two faces
            for f_idx, acc in ((f_a, nra), (f_b, nrb)):
                J = elem_faces(et.family)[f_idx].ref_jac  # (3, 2)
                nr = np.cross(J[:, 0], J[:, 1])
                acc.append(nr / np.linalg.norm(nr))
            for itp in interps:
                N, dN = eval_basis(et.family, itp, epts)
                Ni[itp].append(N)
                dNi[itp].append(dN)
            elems.append(le)
        etabs = {
            "Ng": np.stack(Ngs), "dNg": np.stack(dNgs),
            "tjac": np.stack(tjacs), "nra": np.stack(nra), "nrb": np.stack(nrb),
        }
        for itp in interps:
            etabs[f"N:{itp}"] = np.stack(Ni[itp])
            etabs[f"dN:{itp}"] = np.stack(dNi[itp])
        out.append(EdgeSet(bi, list(kernels), np.asarray(elems, dtype=np.int64),
                           etabs, swts, name=f"{sideset_a}&{sideset_b}"))
    if not out:
        raise ValueError(
            f"sidesets {sideset_a!r} and {sideset_b!r} share no element edges")
    return out


def eval_edgevars(q_e, qdot_e, X_e, etab, ewts, slots, dtype) -> EdgeVars:
    """EdgeVars for one element edge (vmapped over edges)."""
    from goma_tpu.fem.fields import MESH_VAR, _unpack
    from goma_tpu.utils.la import det_and_inv

    u = _unpack(q_e, slots)
    udot = _unpack(qdot_e, slots)
    Xc = X_e
    if MESH_VAR in u:
        Xc = X_e + u[MESH_VAR].T
    Ng, dNg = etab["Ng"], etab["dNg"]
    Jmat = jnp.einsum("qnd,nk->qkd", dNg, Xc)  # (nq, 3, 3)
    detJ, invJ = det_and_inv(Jmat)

    fv = EdgeVars()
    fv.x = jnp.einsum("qn,nk->qk", Ng, Xc)
    tvec = jnp.einsum("qkd,d->qk", Jmat, etab["tjac"])
    mag = jnp.linalg.norm(tvec, axis=1)
    fv.tangent = tvec / mag[:, None]
    fv.wds = ewts * mag

    def phys_normal(nr):
        # covariant transform of a reference face normal
        n = jnp.einsum("qdk,d->qk", invJ, nr)
        return n / jnp.linalg.norm(n, axis=1, keepdims=True)

    fv.normal_a = phys_normal(etab["nra"])
    fv.normal_b = phys_normal(etab["nrb"])

    gphi_cache = {}
    for s in slots:
        if s.interp == "N1":
            continue
        Niq = etab[f"N:{s.interp}"]
        dNiq = etab[f"dN:{s.interp}"]
        if s.interp not in gphi_cache:
            gphi_cache[s.interp] = jnp.einsum("qnd,qdk->qnk", dNiq, invJ)
        gp = gphi_cache[s.interp]
        fv.phi[s.var] = Niq
        fv.gphi[s.var] = gp
        fv.val[s.var] = jnp.einsum("qn,cn->qc", Niq, u[s.var])
        fv.grad[s.var] = jnp.einsum("qnk,cn->qck", gp, u[s.var])
        fv.dot[s.var] = jnp.einsum("qn,cn->qc", Niq, udot[s.var])
    return fv


# -------------------------------------------------------------- kernels
class VeloTangentEdge(EdgeKernel):
    """VELO_TANGENT_EDGE (``src/mm_ns_bc.c:1819 fvelo_tangent_edge_bc``):
    enforce the along-edge velocity t_edge . (u - v_s) = V on the contact
    curve, applied as a weak penalty on the momentum equation:
    ``penalty * (t.(u - v_s) - V) t_a phi_i``."""

    def __init__(self, dim: int = 3, value=0.0, v_s=0.0, penalty: float = 1e6):
        super().__init__("velocity", dim)
        self.value = value
        self.v_s = v_s
        self.penalty = penalty

    def residual(self, efv, mat, params):
        nq = efv.x.shape[0]
        t = efv.tangent
        u = efv.val["velocity"]
        vs = jnp.broadcast_to(jnp.asarray(self.v_s, dtype=u.dtype), u.shape)
        V = self.value(efv, mat, params) if callable(self.value) else self.value
        mis = jnp.einsum("qk,qk->q", t, u - vs) - V
        phi = efv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", mis, t, phi)


class VeloNormalEdge(EdgeKernel):
    """VELO_NORMAL_EDGE: no-penetration through face A along the curve,
    weak penalty ``penalty * (n_a . u - V) n_a phi``."""

    def __init__(self, dim: int = 3, value=0.0, penalty: float = 1e6):
        super().__init__("velocity", dim)
        self.value = value
        self.penalty = penalty

    def residual(self, efv, mat, params):
        n = efv.normal_a
        u = efv.val["velocity"]
        V = self.value(efv, mat, params) if callable(self.value) else self.value
        mis = jnp.einsum("qk,qk->q", n, u) - V
        phi = efv.phi["velocity"]
        return self.penalty * jnp.einsum("q,qa,qi->qai", mis, n, phi)


class CAEdge(EdgeKernel):
    """CA_EDGE / CA_EDGE_INT (``src/bc_curve.c:790,308`` dispatch;
    ``src/mm_ns_bc.c:9748 fapply_CA``): static contact angle between the
    free surface (sideset A, carrying the mesh motion) and the solid
    surface (sideset B) along the 3D contact curve. Replaces the kinematic
    closure there with the weak penalty

        penalty * (n_fs . n_ss - cos(theta)) * n_fs_a * phi_i

    on the mesh-displacement rows. Both normals are evaluated on the
    displaced configuration inside :func:`eval_edgevars`, so the
    mesh-position sensitivities the reference hand-codes
    (``dfsnormal_dx`` / ``dssnormal_dx``) come from AD. ``theta`` in
    radians; scalar, param name (str), or callable(efv, mat, params).

    ``var``: which equation rows carry the constraint — default the mesh
    displacements (CA_BC); pass ``"velocity"`` for CA_MOMENTUM_BC
    (``src/bc_special.c:642``: the same ``fapply_CA`` misfit applied in
    place of the kinematic momentum row n.(v - vs) = 0)."""

    def __init__(self, theta, dim: int = 3, penalty: float = 1e6,
                 var: str | None = None):
        from goma_tpu.fem.fields import MESH_VAR

        super().__init__(var or MESH_VAR, dim)
        self.theta = theta
        self.penalty = penalty

    def _cos_theta(self, efv, mat, params):
        th = self.theta
        if isinstance(th, str):
            th = params[th]
        elif callable(th):
            th = th(efv, mat, params)
        return jnp.cos(th)

    def residual(self, efv, mat, params):
        nfs, nss = efv.normal_a, efv.normal_b
        mis = jnp.einsum("qk,qk->q", nfs, nss) - self._cos_theta(efv, mat, params)
        phi = efv.phi[self.var]
        return self.penalty * jnp.einsum("q,qa,qi->qai", mis, nfs, phi)


def contact_line_normal(efv):
    """In-wall contact-line normal n_cl = +-(n_ss x t_edge), signed so
    n_cl . n_fs > 0 (``src/mm_fill_aux.c:2157 calc_CL_normal``): the unit
    vector lying in the solid surface, perpendicular to the contact line,
    pointing out of the wetted region."""
    ncl = jnp.cross(efv.normal_b, efv.tangent)
    ncl = ncl / jnp.linalg.norm(ncl, axis=1, keepdims=True)
    sgn = jnp.sign(jnp.einsum("qk,qk->q", ncl, efv.normal_a))
    return ncl * sgn[:, None]


class VarCAEdge(CAEdge):
    """VAR_CA_EDGE (``src/mm_ns_bc.c:9843 fapply_var_CA``; dispatch
    ``src/bc_curve.c:369``): velocity-dependent contact angle along the 3D
    contact curve,

        cos(theta) = cos(theta_s) - cT * Ca,
        Ca = mu * n_cl . (v_web - xdot) / sigma

    with n_cl the in-wall contact-line normal (:func:`contact_line_normal`)
    and xdot the mesh velocity (zero for steady solves, matching the
    reference's TimeIntegration switch). cos(theta) is clamped to the
    [1 deg, 179 deg] window like the reference. ``mu``/``sigma`` default to
    the material's ``mu``/``sigma`` entries (reference: gn->mu0,
    mp->surface_tension)."""

    def __init__(self, theta_s: float, cT: float, v_web=(0.0, 0.0, 0.0),
                 mu=None, sigma=None, dim: int = 3, penalty: float = 1e6):
        super().__init__(theta_s, dim=dim, penalty=penalty)
        self.cT = cT
        self.v_web = np.asarray(v_web, dtype=float)
        self.mu = mu
        self.sigma = sigma

    def _cos_theta(self, efv, mat, params):
        from goma_tpu.fem.fields import MESH_VAR
        from goma_tpu.physics.materials import prop

        mu = self.mu if self.mu is not None else prop(mat, "mu", efv, params, 1.0)
        sigma = (self.sigma if self.sigma is not None
                 else prop(mat, "sigma", efv, params, 1.0))
        ncl = contact_line_normal(efv)
        vw = jnp.asarray(self.v_web, dtype=efv.x.dtype)[None, :]
        if MESH_VAR in efv.dot:
            vw = vw - efv.dot[MESH_VAR]
        Ca = mu * jnp.einsum("qk,qk->q", ncl, vw) / sigma
        th = self.theta
        if isinstance(th, str):
            th = params[th]
        cos_ca = jnp.cos(th) - self.cT * Ca
        lo, hi = np.cos(np.deg2rad(179.0)), np.cos(np.deg2rad(1.0))
        return jnp.clip(cos_ca, lo, hi)


class MovingCAEdge(CAEdge):
    """MOVING_CA (``src/mm_ns_bc.c:10206 fapply_moving_CA``; SPECIAL nodal
    dispatch ``src/bc_special.c:656``): dynamic contact angle keyed to the
    contact-line speed relative to the wall,

        theta = theta_s + (theta_adv - theta_s) * tanh(scaling * v_rel),
        v_rel = (xdot - v_wall) . n_fs

    with xdot the mesh velocity at the contact line (advancing v_rel > 0
    steepens toward theta_adv; the same misfit n_fs.n_ss - cos theta then
    drives the penalty rows). Angles in RADIANS here (the reference's cards
    carry degrees and convert at :10265). ``theta_rec`` is accepted for
    card parity but — exactly like the reference, which reads but never
    uses receding_ca in the formula — does not enter; receding lines
    follow the tanh branch below theta_s."""

    def __init__(self, theta_s: float, theta_adv: float, scaling: float,
                 theta_rec: float | None = None, v_wall=(0.0, 0.0, 0.0),
                 dim: int = 3, penalty: float = 1e6, var: str | None = None):
        super().__init__(theta_s, dim=dim, penalty=penalty, var=var)
        self.theta_adv = theta_adv
        self.scaling = scaling
        self.theta_rec = theta_rec  # unused, matching fapply_moving_CA
        self.v_wall = np.asarray(v_wall, dtype=float)

    def _cos_theta(self, efv, mat, params):
        from goma_tpu.fem.fields import MESH_VAR

        th_s = self.theta
        if isinstance(th_s, str):
            th_s = params[th_s]
        vw = jnp.asarray(self.v_wall[: efv.x.shape[1]], dtype=efv.x.dtype)
        xdot = efv.dot[MESH_VAR] if MESH_VAR in efv.dot else \
            jnp.zeros_like(efv.x)
        v_rel = jnp.einsum("qk,qk->q", xdot - vw[None, :], efv.normal_a)
        th = th_s + (self.theta_adv - th_s) * jnp.tanh(self.scaling * v_rel)
        return jnp.cos(th)


class EdgeTraction(EdgeKernel):
    """Line load along the curve: -int phi f . ds (3D contact-line force;
    the CAP_ENDFORCE analog of bc_special.c in 3D). ``force``: (3,) vector,
    callable(efv, mat, params) -> (nq, ncomp), or scalar for scalar vars."""

    def __init__(self, var: str, ncomp: int, force):
        super().__init__(var, ncomp)
        self.force = force

    def residual(self, efv, mat, params):
        nq = efv.x.shape[0]
        f = self.force(efv, mat, params) if callable(self.force) else self.force
        f = jnp.broadcast_to(jnp.asarray(f), (nq, self.ncomp))
        phi = efv.phi[self.var]
        return -jnp.einsum("qc,qi->qci", f, phi)


class CAEdgeOrFix(CAEdge):
    """CA_EDGE_OR_FIX / CA_OR_FIX (``src/bc_curve.c:874``; the SPECIAL
    nodal flavor ``src/bc_special.c``): contact angle OR pin at a sharp
    feature — apply the static angle while the contact line stays on the
    admissible side of the feature edge; once it reaches the feature
    (signed distance d = (x - x_feat) . f_dir >= 0), the condition
    switches to pinning the line at the feature:

        mis = d > 0 ?  d  :  (n_fs . n_ss - cos theta)

    (both branches drive the same penalty row; the reference's discrete
    OR-FIX logic, smooth through AD's where)."""

    def __init__(self, theta, feature_point, feature_dir, dim: int = 3,
                 penalty: float = 1e6, pin_scale: float = 1.0,
                 gate_width: float = 5e-3):
        super().__init__(theta, dim, penalty)
        import numpy as _np
        self.xf = _np.asarray(feature_point, dtype=float)
        self.fdir = _np.asarray(feature_dir, dtype=float)
        self.fdir = self.fdir / _np.linalg.norm(self.fdir)
        self.pin_scale = pin_scale
        # smooth blend over ~gate_width around the feature (a hard switch
        # makes Newton chatter across the branch)
        self.gate_width = gate_width

    def residual(self, efv, mat, params):
        nfs, nss = efv.normal_a, efv.normal_b
        ca = jnp.einsum("qk,qk->q", nfs, nss) \
            - self._cos_theta(efv, mat, params)
        d = jnp.einsum("qk,k->q", efv.x
                       - jnp.asarray(self.xf, dtype=efv.x.dtype),
                       jnp.asarray(self.fdir, dtype=efv.x.dtype))
        g = 0.5 * (1.0 + jnp.tanh(d / self.gate_width))
        mis = g * self.pin_scale * d + (1.0 - g) * ca
        phi = efv.phi[self.var]
        return self.penalty * jnp.einsum("q,qa,qi->qai", mis, nfs, phi)
