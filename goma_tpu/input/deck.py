"""Declarative problem decks.

Parity: the reference's card-based input system — ``src/mm_input.c``
(13 sections), ``src/mm_input_mp.c`` (material files), ``src/mm_input_bc.c``
(BC cards) — re-designed as a declarative dict/JSON schema. A deck fully
describes mesh, equations, materials, BCs, solver and time stepping, and
``build_problem``/``run_deck`` turn it into a solve, with every resolved
default echoed back (the reference's "echo file").

Example deck:

    deck = {
      "mesh": {"kind": "rectangle", "nx": 16, "ny": 16, "elem": "QUAD9"},
      "equations": [
        {"type": "momentum", "dim": 2, "interp": "Q2", "transient": False},
        {"type": "continuity", "interp": "Q1"},
      ],
      "material": {"rho": 1.0, "mu": 0.01},
      "bcs": [
        {"kind": "dirichlet", "nodeset": "top", "var": "velocity", "comp": 0, "value": 1.0},
        ...
        {"kind": "pin", "var": "pressure", "value": 0.0},
      ],
      "solver": {"max_iter": 10, "tol_residual": 1e-9, "precond": "twolevel"},
      "time": {"dt0": 0.01, "t_end": 1.0, "theta": 0.0},   # optional -> transient
      "output": {"exodus": "out.exo"},                       # optional
    }
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from goma_tpu.fem import Problem
from goma_tpu.mesh import box_mesh, rectangle_mesh
from goma_tpu.solvers import NewtonOptions, NewtonSolver

_EQUATIONS = {}


def register_equation(name: str):
    def deco(fn):
        _EQUATIONS[name] = fn
        return fn

    return deco


def _init_registry():
    from goma_tpu.physics import (
        Continuity,
        EllipticMesh,
        Energy,
        FillEquation,
        LinearElasticMesh,
        Momentum,
        PorousFlow,
        Potential,
        PseudoSolidMesh,
        ReynoldsFilm,
        Species,
        SpalartAllmaras,
        VanGenuchten,
        VEStress,
        VelocityGradientProjection,
    )

    from goma_tpu.physics import AcousticHelmholtz, MomentEquations

    _EQUATIONS.update(
        acoustic=lambda a: AcousticHelmholtz(**a),
        moments=lambda a: MomentEquations(**a),
        momentum=lambda a: Momentum(**a),
        continuity=lambda a: Continuity(**a),
        energy=lambda a: Energy(**a),
        species=lambda a: Species(**a),
        mesh_elliptic=lambda a: EllipticMesh(**a),
        mesh_pseudo_solid=lambda a: PseudoSolidMesh(**a),
        mesh_linear_elastic=lambda a: LinearElasticMesh(**a),
        ve_stress=lambda a: VEStress(**a),
        velocity_gradient=lambda a: VelocityGradientProjection(**a),
        fill=lambda a: FillEquation(**a),
        spalart_allmaras=lambda a: SpalartAllmaras(**a),
        porous=lambda a: PorousFlow(
            model=VanGenuchten(**a.pop("van_genuchten")) if "van_genuchten" in a else None,
            **a,
        ),
        potential=lambda a: Potential(**a),
        reynolds_film=lambda a: ReynoldsFilm(**a),
        restime=lambda a: __import__(
            'goma_tpu.physics', fromlist=['ResidenceTime']
        ).ResidenceTime(**a),
        light_intensity=lambda a: __import__(
            'goma_tpu.physics', fromlist=['LightIntensity']
        ).LightIntensity(**a),
        ls_embedded_dirichlet=lambda a: __import__(
            'goma_tpu.physics', fromlist=['LSEmbeddedDirichlet']
        ).LSEmbeddedDirichlet(**a),
        ls_flow_pressure=lambda a: __import__(
            'goma_tpu.physics', fromlist=['LSFlowPressure']
        ).LSFlowPressure(**a),
        ext_velocity=lambda a: __import__(
            'goma_tpu.physics', fromlist=['ExtensionVelocity']
        ).ExtensionVelocity(**a),
        ls_extv_kinematic=lambda a: __import__(
            'goma_tpu.physics', fromlist=['LSExtVKinematic']
        ).LSExtVKinematic(**a),
        ls_extv_latent=lambda a: __import__(
            'goma_tpu.physics', fromlist=['LSExtVLatent']
        ).LSExtVLatent(**a),
        fill_ext_v=lambda a: __import__(
            'goma_tpu.physics', fromlist=['FillExtV']
        ).FillExtV(**a),
        ls_normal=lambda a: __import__(
            'goma_tpu.physics', fromlist=['SolvedNormal']
        ).SolvedNormal(**a),
        bond=lambda a: __import__(
            'goma_tpu.physics', fromlist=['BondEvolution']
        ).BondEvolution(**a),
        vort_dir=lambda a: __import__(
            'goma_tpu.physics', fromlist=['VorticityDirection']
        ).VorticityDirection(**a),
    )

    from goma_tpu.physics import (
        EMWave,
        EMWaveEdge,
        LogConformationStress,
        NormalModeContinuity,
        NormalModeEnergy,
        NormalModeMomentum,
        NormalModeW,
        OversetLM,
        SqrtConformationStress,
    )
    from goma_tpu.physics.lubrication import TFMPBound, TFMPMass
    from goma_tpu.physics.porous import PorousSinkMass
    from goma_tpu.physics.projection_ns import PressureIncrement, UStar
    from goma_tpu.physics.shell import (BeamBending, ShellConduction,
                                        ShellCurvature, ShellTension,
                                        TensionedString)

    _EQUATIONS.update(
        em_wave=lambda a: EMWave(**a),
        em_wave_edge=lambda a: EMWaveEdge(**a),
        logconf_stress=lambda a: LogConformationStress(**a),
        sqrtconf_stress=lambda a: SqrtConformationStress(**a),
        normal_mode_momentum=lambda a: NormalModeMomentum(**a),
        normal_mode_w=lambda a: NormalModeW(**a),
        normal_mode_continuity=lambda a: NormalModeContinuity(**a),
        normal_mode_energy=lambda a: NormalModeEnergy(**a),
        overset_lm=lambda a: OversetLM(**a),
        tfmp_mass=lambda a: TFMPMass(**a),
        tfmp_bound=lambda a: TFMPBound(**a),
        porous_sink_mass=lambda a: PorousSinkMass(**a),
        ustar=lambda a: UStar(**a),
        pressure_increment=lambda a: PressureIncrement(**a),
        beam_bending=lambda a: BeamBending(**a),
        shell_conduction=lambda a: ShellConduction(**a),
        shell_curvature=lambda a: ShellCurvature(**a),
        shell_tension=lambda a: ShellTension(**a),
        tensioned_string=lambda a: TensionedString(**a),
    )

    from goma_tpu.physics.level_set import LSCurvature

    _EQUATIONS.update(ls_curvature=lambda a: LSCurvature(**a))

    # 3D-of-2D deforming-mesh normal-mode corrections (normal_mode_ale)
    from goma_tpu.physics import ContinuityZ, MeshZ, MomentumZ, ScalarZ, WMomentum
    from goma_tpu.physics.viscoelastic import AxisymHoopStress

    _EQUATIONS.update(
        zmode_momentum=lambda a: MomentumZ(**a),
        zmode_w=lambda a: WMomentum(**a),
        zmode_continuity=lambda a: ContinuityZ(**a),
        zmode_mesh=lambda a: MeshZ(**a),
        zmode_scalar=lambda a: ScalarZ(**a),
        ve_hoop_stress=lambda a: AxisymHoopStress(**a),
    )


_FACE_KERNELS = {}


def _init_face_registry():
    from goma_tpu.bc import CapillaryBC, KinematicBC, NormalFlux, Traction
    from goma_tpu.physics import ButlerVolmerBC, SommerfeldBC

    from goma_tpu.bc import (ConvectiveHeatFlux, FlowPressure, MassTransferFlux,
                             NavierSlip, RadiativeHeatFlux)
    from goma_tpu.physics import EMAbsorbingBC
    from goma_tpu.physics.viscoelastic import DGStressInflow

    _FACE_KERNELS.update(
        capillary=lambda a: CapillaryBC(**a),
        kinematic=lambda a: KinematicBC(**a),
        normal_flux=lambda a: NormalFlux(**a),
        traction=lambda a: Traction(**a),
        butler_volmer=lambda a: ButlerVolmerBC(**a),
        sommerfeld=lambda a: SommerfeldBC(**a),
        navier_slip=lambda a: NavierSlip(**a),
        power_law_slip=lambda a: __import__(
            'goma_tpu.bc', fromlist=['PowerLawSlip']).PowerLawSlip(**a),
        electrokinetic_slip=lambda a: __import__(
            'goma_tpu.bc', fromlist=['ElectrokineticSlip']
        ).ElectrokineticSlip(**a),
        level_set_slip=lambda a: __import__(
            'goma_tpu.bc', fromlist=['LevelSetSlip']).LevelSetSlip(**a),
        slip_heating=lambda a: __import__(
            'goma_tpu.bc', fromlist=['SlipHeating']).SlipHeating(**a),
        laser_weld_flux=lambda a: __import__(
            'goma_tpu.bc', fromlist=['LaserWeldFlux']).LaserWeldFlux(**a),
        qvapor=lambda a: __import__(
            'goma_tpu.bc', fromlist=['QVaporFlux']).QVaporFlux(**a),
        repulsive_force=lambda a: __import__(
            'goma_tpu.bc.wetting', fromlist=['RepulsiveForce']
        ).RepulsiveForce(**a),
        flow_pressure=lambda a: FlowPressure(**a),
        qconv=lambda a: ConvectiveHeatFlux(**a),
        qrad=lambda a: RadiativeHeatFlux(**a),
        yflux_mtc=lambda a: MassTransferFlux(**a),
        em_absorbing=lambda a: EMAbsorbingBC(**a),
        hor_flux=lambda a: __import__('goma_tpu.physics.electro', fromlist=['HORFlux']).HORFlux(**a),
        orr_flux=lambda a: __import__('goma_tpu.physics.electro', fromlist=['ORRFlux']).ORRFlux(**a),
        dg_stress_inflow=lambda a: DGStressInflow(**a),
        ls_curvature_boundary=lambda a: __import__(
            'goma_tpu.physics.level_set',
            fromlist=['LSCurvatureBoundary']).LSCurvatureBoundary(**a),
    )

    from goma_tpu.bc import (EndpointAdvectiveOutflow, EndpointFlux,
                             SDCStefanFlow)
    from goma_tpu.bc.wetting import CapRepulse, LSWettingSpeed
    from goma_tpu.physics import CapillaryZNormal

    _FACE_KERNELS.update(
        endpoint_flux=lambda a: EndpointFlux(**a),
        endpoint_outflow=lambda a: EndpointAdvectiveOutflow(**a),
        capillary_zmode=lambda a: CapillaryZNormal(**a),
        wetting_speed=lambda a: LSWettingSpeed(**a),
        cap_repulse=lambda a: CapRepulse(**a),
        sdc_stefan_flow=lambda a: SDCStefanFlow(**a),
    )

    from goma_tpu.bc import LatentHeatFlux, PorousMassFlux, VNormLeak

    _FACE_KERNELS.update(
        porous_flux=lambda a: PorousMassFlux(**a),       # POROUS_FLUX
        latent_heat=lambda a: LatentHeatFlux(**a),       # LATENT_HEAT
        vnorm_leak=lambda a: VNormLeak(**a),             # VNORM_LEAK
    )


_EDGE_KERNELS = {}


def _init_edge_registry():
    """3D edge-curve BC cards (reference bc_curve.c families)."""
    from goma_tpu.bc.edge import (CAEdge, EdgeTraction, VarCAEdge,
                                  VeloNormalEdge, VeloTangentEdge)

    _EDGE_KERNELS.update(
        velo_tangent_edge=lambda a: VeloTangentEdge(**a),
        velo_normal_edge=lambda a: VeloNormalEdge(**a),
        edge_traction=lambda a: EdgeTraction(**a),
        ca_edge=lambda a: CAEdge(**a),                   # CA_EDGE(_INT)
        var_ca_edge=lambda a: VarCAEdge(**a),            # VAR_CA_EDGE
    )


def build_mesh(spec: dict):
    spec = dict(spec)
    kind = spec.pop("kind")
    if kind == "rectangle":
        return rectangle_mesh(**spec)
    if kind == "box":
        return box_mesh(**spec)
    if kind == "exodus":
        from goma_tpu.io import read_exodus

        mesh, _, _ = read_exodus(spec["path"])
        return mesh
    raise ValueError(f"unknown mesh kind {kind}")


#: numpy attributes reachable as ``np.<name>`` inside deck expressions.
_EXPR_NP_ATTRS = frozenset(
    "pi e sin cos tan arcsin arccos arctan arctan2 sinh cosh tanh sqrt exp "
    "log log2 log10 abs minimum maximum clip floor ceil round power sign "
    "deg2rad rad2deg hypot linspace arange array".split()
)

_EXPR_FUNCS = {"pi": np.pi, "e": np.e, "sin": np.sin, "cos": np.cos,
               "sqrt": np.sqrt, "exp": np.exp, "log": np.log,
               "tan": np.tan, "abs": np.abs, "min": min, "max": max}


def _safe_eval_expr(src: str):
    """Evaluate a deck arithmetic expression from an untrusted JSON file.

    Replaces a bare ``eval`` (which is escapable even with empty
    ``__builtins__``): the expression is parsed with :mod:`ast` and only
    arithmetic/comparison nodes, numeric constants, whitelisted names, and
    calls to whitelisted functions (incl. ``np.<fn>`` for a fixed list of
    numpy math functions) are permitted. Anything else —  attribute
    traversal, subscripts on arbitrary objects, lambdas, comprehensions —
    raises ``ValueError``. Decks therefore read as pure data."""
    import ast

    tree = ast.parse(src.strip(), mode="eval")

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float, complex, bool)):
                return node.value
            raise ValueError(f"disallowed constant {node.value!r} in deck expression")
        if isinstance(node, ast.Name):
            if node.id in _EXPR_FUNCS:
                return _EXPR_FUNCS[node.id]
            raise ValueError(f"unknown name {node.id!r} in deck expression")
        if isinstance(node, ast.Attribute):
            if (isinstance(node.value, ast.Name) and node.value.id == "np"
                    and node.attr in _EXPR_NP_ATTRS):
                return getattr(np, node.attr)
            raise ValueError("only np.<mathfn> attributes allowed in deck expressions")
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.UAdd, ast.USub, ast.Not)):
            v = ev(node.operand)
            return {ast.UAdd: lambda x: +x, ast.USub: lambda x: -x,
                    ast.Not: lambda x: not x}[type(node.op)](v)
        if isinstance(node, ast.BinOp):
            ops = {ast.Add: lambda a, b: a + b, ast.Sub: lambda a, b: a - b,
                   ast.Mult: lambda a, b: a * b, ast.Div: lambda a, b: a / b,
                   ast.Pow: lambda a, b: a ** b, ast.Mod: lambda a, b: a % b,
                   ast.FloorDiv: lambda a, b: a // b}
            if type(node.op) in ops:
                return ops[type(node.op)](ev(node.left), ev(node.right))
            raise ValueError("disallowed operator in deck expression")
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            cmps = {ast.Lt: lambda a, b: a < b, ast.LtE: lambda a, b: a <= b,
                    ast.Gt: lambda a, b: a > b, ast.GtE: lambda a, b: a >= b,
                    ast.Eq: lambda a, b: a == b, ast.NotEq: lambda a, b: a != b}
            if type(node.ops[0]) in cmps:
                return cmps[type(node.ops[0])](ev(node.left), ev(node.comparators[0]))
            raise ValueError("disallowed comparison in deck expression")
        if isinstance(node, (ast.Tuple, ast.List)):
            vals = [ev(e) for e in node.elts]
            return tuple(vals) if isinstance(node, ast.Tuple) else vals
        if isinstance(node, ast.Call):
            if node.keywords:
                raise ValueError("keyword args not allowed in deck expressions")
            fn = ev(node.func)
            return fn(*[ev(a) for a in node.args])
        raise ValueError(f"disallowed syntax {type(node).__name__} in deck expression")

    return ev(tree)


def expand_expressions(obj):
    """Aprepro-equivalent for pure-JSON decks (reference: in-process SEACAS
    aprepro, ``src/util/aprepro_helper.cpp``, -a flag): any string value of
    the form ``"expr: <expression>"`` is evaluated by a sandboxed AST walker
    (arithmetic + whitelisted math functions + ``np.<mathfn>`` only — see
    ``_safe_eval_expr``). Python decks don't need this — they have real
    expressions — but JSON files shipped as decks do."""
    if isinstance(obj, str) and obj.startswith("expr:"):
        return _safe_eval_expr(obj[5:])
    if isinstance(obj, dict):
        return {k: expand_expressions(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(expand_expressions(v) for v in obj)
    return obj


_GD_AXES = {"x": 0, "y": 1, "z": 2}


def build_gd_value(spec: dict):
    """Declarative generalized-Dirichlet value: a PRODUCT of one-variable
    factors, each a function of a coordinate (x/y/z/r) or of time.

    Parity: the reference's GD_* card family — GD_CONST / GD_LINEAR /
    GD_PARAB / GD_POLYN / GD_TIME (linear, exponential, sinusoidal, table)
    / GD_TABLE (``src/mm_input_bc.c`` ``rd_bc_specs`` GD branch, applied
    through ``src/bc_colloc.c``) and the TABLE_WICV/WICS space/time tables.
    The reference chains GD cards on one (equation, nodeset) into a product
    of factors; here the ``"gd"`` list is that chain.

    spec forms::

        {"gd": [factor, ...]}            # product of factors
        {"table": {...}}                 # shorthand for one table factor

    factor: ``{"fn": <kind>, "var": "x"|"y"|"z"|"r"|"time", ...}`` with

    - ``const``:  c[0]
    - ``linear``: c[0] + c[1]*s
    - ``parab``:  c[0] + c[1]*s + c[2]*s^2
    - ``parab_offset``: c[0] + c[1]*(s - c[3]) + c[2]*(s - c[3])^2
                  (GD_PARAB_OFFSET, ``src/bc_colloc.c:2121``)
    - ``inverse``: c[0] + c[1]/s (GD_INVERSE, ``src/bc_colloc.c:2085``)
    - ``circ``:   c[2]*(s - c[1])^2 - c[0]^2 (GD_CIRC — circular/elliptic
                  geometry factor, ``src/bc_colloc.c:2144``)
    - ``poly``:   sum_k c[k] s^k
    - ``sin``:    c[0] + c[1]*sin(c[2]*s + c[3])
    - ``exp``:    c[0] + c[1]*exp(c[2]*s)
    - ``table``:  piecewise-linear through ``points`` [[s, v], ...]
                  (clamped outside the range)

    Returns a ``(coords, params) -> (n,)`` callable (live at assembly, so
    time-dependent factors follow the transient solver's clock).
    """
    import jax.numpy as jnp

    if "table" in spec and "gd" not in spec:
        spec = {"gd": [dict(spec["table"], fn="table")]}
    factors = [dict(f) for f in spec["gd"]]
    for f in factors:
        kind, var = f.get("fn", "const"), f.get("var", "x")
        if kind not in ("const", "linear", "parab", "parab_offset",
                        "inverse", "circ", "poly", "sin", "exp", "table"):
            raise ValueError(f"unknown gd factor fn {kind!r}")
        if var not in ("x", "y", "z", "r", "time"):
            raise ValueError(f"unknown gd factor var {var!r}")
        if kind == "table":
            pts = np.asarray(f["points"], dtype=float)
            if pts.ndim != 2 or pts.shape[1] != 2 or pts.shape[0] < 2:
                raise ValueError("gd table needs points [[s, v], ...]")
            if not np.all(np.diff(pts[:, 0]) > 0):
                raise ValueError("gd table abscissae must be increasing")
            f["_pts"] = pts

    def value(coords, params):
        out = None
        for f in factors:
            var = f.get("var", "x")
            if var == "time":
                s = params["time"]
            elif var == "r":
                s = jnp.sqrt(coords[:, 0] ** 2 + coords[:, 1] ** 2)
            else:
                s = coords[:, _GD_AXES[var]]
            kind = f.get("fn", "const")
            c = f.get("c", [0.0])
            if kind == "const":
                g = jnp.asarray(c[0]) + 0.0 * s
            elif kind == "linear":
                g = c[0] + c[1] * s
            elif kind == "parab":
                g = c[0] + c[1] * s + c[2] * s**2
            elif kind == "parab_offset":
                so = s - c[3]
                g = c[0] + c[1] * so + c[2] * so**2
            elif kind == "inverse":
                g = c[0] + c[1] / s
            elif kind == "circ":
                g = c[2] * (s - c[1]) ** 2 - c[0] ** 2
            elif kind == "poly":
                g = sum(ck * s**k for k, ck in enumerate(c))
            elif kind == "sin":
                g = c[0] + c[1] * jnp.sin(c[2] * s + (c[3] if len(c) > 3
                                                      else 0.0))
            elif kind == "exp":
                g = c[0] + c[1] * jnp.exp(c[2] * s)
            else:  # table
                pts = f["_pts"]
                g = jnp.interp(s, jnp.asarray(pts[:, 0]),
                               jnp.asarray(pts[:, 1]))
            g = jnp.broadcast_to(g, (coords.shape[0],))
            out = g if out is None else out * g
        return out

    return value


def build_problem(deck: dict) -> tuple[Problem, dict]:
    """Build a finalized Problem from a deck. Returns (problem, echo) where
    echo is the fully-resolved deck (reference: input echo file)."""
    if not _EQUATIONS:
        _init_registry()
        _init_face_registry()
        _init_edge_registry()
    deck = expand_expressions(deck)
    echo: dict[str, Any] = json.loads(json.dumps(deck, default=str))

    mesh = build_mesh(deck["mesh"])
    # immersed (overset) boundary blocks: independent BAR blocks overlapping
    # the background mesh (reference: the overlapping solid mesh of
    # bc_contact.c); reference them by name in the "overset" section
    for im in deck.get("immersed", []):
        im = dict(im)
        kind = im.pop("kind")
        from goma_tpu.mesh.immersed import circle_block, polyline_block

        if kind == "circle":
            circle_block(mesh, **im)
        elif kind == "polyline":
            polyline_block(mesh, np.asarray(im.pop("points"), dtype=float), **im)
        else:
            raise ValueError(f"unknown immersed kind {kind}")
    def _mk(e):
        e = dict(e)
        return _EQUATIONS[e.pop("type")](e)

    eqspec = deck["equations"]
    if eqspec and isinstance(eqspec[0], (list, tuple)):
        # per-block equation lists (multi-block decks)
        eqs = [[_mk(e) for e in block] for block in eqspec]
    else:
        eqs = [_mk(e) for e in eqspec]
    mat = deck.get("material", {})
    mat = [dict(m) for m in mat] if isinstance(mat, (list, tuple)) else dict(mat)
    prob = Problem(
        mesh, eqs, mat,
        quad_order=deck.get("quad_order", 3),
        external_fields=tuple(deck.get("external_fields", ())),
    )
    for ov in deck.get("overset", []):
        ov = dict(ov)
        kspec = dict(ov.pop("kernel"))
        ktype = kspec.pop("type", "no_slip")
        if ktype == "no_slip":
            from goma_tpu.physics.overset import OversetNoSlip

            kern = OversetNoSlip(**kspec)
        elif ktype == "fsi":
            from goma_tpu.physics.overset import OversetFSI

            kern = OversetFSI(**kspec)
        else:
            raise KeyError(f"unknown overset kernel {ktype}")
        prob.add_overset(ov.pop("bar_block"), ov.pop("fluid_block"), kern,
                         quad_order=ov.pop("quad_order", None),
                         solid=tuple(ov["solid"]) if ov.get("solid") else None)
    for bc in deck.get("bcs", []):
        bc = dict(bc)
        kind = bc.pop("kind")
        if kind == "dirichlet":
            value = bc["value"]
            if isinstance(value, dict):  # GD_*/table card (build_gd_value)
                value = build_gd_value(value)
            prob.add_dirichlet(bc["nodeset"], bc["var"], bc.get("comp", 0), value)
        elif kind == "pin":
            node = bc.get("node", 0)
            name = f"_pin_{bc['var']}"
            mesh.nodesets[name] = np.array([node], dtype=np.int32)
            prob.add_dirichlet(name, bc["var"], bc.get("comp", 0), bc.get("value", 0.0))
        elif kind == "face":
            k = bc.pop("sideset")
            fk = _FACE_KERNELS[bc.pop("type")](bc.get("args", {}))
            prob.add_face_kernel(k, fk)
        elif kind == "edge":
            # 3D curve BC on a sideset intersection (bc_curve.c cards)
            ek = _EDGE_KERNELS[bc.pop("type")](bc.get("args", {}))
            prob.add_edge_kernel(bc["sideset_a"], bc["sideset_b"], ek)
        elif kind == "rotated":
            # rotated strong constraint q.n / q.t = value (ROT cards +
            # VELO_NORMAL/VELO_TANGENT strong forms)
            value = bc.get("value", 0.0)
            if isinstance(value, dict):
                value = build_gd_value(value)
            prob.add_rotated_dirichlet(bc["sideset"], bc["var"],
                                       bc.get("direction", "normal"), value)
        else:
            raise ValueError(f"unknown bc kind {kind}")
    prob.finalize()
    echo["resolved"] = {
        "n_dof": prob.dofmap.n_dof,
        "n_elem": mesh.n_elem,
        "n_nodes": mesh.n_nodes,
        "nnz": prob.pattern.nnz,
        "variables": [(v.name, v.ncomp) for v in prob.dofmap.vars],
    }
    # BC duplicate resolutions made at finalize — the reference's -bc_dup
    # diagnostic output (src/mm_bc_conflict.c), echoed alongside the deck
    if getattr(prob, "bc_dup_log", None):
        echo["resolved"]["bc_dup"] = prob.bc_dup_report()
    return prob, echo


def run_deck(deck: dict, x0=None, params_extra: dict | None = None):
    """Build + solve a deck (steady Newton, or transient when "time" given).
    ``solver: {"distributed": true, ...}`` routes through the
    partitioned-DOF multi-device path (reference: ``mpirun -np N goma``).
    Returns (problem, result, echo)."""
    prob, echo = build_problem(deck)
    sdeck = dict(deck.get("solver", {}))
    distributed = sdeck.pop("distributed", False)
    params = prob.base_params(**(params_extra or {}))
    if x0 is None:
        x0 = np.zeros(prob.dofmap.n_dof)
        for init in deck.get("initial", []):
            x0 = prob.set_nodal_field(x0, init["var"], init.get("comp", 0), init["value"])
    if distributed:
        from goma_tpu.parallel.partitioned import (PartitionedNewtonSolver,
                                                   PartitionedProblem,
                                                   PartitionedTransientSolver)

        nmap = dict(max_iter=sdeck.get("max_iter", 12),
                    tol_residual=sdeck.get("tol_residual", 1e-10),
                    linear_tol=sdeck.get("linear_tol", 1e-10),
                    restart=sdeck.get("gmres_restart", 60),
                    linear_maxiter=sdeck.get("linear_maxiter", 2000),
                    smoother=sdeck.get("smoother", "bj"))
        pp = PartitionedProblem(prob)
        if "time" in deck:
            t = dict(deck["time"])
            result = PartitionedTransientSolver(
                pp, newton=nmap, dt0=t.get("dt0", 1e-2),
                t_end=t.get("t_end", 1.0), theta=t.get("theta", 0.0),
            ).run(x0, params)
        else:
            result = PartitionedNewtonSolver(pp, **nmap).solve(x0, params)
    elif "time" in deck:
        from goma_tpu.solvers.transient import TimeOptions, TransientSolver

        sopts = NewtonOptions(**sdeck)
        ts = TransientSolver(prob, sopts, TimeOptions(**deck["time"]))
        result = ts.run(x0, params)
    else:
        result = NewtonSolver(prob, NewtonOptions(**sdeck)).solve(x0, params)
    out = deck.get("output", {})
    if "exodus" in out:
        from goma_tpu.io import write_exodus

        fields = {}
        for v in prob.dofmap.vars:
            for c in range(v.ncomp):
                fields[f"{v.name}{c if v.ncomp > 1 else ''}"] = np.nan_to_num(
                    prob.get_nodal_field(result.x, v.name, c)
                )
        write_exodus(out["exodus"], prob.mesh, nodal_vars=fields)
    return prob, result, echo
