"""Variable registry.

Parity: the reference's 215 variable types (``include/rf_fem_const.h:929``)
and per-variable interpolation metadata (``include/mm_as_const.h``). Here a
variable is (name, ncomp); the interpolation is chosen per (block, equation).
Scalar components are the unit of dof bookkeeping ("svar" = (var, comp)).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Var:
    name: str
    ncomp: int


def sym_tensor_ncomp(dim: int) -> int:
    """Symmetric tensor component count: 2D -> (11,12,22) [+33 for axisym],
    3D -> 6. The reference keeps s33 in 2D for axisymmetric problems; we add
    it only when the coordinate system requires it."""
    return 3 if dim == 2 else 6


# canonical component orderings for symmetric tensors
SYM2D = ((0, 0), (0, 1), (1, 1))
SYM3D = ((0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2))


def sym_comps(dim: int):
    return SYM2D if dim == 2 else SYM3D


def resolve_interp(family: str, interp: str) -> str:
    """Map abstract interpolation names to family-specific ones.

    Physics code says "Q1"/"Q2" (continuous linear/quadratic); on simplex
    families these become P1/P2. Elemental interps P0/P1E pass through.
    """
    if interp in ("P0", "P1E"):
        return interp
    if family in ("tri", "tet"):
        return {"Q1": "P1", "Q2": "P2"}.get(interp, interp)
    return interp
