"""Shell equations on curve (BAR) blocks embedded in 2D meshes.

Parity: reference shell family ``src/mm_fill_shell.c`` (40+ shell equations)
+ ``src/mm_shell_util.c`` shell-bulk "friend" coupling. TPU-first design:
shell elements are ordinary BAR blocks whose connectivity references the
same global nodes as the bulk boundary, so any variable shared between bulk
and shell couples automatically through the node-major dof map — the
reference's cross-element variable gather (``load_neighbor_var_data:1330``)
is simply not needed.

``attach_shell_block`` builds a BAR block along a side set.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from goma_tpu.fem.equations import Equation
from goma_tpu.physics.materials import prop


def attach_shell_block(mesh, sideset: str, name: str = "shell") -> int:
    """Create a BAR2/BAR3 block along a sideset's faces (2D bulk only).
    Returns the new block index."""
    from goma_tpu.elements import element_type
    from goma_tpu.mesh.mesh import Block, _face_all_nodes

    ss = mesh.sidesets[sideset]
    conn = []
    order = None
    for e, f in zip(ss.elems, ss.faces):
        bi, le = mesh.global_elem_block(int(e))
        b = mesh.blocks[bi]
        et = element_type(b.elem_type)
        if et.dim != 2:
            raise NotImplementedError("shell blocks on 3D bulk: later round")
        nodes = _face_all_nodes(et, int(f))
        face_corners = nodes[:2]
        mids = nodes[2:]
        if mids:
            row = [b.conn[le, face_corners[0]], b.conn[le, face_corners[1]],
                   b.conn[le, mids[0]]]
            order = 2
        else:
            row = [b.conn[le, face_corners[0]], b.conn[le, face_corners[1]]]
            order = 1
        conn.append(row)
    etname = "BAR3" if order == 2 else "BAR2"
    mesh.blocks.append(Block(name, etname, np.asarray(conn, dtype=np.int32)))
    return len(mesh.blocks) - 1


class ShellConduction(Equation):
    """Surface conduction along the shell: int ks dT/ds dphi/ds
    (adds in-plane shell conductivity to a bulk-shared temperature —
    reference shell energy, assemble_shell_energy)."""

    def __init__(self, ks: float, var: str = "temperature", interp: str = "Q2"):
        super().__init__(var, 1, interp)
        self.ks = ks

    def residual(self, fv, mat, params):
        dT = fv.grad_s[self.var][:, 0]
        dphi = fv.dphi_ds[self.var]
        return (self.ks * jnp.einsum("q,qi->qi", dT, dphi))[:, None, :]


class TensionedString(Equation):
    """Membrane/string deflection under transverse load:
    -T d2w/ds2 = q  ->  int T dw/ds dphi/ds - phi q.
    Reference analog: structural shell tension (assemble_shell_tension)."""

    def __init__(self, tension: float, load, var: str = "shell_deflection",
                 interp: str = "Q2", transient: bool = False):
        super().__init__(var, 1, interp)
        self.T = tension
        self.load = load
        self.transient = transient

    def residual(self, fv, mat, params):
        dw = fv.grad_s[self.var][:, 0]
        dphi = fv.dphi_ds[self.var]
        phi = fv.phi[self.var]
        q = self.load(fv, mat, params) if callable(self.load) else self.load
        q = jnp.broadcast_to(jnp.asarray(q), dw.shape)
        c = self.T * jnp.einsum("q,qi->qi", dw, dphi) - jnp.einsum("q,qi->qi", q, phi)
        if self.transient:
            rho = prop(mat, "shell_rho", fv, params, 1.0)
            c = c + rho * jnp.einsum("q,qi->qi", fv.dot[self.var][:, 0], phi)
        return c[:, None, :]
