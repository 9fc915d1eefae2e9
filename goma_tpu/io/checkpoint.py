"""Checkpoint / restart.

Parity: reference continuation/restart files (``src/wr_soln.c:40
write_solution`` ASCII solution dumps re-read as ``Initial Guess = read``)
and Exodus-time-plane restart (``-restart`` flag). Here: a single .npz with
the full transient state (x, x_old, xdot, t, dt) + a mesh fingerprint so a
restart against the wrong mesh fails loudly. Old time derivatives are
stored, not reconstructed (an improvement over the reference). Orbax-sharded
checkpointing is the planned extension for dof-partitioned multi-chip runs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np


def mesh_fingerprint(mesh) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(mesh.coords))
    for b in mesh.blocks:
        h.update(b.elem_type.encode())
        h.update(np.ascontiguousarray(b.conn))
    return h.hexdigest()[:16]


def save_checkpoint(path: str, problem, x, xdot=None, t: float = 0.0, dt: float = 0.0,
                    extra: dict | None = None):
    np.savez_compressed(
        path,
        x=np.asarray(x),
        xdot=np.asarray(xdot) if xdot is not None else np.zeros_like(np.asarray(x)),
        t=t,
        dt=dt,
        mesh_fp=mesh_fingerprint(problem.mesh),
        **(extra or {}),
    )


def load_checkpoint(path: str, problem):
    d = np.load(path, allow_pickle=False)
    fp = str(d["mesh_fp"])
    if fp != mesh_fingerprint(problem.mesh):
        raise ValueError(
            f"checkpoint mesh fingerprint {fp} does not match problem mesh "
            f"{mesh_fingerprint(problem.mesh)}"
        )
    return dict(x=d["x"], xdot=d["xdot"], t=float(d["t"]), dt=float(d["dt"]))


def anneal_mesh(problem, x, zero_displacement: bool = True):
    """Bake the solved mesh displacement into the coordinates (reference
    ``anneal_mesh``, src/rf_solve.c:2892): returns (new Mesh, new x) where
    the new mesh's coords are X + d and (optionally) the displacement
    entries of the state are zeroed — the standard restart point for
    continuing an ALE solve on the deformed configuration."""
    import copy

    import numpy as np

    from goma_tpu.fem.fields import MESH_VAR

    mesh = problem.mesh
    new = copy.deepcopy(mesh)
    x = np.array(x, copy=True)
    dofmap = problem.dofmap
    if not any(v.name == MESH_VAR for v in dofmap.vars):
        raise ValueError("anneal_mesh: no mesh displacement variable")
    for c in range(new.coords.shape[1]):
        d = dofmap.dof_of_node_svar[:, dofmap.svar(MESH_VAR, c)]
        ok = d >= 0
        new.coords[ok, c] += x[d[ok]]
        if zero_displacement:
            x[d[ok]] = 0.0
    return new, x
