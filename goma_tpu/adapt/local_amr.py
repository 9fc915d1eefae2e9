"""Indicator-driven LOCAL mesh refinement (red/green, hanging-node-free).

Parity: the reference's metric-driven local AMR
(``/root/reference/src/adapt/omega_h_interface.cpp:1325 adapt_mesh_omega_h``
— Omega_h tri/tet refinement keyed to an LS-band / error metric, with
solution transfer and problem re-setup). TPU-first redesign: refinement runs
fully on host between solves (device shapes stay static per Problem); the
classic red/green pattern on triangle meshes refines ONLY the marked
elements, closing neighbors with green bisections so no hanging nodes ever
exist — the new mesh drops into a fresh ``Problem`` and
``adapt.transfer_solution`` carries the state across (the
``resetup_problem`` analog).

Rules (Bank et al.):
- marked elements split RED: 4 similar children via edge midpoints;
- any element with >= 2 split edges is promoted to red (closure loop);
- an element with exactly 1 split edge splits GREEN: bisected toward the
  midpoint (children are never green-refined again — one adapt pass per
  call keeps quality bounded).

Supports single-block TRI3/TRI6 meshes (quads: build the deck on triangles
or convert; the reference's omega_h path is simplex-only too). Nodesets and
sidesets are carried over: a new midpoint node joins every nodeset that
contains both edge endpoints; sidesets are rebuilt from the old boundary
edges' node sets.
"""

from __future__ import annotations

import numpy as np

from goma_tpu.mesh.mesh import Block, Mesh, SideSet

_EDGES = ((0, 1), (1, 2), (2, 0))


def mark_ls_band(mesh, F: np.ndarray, band: float) -> np.ndarray:
    """Mark elements whose nodal level-set values cross zero or come within
    ``band`` of it (the reference's LS-band refinement trigger,
    omega_h_interface.cpp ls metric)."""
    blk = mesh.blocks[0]
    Fe = F[blk.conn[:, :3]]
    return (np.abs(Fe).min(axis=1) < band) | \
        (np.sign(Fe).max(axis=1) != np.sign(Fe).min(axis=1))


def mark_top_fraction(eta: np.ndarray, frac: float = 0.2) -> np.ndarray:
    """Doerfler-style marking: the elements carrying the largest indicator
    values (top ``frac`` by count)."""
    n = eta.shape[0]
    k = max(1, int(np.ceil(frac * n)))
    thr = np.partition(eta, n - k)[n - k]
    return eta >= thr


def red_green_refine(mesh: Mesh, marked: np.ndarray) -> Mesh:
    """One red/green refinement pass of a single-block TRI3/TRI6 mesh.
    ``marked``: (n_elem,) bool. Returns a NEW mesh (same element type)."""
    assert len(mesh.blocks) == 1, "local AMR: single-block tri meshes"
    blk = mesh.blocks[0]
    if blk.elem_type not in ("TRI3", "TRI6"):
        raise NotImplementedError(
            f"red/green refinement needs TRI3/TRI6 (got {blk.elem_type}); "
            "build the deck on triangles for local AMR")
    quadratic = blk.elem_type == "TRI6"
    conn3 = np.asarray(blk.conn[:, :3], dtype=np.int64)
    ne = conn3.shape[0]
    marked = np.asarray(marked, dtype=bool).copy()
    assert marked.shape == (ne,)

    def ekey(a, b):
        return (a, b) if a < b else (b, a)

    # closure: promote any element with >= 2 split edges to red
    red = marked.copy()
    while True:
        split = set()
        for e in np.where(red)[0]:
            c = conn3[e]
            for i, j in _EDGES:
                split.add(ekey(c[i], c[j]))
        changed = False
        for e in np.where(~red)[0]:
            c = conn3[e]
            ns = sum(ekey(c[i], c[j]) in split for i, j in _EDGES)
            if ns >= 2:
                red[e] = True
                changed = True
        if not changed:
            break

    # midpoint nodes for every split edge; a TRI6 parent's midside node
    # already sits at the midpoint — reuse it (no duplicates, no orphans)
    old_mid: dict[tuple[int, int], int] = {}
    if quadratic:
        for e in range(ne):
            c = conn3[e]
            for s, (i, j) in enumerate(_EDGES):
                old_mid[ekey(c[i], c[j])] = int(blk.conn[e, 3 + s])
    coords = [mesh.coords]
    mid: dict[tuple[int, int], int] = {}
    nxt = mesh.n_nodes
    newpts = []
    for k in sorted(split):
        if k in old_mid:
            mid[k] = old_mid[k]
            continue
        mid[k] = nxt
        newpts.append(0.5 * (mesh.coords[k[0]] + mesh.coords[k[1]]))
        nxt += 1
    if newpts:
        coords.append(np.asarray(newpts))
    coords3 = np.concatenate(coords, axis=0)

    # children (corner connectivity, parent orientation preserved)
    newconn = []
    parent = []
    for e in range(ne):
        c = conn3[e]
        ek = [ekey(c[i], c[j]) for i, j in _EDGES]
        have = [k in mid for k in ek]
        if red[e]:
            m01, m12, m20 = (mid[k] for k in ek)
            newconn += [[c[0], m01, m20], [m01, c[1], m12],
                        [m20, m12, c[2]], [m01, m12, m20]]
            parent += [e] * 4
        elif any(have):
            # green: bisect toward the single split edge's midpoint
            i = have.index(True)
            m = mid[ek[i]]
            a, b = _EDGES[i]
            opp = 3 - a - b
            newconn += [[c[a], m, c[opp]], [m, c[b], c[opp]]]
            parent += [e] * 2
        else:
            newconn.append(list(c))
            parent.append(e)
    newconn = np.asarray(newconn, dtype=np.int64)

    # elevate to TRI6: one midside node per unique edge of the new mesh;
    # surviving old edges keep their old midside node
    if quadratic:
        emap: dict[tuple[int, int], int] = {
            k: m for k, m in old_mid.items() if k not in split}
        mids = []
        conn6 = np.zeros((newconn.shape[0], 6), dtype=np.int64)
        conn6[:, :3] = newconn
        for e in range(newconn.shape[0]):
            c = newconn[e]
            for s, (i, j) in enumerate(_EDGES):
                k = ekey(c[i], c[j])
                if k not in emap:
                    emap[k] = nxt
                    mids.append(0.5 * (coords3[k[0]] + coords3[k[1]]))
                    nxt += 1
                conn6[e, 3 + s] = emap[k]
        coords_f = np.concatenate([coords3, np.asarray(mids)], axis=0) \
            if mids else coords3
        final_conn = conn6
    else:
        coords_f = coords3
        final_conn = newconn

    out = Mesh(mesh.dim, coords_f,
               [Block(blk.name, blk.elem_type,
                      final_conn.astype(np.int32), blk.material)])

    # nodesets: old members + any new node whose defining endpoints are all
    # in the set (edge midpoints of split member edges; TRI6 midsides ditto)
    node_parents: dict[int, tuple[int, int]] = {}
    for k, m in mid.items():
        node_parents[m] = k
    if quadratic:
        for k, m in emap.items():
            pa = []
            for p in k:
                pa.append(p)
            node_parents[m] = tuple(pa)

    def close_nodeset(ns: np.ndarray) -> np.ndarray:
        s = set(int(v) for v in ns)
        # iterate: midpoints of midpoints (TRI6 midsides of split halves)
        changed = True
        while changed:
            changed = False
            for m, (a, b) in node_parents.items():
                if m not in s and a in s and b in s:
                    s.add(m)
                    changed = True
        return np.asarray(sorted(s), dtype=np.int32)

    out.nodesets = {name: close_nodeset(ns)
                    for name, ns in mesh.nodesets.items()}

    # sidesets: rebuilt by face-node membership in the closed node sets,
    # restricted to faces on the new mesh boundary
    fc = final_conn[:, :3]
    facekeys = {}
    for e in range(fc.shape[0]):
        for f, (i, j) in enumerate(_EDGES):
            k = ekey(int(fc[e, i]), int(fc[e, j]))
            facekeys.setdefault(k, []).append((e, f))
    boundary = {k: v[0] for k, v in facekeys.items() if len(v) == 1}
    out.sidesets = {}
    for name, ss in mesh.sidesets.items():
        want = set(int(v) for v in close_nodeset(mesh.sideset_nodes(name)))
        elems, faces = [], []
        for (a, b), (e, f) in boundary.items():
            if a in want and b in want:
                elems.append(e)
                faces.append(f)
        out.sidesets[name] = SideSet(
            elems=np.asarray(elems, dtype=np.int32),
            faces=np.asarray(faces, dtype=np.int32))
    return out
