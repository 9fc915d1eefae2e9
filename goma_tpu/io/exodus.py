"""Exodus II database reader/writer on the netCDF-3 codec.

Parity: reference ``src/rd_exo.c`` / ``src/wr_exo.c`` / ``src/rd_mesh.c``
(mesh + node/side sets + nodal results), so decks prepared for the reference
(cubit meshes) load directly and our results open in paraview.

Element-name and side-numbering conventions follow Exodus; permutations to
our canonical node ordering (goma_tpu.elements.shapes docstring) are applied
on read/write.
"""

from __future__ import annotations

import numpy as np

from goma_tpu.io.netcdf3 import Dataset
from goma_tpu.mesh.mesh import Block, Mesh, SideSet

_EXO_NAME = {
    "QUAD4": "QUAD4", "QUAD9": "QUAD9", "TRI3": "TRI3", "TRI6": "TRI6",
    "HEX8": "HEX8", "HEX27": "HEX27", "TET4": "TETRA4", "TET10": "TETRA10",
}
_FROM_EXO_NAME = {
    "QUAD": "QUAD4", "QUAD4": "QUAD4", "QUAD9": "QUAD9",
    "TRI": "TRI3", "TRI3": "TRI3", "TRI6": "TRI6",
    "HEX": "HEX8", "HEX8": "HEX8", "HEX27": "HEX27",
    "TETRA": "TET4", "TETRA4": "TET4", "TET4": "TET4",
    "TETRA10": "TET10", "TET10": "TET10",
}

# node permutation ours[i] = exo node index (0-based) at our position i
_PERM_TO_EXO = {
    # identical for 2D types and HEX8/TET4/TET10
    "HEX27": np.array(
        list(range(8))           # corners
        + list(range(8, 12))     # bottom edges
        + list(range(16, 20))    # our top edges -> exo 17-20
        + list(range(12, 16))    # our vertical  -> exo 13-16
        + [25, 26, 21, 22, 23, 24]  # our faces z-,z+,y-,x+,y+,x- -> exo 26,27,22..25
        + [20],                  # our center -> exo 21
        dtype=np.int64,
    )
}
# side mapping ours -> exodus side number (1-based)
_SIDE_TO_EXO = {
    "quad": np.array([1, 2, 3, 4]),
    "tri": np.array([1, 2, 3]),
    # our faces 0:z- 1:z+ 2:y- 3:x+ 4:y+ 5:x-  -> exo sides 5,6,1,2,3,4
    "hex": np.array([5, 6, 1, 2, 3, 4]),
    # our faces 0:(0,2,1) 1:(0,1,3) 2:(1,2,3) 3:(0,3,2) -> exo 4,1,2,3
    "tet": np.array([4, 1, 2, 3]),
}


def _perm_to_exo(elem_type: str, n: int) -> np.ndarray:
    if elem_type in _PERM_TO_EXO:
        return _PERM_TO_EXO[elem_type]
    return np.arange(n, dtype=np.int64)


def write_exodus(path: str, mesh: Mesh, nodal_vars: dict[str, np.ndarray] | None = None,
                 times: np.ndarray | None = None, title: str = "goma_tpu",
                 elem_vars: dict[str, np.ndarray] | None = None):
    """Write mesh (+ optional time series of per-node fields) to Exodus II.

    nodal_vars: name -> (n_times, n_nodes) or (n_nodes,) arrays.
    elem_vars: name -> (n_times, n_elem_total) or (n_elem_total,) arrays in
    global element order (reference: element post variables,
    ``post_process_elem``, src/mm_post_proc.c:5748).
    """
    ds = Dataset()
    ds.attrs = {
        "title": title, "api_version": np.float32(8.25), "version": np.float32(8.25),
        "floating_point_word_size": np.int32(8), "file_size": np.int32(1),
    }
    nn, dim = mesh.coords.shape
    ds.create_dim("len_string", 33)
    ds.create_dim("len_name", 33)
    ds.create_dim("len_line", 81)
    ds.create_dim("four", 4)
    ds.create_dim("num_dim", dim)
    ds.create_dim("num_nodes", nn)
    ds.create_dim("num_elem", mesh.n_elem)
    ds.create_dim("num_el_blk", len(mesh.blocks))
    ds.create_dim("time_step", None)

    ds.create_var("time_whole", ("time_step",),
                  np.asarray(times if times is not None else [0.0], dtype=np.float64))
    names = ["coordx", "coordy", "coordz"][:dim]
    for k, nmv in enumerate(names):
        ds.create_var(nmv, ("num_nodes",), mesh.coords[:, k].astype(np.float64))

    def charpad(strs, width=33):
        out = np.zeros((len(strs), width), dtype="S1")
        for i, s in enumerate(strs):
            b = s.encode()[: width - 1]
            out[i, : len(b)] = np.frombuffer(b, dtype="S1")
        return out

    ds.create_var("eb_prop1", ("num_el_blk",),
                  np.arange(1, len(mesh.blocks) + 1, dtype=np.int32), {"name": "ID"})
    ds.create_var("eb_status", ("num_el_blk",), np.ones(len(mesh.blocks), dtype=np.int32))
    ds.create_var("eb_names", ("num_el_blk", "len_name"),
                  charpad([b.name for b in mesh.blocks]))
    ds.create_var("coor_names", ("num_dim", "len_name"), charpad(list("xyz")[:dim]))

    for bi, b in enumerate(mesh.blocks, start=1):
        npe = b.conn.shape[1]
        ds.create_dim(f"num_el_in_blk{bi}", b.n_elem)
        ds.create_dim(f"num_nod_per_el{bi}", npe)
        perm = _perm_to_exo(b.elem_type, npe)
        # exo position j holds our node perm^-1... we need conn_exo[:, exo_j]
        inv = np.argsort(perm) if b.elem_type in _PERM_TO_EXO else perm
        conn_exo = b.conn[:, inv] if b.elem_type in _PERM_TO_EXO else b.conn
        ds.create_var(
            f"connect{bi}", (f"num_el_in_blk{bi}", f"num_nod_per_el{bi}"),
            (conn_exo + 1).astype(np.int32),
            {"elem_type": _EXO_NAME[b.elem_type]},
        )

    if mesh.nodesets:
        ds.create_dim("num_node_sets", len(mesh.nodesets))
        ds.create_var("ns_prop1", ("num_node_sets",),
                      np.arange(1, len(mesh.nodesets) + 1, dtype=np.int32), {"name": "ID"})
        ds.create_var("ns_status", ("num_node_sets",),
                      np.ones(len(mesh.nodesets), dtype=np.int32))
        ds.create_var("ns_names", ("num_node_sets", "len_name"),
                      charpad(list(mesh.nodesets)))
        for si, (name, nodes) in enumerate(mesh.nodesets.items(), start=1):
            ds.create_dim(f"num_nod_ns{si}", len(nodes))
            ds.create_var(f"node_ns{si}", (f"num_nod_ns{si}",),
                          (np.asarray(nodes) + 1).astype(np.int32))

    if mesh.sidesets:
        from goma_tpu.elements import element_type

        ds.create_dim("num_side_sets", len(mesh.sidesets))
        ds.create_var("ss_prop1", ("num_side_sets",),
                      np.arange(1, len(mesh.sidesets) + 1, dtype=np.int32), {"name": "ID"})
        ds.create_var("ss_status", ("num_side_sets",),
                      np.ones(len(mesh.sidesets), dtype=np.int32))
        ds.create_var("ss_names", ("num_side_sets", "len_name"),
                      charpad(list(mesh.sidesets)))
        for si, (name, ss) in enumerate(mesh.sidesets.items(), start=1):
            ds.create_dim(f"num_side_ss{si}", len(ss.elems))
            sides = np.empty(len(ss.elems), dtype=np.int32)
            for k, (e, f) in enumerate(zip(ss.elems, ss.faces)):
                bi, _ = mesh.global_elem_block(int(e))
                fam = element_type(mesh.blocks[bi].elem_type).family
                sides[k] = _SIDE_TO_EXO[fam][int(f)]
            ds.create_var(f"elem_ss{si}", (f"num_side_ss{si}",),
                          (np.asarray(ss.elems) + 1).astype(np.int32))
            ds.create_var(f"side_ss{si}", (f"num_side_ss{si}",), sides)

    if nodal_vars:
        ds.create_dim("num_nod_var", len(nodal_vars))
        ds.create_var("name_nod_var", ("num_nod_var", "len_name"),
                      charpad(list(nodal_vars)))
        for vi, (name, arr) in enumerate(nodal_vars.items(), start=1):
            arr = np.asarray(arr, dtype=np.float64)
            if arr.ndim == 1:
                arr = arr[None, :]
            ds.create_var(f"vals_nod_var{vi}", ("time_step", "num_nodes"), arr)
    if elem_vars:
        ds.create_dim("num_elem_var", len(elem_vars))
        ds.create_var("name_elem_var", ("num_elem_var", "len_name"),
                      charpad(list(elem_vars)))
        for vi, (name, arr) in enumerate(elem_vars.items(), start=1):
            arr = np.asarray(arr, dtype=np.float64)
            if arr.ndim == 1:
                arr = arr[None, :]
            for bi, b in enumerate(mesh.blocks, start=1):
                off = mesh.block_elem_offset(bi - 1)
                ds.create_var(
                    f"vals_elem_var{vi}eb{bi}",
                    ("time_step", f"num_el_in_blk{bi}"),
                    arr[:, off : off + b.n_elem],
                )
    ds.write(path)


def read_exodus(path: str):
    """Read mesh + nodal results. Returns (Mesh, {name: (nt, nn) array}, times)."""
    ds = Dataset.read(path)
    dim = ds.dims["num_dim"]
    nn = ds.dims["num_nodes"]
    if "coordx" in ds.vars:
        coords = np.stack(
            [ds.vars[n].data for n in ["coordx", "coordy", "coordz"][:dim]], axis=1
        ).astype(np.float64)
    else:
        coords = ds.vars["coord"].data.reshape(dim, nn).T.astype(np.float64)

    nblk = ds.dims.get("num_el_blk", 1)
    try:
        bnames = ds.chars_to_strings("eb_names")
    except KeyError:
        bnames = [f"block{i}" for i in range(1, nblk + 1)]
    blocks = []
    for bi in range(1, nblk + 1):
        v = ds.vars[f"connect{bi}"]
        exo_name = v.attrs.get("elem_type", "QUAD4").strip().upper().rstrip("\x00")
        et = _FROM_EXO_NAME[exo_name]
        conn = v.data.astype(np.int64) - 1
        if et in _PERM_TO_EXO:
            conn = conn[:, _PERM_TO_EXO[et]]
        blocks.append(Block(bnames[bi - 1] or f"block{bi}", et, conn.astype(np.int32)))

    mesh = Mesh(dim, coords, blocks)

    nns = ds.dims.get("num_node_sets", 0)
    if nns:
        try:
            names = ds.chars_to_strings("ns_names")
        except KeyError:
            names = [f"ns{i}" for i in range(1, nns + 1)]
        for si in range(1, nns + 1):
            nm = names[si - 1] or f"ns{si}"
            mesh.nodesets[nm] = (ds.vars[f"node_ns{si}"].data.astype(np.int64) - 1).astype(
                np.int32
            )

    nss = ds.dims.get("num_side_sets", 0)
    if nss:
        from goma_tpu.elements import element_type

        try:
            names = ds.chars_to_strings("ss_names")
        except KeyError:
            names = [f"ss{i}" for i in range(1, nss + 1)]
        for si in range(1, nss + 1):
            elems = ds.vars[f"elem_ss{si}"].data.astype(np.int64) - 1
            sides = ds.vars[f"side_ss{si}"].data.astype(np.int64)
            faces = np.empty_like(sides)
            for k, (e, s) in enumerate(zip(elems, sides)):
                bi, _ = mesh.global_elem_block(int(e))
                fam = element_type(mesh.blocks[bi].elem_type).family
                faces[k] = int(np.where(_SIDE_TO_EXO[fam] == s)[0][0])
            nm = names[si - 1] or f"ss{si}"
            mesh.sidesets[nm] = SideSet(elems.astype(np.int32), faces.astype(np.int32))

    results = {}
    times = ds.vars["time_whole"].data if "time_whole" in ds.vars else np.zeros(1)
    if "name_nod_var" in ds.vars:
        names = ds.chars_to_strings("name_nod_var")
        for vi, nm in enumerate(names, start=1):
            results[nm] = ds.vars[f"vals_nod_var{vi}"].data.astype(np.float64)
    if "name_elem_var" in ds.vars:
        names = ds.chars_to_strings("name_elem_var")
        for vi, nm in enumerate(names, start=1):
            parts = [ds.vars[f"vals_elem_var{vi}eb{bi}"].data.astype(np.float64)
                     for bi in range(1, len(mesh.blocks) + 1)]
            results[nm] = np.concatenate(parts, axis=-1)
    return mesh, results, np.asarray(times, dtype=np.float64)
