"""IO tests: netCDF-3 codec round trip, Exodus II mesh+results round trip
(including scipy.io.netcdf cross-validation of the file format), checkpoint
save/load with mesh fingerprinting."""

import numpy as np
import pytest

from goma_tpu.io import Dataset, load_checkpoint, read_exodus, save_checkpoint, write_exodus
from goma_tpu.mesh import box_mesh, rectangle_mesh


def test_netcdf3_roundtrip(tmp_path):
    p = str(tmp_path / "t.nc")
    ds = Dataset()
    ds.attrs = {"title": "hello", "n": np.int32(3), "pi": np.float64(3.14159)}
    ds.create_dim("x", 5)
    ds.create_dim("y", 3)
    ds.create_dim("t", None)
    ds.create_var("a", ("x", "y"), np.arange(15, dtype=np.float64).reshape(5, 3))
    ds.create_var("b", ("x",), np.arange(5, dtype=np.int32), {"units": "m"})
    ds.create_var("r", ("t", "x"), np.arange(10, dtype=np.float64).reshape(2, 5))
    ds.create_var("r2", ("t", "y"), np.arange(6, dtype=np.float32).reshape(2, 3))
    ds.write(p)

    d2 = Dataset.read(p)
    assert d2.attrs["title"] == "hello"
    assert int(d2.attrs["n"][0]) == 3
    np.testing.assert_allclose(d2.vars["a"].data, ds.vars["a"].data)
    np.testing.assert_array_equal(d2.vars["b"].data, np.arange(5))
    assert d2.vars["b"].attrs["units"] == "m"
    np.testing.assert_allclose(d2.vars["r"].data, np.arange(10).reshape(2, 5))
    np.testing.assert_allclose(d2.vars["r2"].data, np.arange(6).reshape(2, 3))


def test_netcdf3_scipy_crosscheck(tmp_path):
    """Our files must parse with an independent implementation (scipy)."""
    from scipy.io import netcdf_file

    p = str(tmp_path / "t.nc")
    ds = Dataset()
    ds.create_dim("x", 4)
    ds.create_dim("t", None)
    ds.create_var("a", ("x",), np.array([1.5, 2.5, 3.5, 4.5]))
    ds.create_var("r", ("t", "x"), np.arange(8, dtype=np.float64).reshape(2, 4))
    ds.attrs = {"title": "xcheck"}
    ds.write(p)
    with netcdf_file(p, "r", mmap=False) as f:
        np.testing.assert_allclose(f.variables["a"][:], [1.5, 2.5, 3.5, 4.5])
        np.testing.assert_allclose(f.variables["r"][:], np.arange(8).reshape(2, 4))
        assert f.title == b"xcheck"

    # and we read scipy-written files
    p2 = str(tmp_path / "s.nc")
    with netcdf_file(p2, "w") as f:
        f.createDimension("n", 3)
        v = f.createVariable("v", "d", ("n",))
        v[:] = [9.0, 8.0, 7.0]
    d = Dataset.read(p2)
    np.testing.assert_allclose(d.vars["v"].data, [9, 8, 7])


@pytest.mark.parametrize("mk", [
    lambda: rectangle_mesh(3, 2, elem="QUAD9"),
    lambda: rectangle_mesh(3, 3, elem="TRI6"),
    lambda: box_mesh(2, 2, 2, elem="HEX27"),
])
def test_exodus_roundtrip(mk, tmp_path):
    mesh = mk()
    p = str(tmp_path / "m.exo")
    res = {"temp": np.linspace(0, 1, mesh.n_nodes), "ux": np.random.RandomState(0).rand(2, mesh.n_nodes)}
    write_exodus(p, mesh, nodal_vars=res, times=np.array([0.0, 0.5]))
    m2, r2, times = read_exodus(p)
    np.testing.assert_allclose(m2.coords, mesh.coords)
    assert len(m2.blocks) == len(mesh.blocks)
    for b1, b2 in zip(mesh.blocks, m2.blocks):
        assert b1.elem_type == b2.elem_type
        np.testing.assert_array_equal(b1.conn, b2.conn)
    for k in mesh.nodesets:
        np.testing.assert_array_equal(np.sort(mesh.nodesets[k]), np.sort(m2.nodesets[k]))
    for k in mesh.sidesets:
        np.testing.assert_array_equal(mesh.sidesets[k].elems, m2.sidesets[k].elems)
        np.testing.assert_array_equal(mesh.sidesets[k].faces, m2.sidesets[k].faces)
    np.testing.assert_allclose(r2["temp"][0], res["temp"])
    np.testing.assert_allclose(r2["ux"], res["ux"])
    np.testing.assert_allclose(times, [0.0, 0.5])


def test_checkpoint_roundtrip(tmp_path):
    from goma_tpu.fem import Problem
    from goma_tpu.physics import Energy

    mesh = rectangle_mesh(3, 3, elem="QUAD9")
    prob = Problem(mesh, [Energy(interp="Q2")], {"k": 1.0})
    prob.finalize()
    x = np.random.RandomState(1).rand(prob.dofmap.n_dof)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, prob, x, xdot=2 * x, t=1.5, dt=0.1)
    st = load_checkpoint(p, prob)
    np.testing.assert_allclose(st["x"], x)
    np.testing.assert_allclose(st["xdot"], 2 * x)
    assert st["t"] == 1.5 and st["dt"] == 0.1

    # wrong mesh rejected
    prob2 = Problem(rectangle_mesh(4, 3, elem="QUAD9"), [Energy(interp="Q2")], {"k": 1.0})
    prob2.finalize()
    with pytest.raises(ValueError):
        load_checkpoint(p, prob2)


def test_pixel_image_to_nodal_field():
    """Voxel/pixel -> nodal external field (reference rd_pixel_image.c):
    multilinear sampling reproduces a linear ramp exactly; nearest picks
    pixel values; PGM round-trip; 3D trilinear."""
    import numpy as np
    from goma_tpu.io import image_to_nodal_field, read_pgm
    from goma_tpu.mesh import box_mesh, rectangle_mesh

    mesh = rectangle_mesh(7, 5, elem="QUAD4", xlim=(0, 2.0), ylim=(0, 1.0))
    nx, ny = 40, 30
    xc = (np.arange(nx) + 0.5) / nx * 2.0
    yc = (np.arange(ny) + 0.5) / ny * 1.0
    img = xc[:, None] + 3.0 * yc[None, :]  # linear ramp: exact under bilinear
    v = image_to_nodal_field(mesh, img, origin=(0, 0), extent=(2.0, 1.0))
    # interior nodes (>half-pixel from the edge) reproduce the ramp exactly
    c = mesh.coords
    interior = ((c[:, 0] > 2.0 / nx) & (c[:, 0] < 2.0 - 2.0 / nx)
                & (c[:, 1] > 1.0 / ny) & (c[:, 1] < 1.0 - 1.0 / ny))
    np.testing.assert_allclose(v[interior], (c[:, 0] + 3.0 * c[:, 1])[interior],
                               rtol=1e-12, atol=1e-12)
    # nearest: piecewise-constant material map
    imat = np.zeros((4, 2)); imat[2:, :] = 7.0
    vn = image_to_nodal_field(mesh, imat, origin=(0, 0), extent=(2.0, 1.0),
                              method="nearest")
    assert set(np.unique(vn)) <= {0.0, 7.0}
    assert np.all(vn[c[:, 0] > 1.1] == 7.0) and np.all(vn[c[:, 0] < 0.9] == 0.0)
    # PGM round-trip (P2 ascii)
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".pgm", delete=False) as f:
        f.write("P2\n# comment\n3 2\n255\n10 20 30\n40 50 60\n")
        path = f.name
    try:
        a = read_pgm(path)
        assert a.shape == (3, 2)
        # top-left pixel of the file is (x=0, y=max)
        assert a[0, 1] == 10 and a[0, 0] == 40 and a[2, 0] == 60
    finally:
        os.unlink(path)
    # 3D trilinear
    mesh3 = box_mesh(3, 3, 3, elem="HEX8")
    img3 = np.fromfunction(lambda i, j, k: i + j + k, (8, 8, 8))
    v3 = image_to_nodal_field(mesh3, img3, origin=(0, 0, 0), extent=(1, 1, 1))
    c3 = mesh3.coords
    ins = np.all((c3 > 1.0 / 8) & (c3 < 1 - 1.0 / 8), axis=1)
    exact = 8 * (c3[:, 0] + c3[:, 1] + c3[:, 2]) - 1.5
    np.testing.assert_allclose(v3[ins], exact[ins], rtol=1e-12)


def test_exodus_element_variables_roundtrip(tmp_path):
    """Element (per-cell) result variables (post_process_elem parity):
    write + read back per-block vals_elem_var records."""
    from goma_tpu.io import read_exodus, write_exodus
    from goma_tpu.mesh import rectangle_mesh

    mesh = rectangle_mesh(4, 3, elem="QUAD9")
    ne = mesh.n_elem
    ev = {"detj_min": np.linspace(0.5, 1.5, ne),
          "rank": np.arange(ne, dtype=float)}
    p = str(tmp_path / "ev.exo")
    write_exodus(p, mesh, nodal_vars={"temperature": np.zeros(mesh.n_nodes)},
                 elem_vars=ev)
    m2, fields, _ = read_exodus(p)
    np.testing.assert_allclose(fields["detj_min"][0], ev["detj_min"])
    np.testing.assert_allclose(fields["rank"][0], ev["rank"])
    assert "temperature" in fields


def test_anneal_mesh(tmp_path):
    """anneal_mesh (rf_solve.c:2892 parity): solved ALE displacement baked
    into the coordinates; re-solving on the annealed mesh with zeroed
    displacement reproduces the same physical surface."""
    from goma_tpu.fem import Problem
    from goma_tpu.io.checkpoint import anneal_mesh
    from goma_tpu.mesh import rectangle_mesh
    from goma_tpu.physics import EllipticMesh
    from goma_tpu.solvers import NewtonOptions, NewtonSolver

    mesh = rectangle_mesh(6, 6, elem="QUAD9")
    prob = Problem(mesh, [EllipticMesh(dim=2, interp="Q2")], {})
    bump = lambda c: 0.1 * np.sin(np.pi * c[:, 0])
    prob.add_dirichlet("top", "mesh_displacement", 1, bump)
    for ns in ("left", "right", "bottom", "top"):
        prob.add_dirichlet(ns, "mesh_displacement", 0, 0.0)
    for ns in ("left", "right", "bottom"):
        prob.add_dirichlet(ns, "mesh_displacement", 1, 0.0)
    prob.finalize()
    res = NewtonSolver(prob, NewtonOptions(max_iter=5, tol_residual=1e-11,
                                           linear_solver="direct")).solve(
        np.zeros(prob.dofmap.n_dof), prob.base_params())
    assert res.converged

    new_mesh, x2 = anneal_mesh(prob, res.x)
    top = mesh.nodesets["top"]
    np.testing.assert_allclose(new_mesh.coords[top, 1],
                               1.0 + bump(mesh.coords[top]), atol=1e-12)
    # displacement zeroed
    d = prob.dofmap.dof_of_node_svar[:, prob.dofmap.svar("mesh_displacement", 1)]
    assert np.max(np.abs(x2[d[d >= 0]])) == 0.0
