"""IO round-trip tests: STdb protobuf, Nastran .bdf, .vtu export."""

import numpy as np
import pytest

from stan_tpu.core import meshgen
from stan_tpu.io import nastran, stdb, vtu


def test_stdb_roundtrip_mesh_only(tmp_path):
    m = meshgen.hex_beam(3, 2, 2)
    path = str(tmp_path / "model.STdb")
    stdb.write(m, path)
    m2 = stdb.read(path)

    np.testing.assert_array_equal(m.node_ids, m2.node_ids)
    np.testing.assert_allclose(m.coords, m2.coords)
    np.testing.assert_array_equal(m.conn, m2.conn)
    np.testing.assert_array_equal(m.elem_pid, m2.elem_pid)
    assert m.elem_type == m2.elem_type
    np.testing.assert_array_equal(m.elem_mat, m2.elem_mat)

    assert m2.materials[1].E == m.materials[1].E
    assert m2.materials[1].poisson == m.materials[1].poisson
    assert m2.analysis.lin_solver == "CG"
    assert m2.analysis.lin_solver_tolerance == pytest.approx(1e-6)

    # BCs: same fix mask and load vector after round-trip
    np.testing.assert_array_equal(m.fix_mask(), m2.fix_mask())
    np.testing.assert_allclose(m.load_vector(), m2.load_vector())
    assert m2.part_info[1].mat_id == 1


def test_stdb_roundtrip_with_results(tmp_path):
    from stan_tpu.analysis.linear import solve_linear_statics

    m = meshgen.hex_beam(3, 2, 2)
    solve_linear_statics(m)
    path = str(tmp_path / "model.STdb")
    stdb.write(m, path)
    m2 = stdb.read(path)

    assert m2.analysis.result_step_no == 1
    np.testing.assert_allclose(m2.disp, m.disp, rtol=1e-12)
    np.testing.assert_allclose(m2.stress, m.stress, rtol=1e-12)
    np.testing.assert_allclose(m2.strain, m.strain, rtol=1e-12)


def test_stdb_solve_file_contract(tmp_path):
    """The solver contract: read file, solve, overwrite same file."""
    from stan_tpu import cli

    m = meshgen.hex_beam(2, 2, 2)
    path = str(tmp_path / "model.STdb")
    stdb.write(m, path)
    rc = cli.main(["solve", path])
    assert rc == 0
    m2 = stdb.read(path)
    assert m2.disp is not None and np.isfinite(m2.disp).all()
    assert m2.analysis.result_step_no == 1


def test_bdf_roundtrip(tmp_path):
    m = meshgen.hex_beam(3, 2, 2)
    path = str(tmp_path / "mesh.bdf")
    nastran.write_bdf(m, path)
    m2 = nastran.read_bdf(path)
    np.testing.assert_array_equal(m.node_ids, m2.node_ids)
    np.testing.assert_allclose(m.coords, m2.coords, atol=1e-4)
    np.testing.assert_array_equal(m.conn, m2.conn)
    assert m2.elem_type == ["HEX8_G2"] * m.nelem  # default (Element.cs:58)


def test_bdf_number_quirks():
    # .bdf scientific notation without 'e' and leading '.' (Node.cs:40-63)
    assert nastran._parse_bdf_number("1.23-4") == pytest.approx(1.23e-4)
    assert nastran._parse_bdf_number("-1.23-4") == pytest.approx(-1.23e-4)
    assert nastran._parse_bdf_number("1.23+4") == pytest.approx(1.23e4)
    assert nastran._parse_bdf_number(".5") == pytest.approx(0.5)
    assert nastran._parse_bdf_number("-.5") == pytest.approx(-0.5)
    assert nastran._parse_bdf_number("2.0") == pytest.approx(2.0)


def test_bdf_parse_quirky_file(tmp_path):
    """Continuation lines, comments, blank CP field, embedded exponents."""
    content = "\n".join(
        [
            "$ comment with CHEXA inside should still parse next cards",
            "GRID    1               0.0     0.0     0.0",
            "GRID    2               1.0-0   0.0     0.0",
            "GRID    3               1.0     1.0     0.0",
            "GRID    4               .0      1.0     0.0",
            "GRID    5               0.0     0.0     1.0",
            "GRID    6               1.0     0.0     1.0",
            "GRID    7               1.0     1.0     1.0",
            "GRID    8               0.0     1.0     1.0",
            "CHEXA   10      1       1       2       3       4       5       6+",
            "+       7       8",
            "ENDDATA",
        ]
    )
    path = tmp_path / "quirky.bdf"
    path.write_text(content)
    m = nastran.read_bdf(str(path))
    assert m.nnode == 8 and m.nelem == 1
    assert m.import_errors == []
    np.testing.assert_array_equal(m.elem_ids, [10])
    np.testing.assert_array_equal(m.conn[0], [0, 1, 2, 3, 4, 5, 6, 7])
    assert m.coords[1, 0] == pytest.approx(1.0)
    assert m.part_info.keys() == {1}


def test_bdf_bad_card_collected_not_fatal(tmp_path):
    content = "\n".join(
        [
            "GRID    1               0.0     0.0     0.0",
            "GRID    XX              oops",
            "CHEXA   1       1       1       2",  # too few nodes
            "ENDDATA",
        ]
    )
    path = tmp_path / "bad.bdf"
    path.write_text(content)
    m = nastran.read_bdf(str(path))
    assert m.nnode == 1 and m.nelem == 0
    assert len(m.import_errors) == 2


def test_vtu_ascii_roundtrip(tmp_path):
    m = meshgen.hex_beam(2, 1, 1)
    path = str(tmp_path / "out.vtu")
    pd = {"field": np.arange(m.nnode, dtype=np.float64)}
    cd = {"cfield": np.arange(m.nelem, dtype=np.float64)}
    vtu.write_vtu(path, m.coords, m.conn, point_data=pd, cell_data=cd,
                  binary=False)
    arrays = vtu.read_vtu_ascii(path)
    np.testing.assert_allclose(arrays["field"], pd["field"])
    np.testing.assert_allclose(arrays["cfield"], cd["cfield"])
    np.testing.assert_allclose(arrays["connectivity"], m.conn.ravel())
    np.testing.assert_allclose(
        arrays["offsets"], np.arange(1, m.nelem + 1) * 8
    )
    assert (arrays["types"] == vtu.VTK_HEXAHEDRON).all()


def test_vtu_binary_decodes(tmp_path):
    import base64
    import xml.etree.ElementTree as ET

    m = meshgen.hex_beam(2, 1, 1)
    path = str(tmp_path / "out.vtu")
    vtu.write_vtu(
        path, m.coords, m.conn,
        point_data={"f": np.arange(m.nnode, dtype=np.float64)},
    )
    root = ET.parse(path).getroot()
    assert root.attrib["type"] == "UnstructuredGrid"
    (arr,) = [
        el for el in root.iter("DataArray") if el.attrib.get("Name") == "f"
    ]
    raw = base64.b64decode(arr.text.strip())
    n = np.frombuffer(raw[:4], dtype=np.uint32)[0]
    vals = np.frombuffer(raw[4 : 4 + n], dtype=np.float32)
    np.testing.assert_allclose(vals, np.arange(m.nnode, dtype=np.float32))
