"""Native C++ host runtime vs Python reference implementations."""

import numpy as np
import pytest

from stan_tpu import native
from stan_tpu.core import meshgen
from stan_tpu.fem.operator import node_incidence as py_incidence
from stan_tpu.io import nastran

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_bfs_order_matches_python(monkeypatch):
    m = meshgen.hex_beam(6, 5, 4)
    conn = np.asarray(m.conn)
    got = native.bfs_order(conn, m.nnode)
    # Run the pure-Python body (the spec) by disabling native lookup.
    from stan_tpu.parallel import partition as part_mod

    monkeypatch.setattr(native, "bfs_order", lambda *a, **k: None)
    want = part_mod.bfs_node_order(conn, m.nnode)
    np.testing.assert_array_equal(got, want)
    assert sorted(got) == list(range(m.nnode))  # permutation property


def test_node_incidence_matches_python():
    m = meshgen.hex_beam(5, 4, 3)
    conn = np.asarray(m.conn)
    got = native.node_incidence(conn, m.nnode)
    want = py_incidence(conn, m.nnode)
    np.testing.assert_array_equal(got, want)


def test_native_bdf_parse_matches_python(tmp_path):
    m = meshgen.hex_beam(4, 3, 2)
    path = str(tmp_path / "mesh.bdf")
    nastran.write_bdf(m, path)
    m_native = nastran.read_bdf(path, use_native=True)
    m_py = nastran.read_bdf(path, use_native=False)
    np.testing.assert_array_equal(m_native.node_ids, m_py.node_ids)
    np.testing.assert_allclose(m_native.coords, m_py.coords)
    np.testing.assert_array_equal(m_native.conn, m_py.conn)
    np.testing.assert_array_equal(m_native.elem_ids, m_py.elem_ids)
    np.testing.assert_array_equal(m_native.elem_pid, m_py.elem_pid)
    assert m_native.elem_type == m_py.elem_type


def test_native_bdf_quirky_numbers(tmp_path):
    content = "\n".join(
        [
            "$ comment",
            "GRID    1               1.5-1   .5      -0.5",
            "GRID    2               1.0     0.0     0.0",
            "GRID    3               1.0     1.0     0.0",
            "GRID    4               0.0     1.0     0.0",
            "GRID    5               0.0     0.0     1.0",
            "GRID    6               1.0     0.0     1.0",
            "GRID    7               1.0     1.0     1.0",
            "GRID    8               0.0     1.0     1.0",
            "CHEXA   10      7       1       2       3       4       5       6+",
            "+       7       8",
        ]
    )
    path = tmp_path / "q.bdf"
    path.write_text(content)
    parsed = native.bdf_parse(str(path))
    assert parsed is not None
    node_ids, coords, elem_ids, elem_pids, conn, nerr = parsed
    assert nerr == 0
    assert coords[0] == pytest.approx([0.15, 0.5, -0.5])
    assert list(elem_pids) == [7]
    np.testing.assert_array_equal(conn[0], [0, 1, 2, 3, 4, 5, 6, 7])
