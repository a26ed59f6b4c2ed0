"""Post-processing field tests: principal values, invariants, aggregation."""

import numpy as np
import pytest

from stan_tpu.core import meshgen
from stan_tpu.post import fields


def test_principal_values_match_eigvalsh():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(100, 3, 3))
    S = A + np.swapaxes(A, 1, 2)
    voigt = np.stack(
        [S[:, 0, 0], S[:, 1, 1], S[:, 2, 2], S[:, 0, 1], S[:, 1, 2], S[:, 0, 2]],
        axis=-1,
    )
    got = np.asarray(fields.principal_values_sym3(voigt))
    want = np.linalg.eigvalsh(S)[:, ::-1]  # descending
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_principal_values_degenerate():
    # Hydrostatic state: all eigenvalues equal, p == 0 branch
    voigt = np.array([[5.0, 5.0, 5.0, 0.0, 0.0, 0.0]])
    got = np.asarray(fields.principal_values_sym3(voigt))
    np.testing.assert_allclose(got, [[5.0, 5.0, 5.0]], atol=1e-12)


def test_von_mises_uniaxial():
    # Uniaxial sigma_xx = s: von Mises = |s|
    voigt = np.array([[100.0, 0, 0, 0, 0, 0]])
    f = np.asarray(fields._tensor_fields(voigt))
    assert f[0, 9] == pytest.approx(100.0, rel=1e-8)
    # Repeated-eigenvalue case: the trigonometric closed form carries
    # O(sqrt(eps)*scale) error at degenerate roots — atol scaled to |s|.
    np.testing.assert_allclose(f[0, 6:9], [100.0, 0.0, 0.0], atol=1e-4)


def test_compute_all_names_and_uniaxial_stress():
    from stan_tpu.analysis.linear import solve_linear_statics

    m = meshgen.uniaxial_bar(4, E=1000.0, force=100.0)
    solve_linear_statics(m)
    out = fields.compute_all(m, 1)
    # 24 fields x (Max/Average/Min cell + point) = 96 arrays
    assert len(out) == 96
    assert "Max Stress XX INC 1" in out
    assert "von Mises Stress INC 1" in out
    # Uniaxial bar: stress_xx = F/A = 100 everywhere
    np.testing.assert_allclose(out["Stress XX INC 1"], 100.0, rtol=1e-5)
    np.testing.assert_allclose(
        out["Average von Mises Stress INC 1"], 100.0, rtol=1e-5
    )
    # Point and cell variants agree for a uniform field
    np.testing.assert_allclose(
        out["Max Stress XX INC 1"], out["Min Stress XX INC 1"], rtol=1e-6
    )
    # Effective strain = (2/3) * vm(strain): uniaxial nu=0 -> gamma=0,
    # principals (e, 0, 0) -> eff = (2/3)*e
    eps = 100.0 / 1000.0
    np.testing.assert_allclose(
        out["Effective Strain INC 1"], (2.0 / 3.0) * eps, rtol=1e-5
    )


def test_export_vtu_files(tmp_path):
    from stan_tpu.analysis.linear import solve_linear_statics
    from stan_tpu.io import vtu

    m = meshgen.hex_beam(2, 2, 2)
    solve_linear_statics(m)
    paths = fields.export_vtu(m, str(tmp_path / "res"), binary=False)
    assert len(paths) == 2  # increments 0 and 1
    arrays = vtu.read_vtu_ascii(paths[1])
    assert "Displacement Z INC 1" in arrays
    # Deformed export: point coords = coords + disp
    m_disp = np.abs(m.disp[1]).max()
    assert m_disp > 0
    got = arrays["_anon0"].reshape(-1, 3)  # Points array has no Name
    np.testing.assert_allclose(got, m.coords + m.disp[1], atol=1e-6)
    # Cell variants (Element Max/Average/Min, ExportWindow.xaml.cs:61-67)
    # ship as CellData with one value per element.
    assert "Max von Mises Stress INC 1" in arrays
    assert "Average Strain P1 INC 1" in arrays
    assert arrays["Min Stress XX INC 1"].size == m.nelem
    # Cell stats bracket the point average everywhere.
    vm_max = arrays["Max von Mises Stress INC 1"]
    vm_min = arrays["Min von Mises Stress INC 1"]
    assert (vm_max >= vm_min - 1e-6).all()


def test_export_vtu_field_filter_and_no_cells(tmp_path):
    from stan_tpu.analysis.linear import solve_linear_statics
    from stan_tpu.io import vtu

    m = meshgen.hex_beam(2, 2, 2)
    solve_linear_statics(m)
    paths = fields.export_vtu(
        m, str(tmp_path / "res"), binary=False,
        fields=["Total Displacement"], cell_variants=False,
    )
    arrays = vtu.read_vtu_ascii(paths[1])
    assert "Total Displacement INC 1" in arrays
    assert "Max Total Displacement INC 1" not in arrays
    assert "Stress XX INC 1" not in arrays


def test_strip_results_roundtrip(tmp_path):
    """strip-results removes results, shrinks the STdb, and the stripped
    file re-solves to the same answer (MainWindow.xaml.cs:731-763)."""
    import os

    from stan_tpu import cli
    from stan_tpu.analysis.linear import solve_linear_statics
    from stan_tpu.io import stdb

    m = meshgen.hex_beam(3, 2, 2)
    solve_linear_statics(m)
    u_ref = m.disp[1].copy()
    path = str(tmp_path / "solved.STdb")
    stdb.write(m, path)
    size_with = os.path.getsize(path)

    rc = cli.main(["strip-results", path])
    assert rc == 0
    assert os.path.getsize(path) < size_with
    m2 = stdb.read(path)
    assert m2.disp is None and m2.stress is None and m2.strain is None
    assert m2.analysis.result_step_no == 0
    # Stripped model still solves (mesh/BC/material payload intact).
    solve_linear_statics(m2)
    np.testing.assert_allclose(m2.disp[1], u_ref, rtol=1e-8, atol=1e-12)
    # Second strip is a no-op.
    assert cli.main(["strip-results", path]) == 0
