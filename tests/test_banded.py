"""Banded (skyline-equivalent) direct solver tests (solvers/banded.py).

Reference anchors: ALGLIB SKS Cholesky LinearSolver_Cholesky
(src/STAN_Solver/SolverFunctions.cs:332-444), sparse LU (:446-516), and
the bandwidth-reducing AssignDOF BFS ordering (Database.cs:140-234)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stan_tpu.analysis.linear import solve_linear_statics
from stan_tpu.core import meshgen
from stan_tpu.solvers import banded


def test_banded_matches_dense_small():
    """Banded LLT reproduces the dense Cholesky solution exactly (both are
    float64 direct solves of the same masked system)."""
    from stan_tpu.fem import assembly

    m = meshgen.hex_beam(4, 3, 2)
    K = np.asarray(assembly.assemble_dense(
        m.coords, m.conn, m.elem_d_matrices(), m.formulation(),
        fix_mask=m.fix_mask(), dtype=jnp.float64))
    free = 1.0 - np.asarray(m.fix_mask(), np.float64)
    b = (free * m.load_vector()).reshape(-1)
    u_dense = np.linalg.solve(K, b).reshape(m.nnode, 3)

    u_band = banded.solve_banded_cholesky(m)
    np.testing.assert_allclose(u_band, u_dense, rtol=1e-9, atol=1e-12)

    u_lu = banded.solve_banded_lu(m)
    np.testing.assert_allclose(u_lu, u_dense, rtol=1e-9, atol=1e-12)


def test_banded_matches_cg_beyond_dense_reach():
    """--solver Cholesky semantics at a size where a dense [ndof, ndof]
    is impossible on this host (VERDICT r3 task 5): a long beam at ~37k DOF
    (dense f64 would be 10.8 GB; the band is ~70 MB)."""
    m = meshgen.hex_beam(150, 8, 8)
    ndof = 3 * m.nnode
    assert ndof > 30000
    assert ndof ** 2 * 8 > 8e9  # dense truly impossible

    struct = banded.band_structure(m)
    assert struct.band_bytes() < 200e6  # the point of the band form

    m.analysis.lin_solver = "Cholesky"
    res_b = solve_linear_statics(m, store=False)
    assert res_b.operator == "banded-cholesky"
    assert res_b.converged
    # Direct float64 solve: certified true residual at the f64 floor for
    # this conditioning (slender beam, kappa ~ 1e6)
    assert res_b.true_residual is not None and res_b.true_residual < 1e-8

    m.analysis.lin_solver = "CG"
    m.analysis.lin_solver_tolerance = 1e-10
    res_cg = solve_linear_statics(m, store=False)
    scale = np.abs(res_b.u).max()
    np.testing.assert_allclose(res_cg.u, res_b.u, atol=1e-6 * scale)


def test_banded_memory_assertion():
    """The band-size guard refuses instead of thrashing, and names the
    CG remedy (reference behavior: the user picks the solver in Analysis)."""
    m = meshgen.hex_beam(8, 8, 8)
    with pytest.raises(MemoryError, match="CG"):
        banded.solve_banded_cholesky(m, max_band_bytes=1000)


def test_bandwidth_reduction_is_effective():
    """On a mesh with scrambled node ids the ordering search must recover a
    bandwidth near the cross-section size (the role the AssignDOF BFS plays
    in the reference, Database.cs:140-234), and on an already-well-numbered
    meshgen beam it must not do WORSE than the natural order."""
    import copy

    m = meshgen.hex_beam(40, 3, 3)
    conn = np.asarray(m.conn)
    natural_bw = 3 * int((conn.max(axis=1) - conn.min(axis=1)).max()) + 2
    struct = banded.band_structure(m)
    assert struct.hbw <= natural_bw

    # Scramble node numbering: the natural bandwidth blows up to ~the whole
    # beam; the BFS candidate must recover something near cross-section
    # scale. (band_structure only reads conn/nnode, so only those matter.)
    rng = np.random.default_rng(0)
    perm = rng.permutation(m.nnode)  # old index -> new index
    m2 = copy.copy(m)
    m2.coords = np.asarray(m.coords)[np.argsort(perm)]
    m2.conn = perm[conn]
    scr_natural = 3 * int(
        (m2.conn.max(axis=1) - m2.conn.min(axis=1)).max()) + 2
    s2 = banded.band_structure(m2)
    assert scr_natural > 10 * s2.hbw  # scrambling really was catastrophic
    # Recovered bandwidth is within a small factor of the well-numbered one
    assert s2.hbw <= 4 * struct.hbw
