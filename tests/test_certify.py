"""Production-solve certification and multi-device solve routing.

VERDICT r2 items 2 (CLI solve uses all visible devices) and 6 (certify the
production solve): `solve_linear_statics` must
  * certify a true float64 residual when the device solve runs below f64
    (the reference solves in double throughout, MatrixST.cs:17, and its tol
    semantics are on a double recurrence, SolverFunctions.cs:281-296);
  * route through the sharded operators when a domain width > 1 is
    requested/available, with displacements matching the single-device
    solve;
  * surface the operator actually used (fast-path fallbacks were a silent
    perf cliff, VERDICT r2 weak item 8).
"""

import json

import numpy as np
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.analysis.linear import solve_linear_statics

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas / large meshes: minutes on CPU



def test_f32_solve_is_certified():
    m = meshgen.hex_beam(5, 4, 4)
    tol = float(m.analysis.lin_solver_tolerance)
    res = solve_linear_statics(m, store=False, dtype=jnp.float32)
    assert res.converged
    assert res.true_residual is not None
    assert res.true_residual <= tol
    # adaptive schedule: certification must cost a fraction of the base
    # solve, not the 3.2x of the round-2 fixed schedule
    assert res.refine_iters <= max(1, res.iters)


def test_f64_solve_skips_certification():
    m = meshgen.hex_beam(4, 3, 3)
    res = solve_linear_statics(m, store=False, dtype=jnp.float64)
    assert res.true_residual is None and res.refine_cycles == 0


def test_certified_f32_matches_f64_solution():
    m = meshgen.hex_beam(5, 4, 4)
    r64 = solve_linear_statics(m, store=False, dtype=jnp.float64)
    r32 = solve_linear_statics(m, store=False, dtype=jnp.float32)
    scale = np.abs(r64.u).max()
    # certified-f32 displacements carry full f32-representable accuracy
    np.testing.assert_allclose(r32.u, r64.u, atol=5e-5 * scale)


def test_general_path_certification():
    """Unstructured (perturbed) mesh -> general operator, still certified."""
    m = meshgen.hex_beam(3, 3, 3)
    rng = np.random.default_rng(0)
    interior = ~np.logical_or.reduce([
        np.isclose(m.coords[:, k], m.coords[:, k].min())
        | np.isclose(m.coords[:, k], m.coords[:, k].max())
        for k in range(3)
    ])
    m.coords = m.coords.copy()
    m.coords[interior] += rng.normal(0.0, 0.02, (interior.sum(), 3))
    res = solve_linear_statics(m, store=False, dtype=jnp.float32)
    assert res.operator == "general"
    assert res.true_residual is not None
    assert res.true_residual <= float(m.analysis.lin_solver_tolerance)


def test_sharded_stencil_solve_matches_single_device():
    m = meshgen.hex_beam(15, 6, 6)  # NNX=16 divides the 8-device mesh
    r1 = solve_linear_statics(m, store=False, n_domain=1)
    r8 = solve_linear_statics(m, store=False, n_domain=8)
    assert r8.operator == "sharded-stencilx8" and r8.n_domain == 8
    assert r1.operator == "stencil"
    scale = np.abs(r1.u).max()
    np.testing.assert_allclose(r8.u, r1.u, atol=1e-8 * scale)


def test_sharded_general_fallback_when_nnx_indivisible():
    m = meshgen.hex_beam(15, 6, 6)  # NNX=16, 16 % 3 != 0
    r1 = solve_linear_statics(m, store=False, n_domain=1)
    r3 = solve_linear_statics(m, store=False, n_domain=3)
    assert r3.operator == "sharded-generalx3"
    # different operator orderings, same system: agree to CG tolerance
    # amplified by conditioning
    scale = np.abs(r1.u).max()
    np.testing.assert_allclose(r3.u, r1.u, atol=1e-3 * scale)


def test_cli_solve_domain_flag(tmp_path):
    """End-to-end: CLI --domain 8 solves on the virtual mesh and records
    operator + domain width in the run log."""
    from stan_tpu import cli
    from stan_tpu.io import stdb

    m = meshgen.hex_beam(15, 6, 6)
    path = str(tmp_path / "beam.STdb")
    stdb.write(m, path)
    logp = tmp_path / "run.jsonl"
    rc = cli.main(["solve", path, "--domain", "8",
                   "--log-json", str(logp)])
    assert rc == 0
    rec = json.loads(open(logp).read().splitlines()[0])
    assert rec["operator"] == "sharded-stencilx8"
    assert rec["n_domain"] == 8

    # same file solved single-device matches
    m8 = stdb.read(path)
    m1 = meshgen.hex_beam(15, 6, 6)
    r1 = solve_linear_statics(m1, store=False, n_domain=1)
    scale = np.abs(r1.u).max()
    np.testing.assert_allclose(m8.disp[-1], r1.u, atol=1e-8 * scale)
