"""Auxiliary subsystems: config, validation, run log, distributed mesh, CLI.

SURVEY.md §5.3 (failure detection), §5.5 (observability), §5.6 (config),
§5.8 (communication backend bring-up).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.core import validate
from stan_tpu.utils import config as config_mod
from stan_tpu.utils import runlog
from stan_tpu.utils.timing import PhaseTimer


# ---------------------------------------------------------------- config

def test_config_defaults_match_reference_analysis():
    cfg = config_mod.load()
    a = cfg.to_analysis_settings()
    # Reference defaults: CG, tol 1e-6, maxiter 0 (Analysis.cs:17-21).
    assert a.lin_solver == "CG"
    assert a.lin_solver_tolerance == 1.0e-6
    assert a.lin_solver_maxiter == 0


def test_config_toml_and_overrides(tmp_path):
    p = tmp_path / "run.toml"
    p.write_text(
        "[analysis]\nsolver = 'Cholesky'\ntolerance = 1e-8\n"
        "[sharding]\ndomain = 4\n"
        "[inference]\nsampler = 'smc'\nchains = 32\n"
    )
    cfg = config_mod.load(str(p), overrides={"analysis.solver": "LU"})
    assert cfg.analysis.solver == "LU"  # override wins
    assert cfg.analysis.tolerance == 1e-8
    assert cfg.sharding.domain == 4
    assert cfg.inference.sampler == "smc" and cfg.inference.chains == 32


def test_config_refuses_unknown_keys(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[analysis]\nsovler = 'CG'\n")  # typo
    with pytest.raises(config_mod.ConfigError):
        config_mod.load(str(p))
    p.write_text("[nonsense]\nx = 1\n")
    with pytest.raises(config_mod.ConfigError):
        config_mod.load(str(p))


def test_config_refuses_invalid_values():
    with pytest.raises(config_mod.ConfigError):
        config_mod.load(overrides={"analysis.solver": "GMRES"})
    with pytest.raises(config_mod.ConfigError):
        config_mod.load(overrides={"inference.sampler": "gibbs"})


def test_config_apply_to_model():
    m = meshgen.hex_beam(2, 2, 2)
    cfg = config_mod.load(overrides={
        "analysis.solver": "Cholesky", "mesh.integration": "G1"})
    cfg.apply_to_model(m)
    assert m.analysis.lin_solver == "Cholesky"
    assert set(m.elem_type) == {"HEX8_G1"}


# -------------------------------------------------------------- validate

def test_validate_accepts_good_model():
    m = meshgen.hex_beam(3, 2, 2)
    validate.validate(m)  # no raise


def test_validate_refuses_bad_material():
    m = meshgen.hex_beam(2, 2, 2)
    m.materials[1].E = -999.0  # reference sentinel (Material.cs:27)
    with pytest.raises(validate.ValidationError) as ei:
        validate.validate(m)
    assert any("E = -999" in p for p in ei.value.problems)


def test_validate_refuses_nan_coords_and_bad_conn():
    m = meshgen.hex_beam(2, 2, 2)
    m.coords = m.coords.copy()
    m.coords[0, 0] = np.nan
    m.conn = m.conn.copy()
    m.conn[0, 0] = m.conn[0, 1]  # degenerate element
    problems = validate.check_model(m)
    assert any("non-finite" in p for p in problems)
    assert any("repeated nodes" in p for p in problems)


def test_validate_refuses_mixed_element_families():
    """A CHEXA+CTETRA mesh fails validation at ingest with a named reason
    (VERDICT r3 missing item 6) instead of tracebacking at solve time; the
    .bdf reader accepts both cards (io/nastran.py), the reference imports
    HEX8 only (Database.cs:44-48)."""
    m = meshgen.hex_beam(2, 2, 2)
    m.elem_type = list(m.elem_type)
    m.elem_type[0] = "TET4_G2"  # pretend one element is a tet family
    problems = validate.check_model(m)
    assert any("mixed element formulations" in p for p in problems)
    assert any("single" in p and "formulation" in p for p in problems)
    # G1 vs G2 of the SAME family is still mixed (one kernel block per
    # solve), and also named:
    m.elem_type[0] = "HEX8_G1"
    problems = validate.check_model(m)
    assert any("mixed element formulations" in p for p in problems)


def test_validate_detects_underconstrained():
    m = meshgen.hex_beam(2, 2, 2)
    # Keep a load but drop the SPC.
    m.bcs = {k: v for k, v in m.bcs.items() if v.type != "SPC"}
    problems = validate.check_model(m)
    assert any("rigid-body" in p for p in problems)


# ------------------------------------------------------ divergence guard

def test_cg_divergence_guard_nan():
    from stan_tpu.solvers import cg as cg_mod

    def bad_op(u):  # injects NaN after the first iteration
        return u + jnp.nan * jnp.sum(u)

    b = jnp.ones(8)
    res = cg_mod.pcg(bad_op, b, tol=1e-10, maxiter=50)
    assert bool(res.diverged)
    assert not bool(res.converged)
    assert int(res.iters) < 50  # guard aborted the loop early


def test_cg_healthy_solve_not_flagged():
    from stan_tpu.solvers import cg as cg_mod

    A = jnp.asarray(np.diag([1.0, 2.0, 3.0, 4.0]))
    b = jnp.ones(4)
    res = cg_mod.pcg(lambda u: A @ u, b, tol=1e-12, maxiter=20)
    assert bool(res.converged) and not bool(res.diverged)


# ---------------------------------------------------------------- runlog

def test_runlog_roundtrip(tmp_path):
    m = meshgen.hex_beam(2, 2, 2)
    timer = PhaseTimer(verbose=False)
    with timer.phase("Assembly", nnz=123):
        pass
    path = str(tmp_path / "runs" / "log.jsonl")
    rec = runlog.make_record(
        "solve", model=m, timer=timer, iters=np.int64(17),
        residual=jnp.float32(1e-7), converged=True)
    runlog.append(path, rec)
    runlog.append(path, runlog.make_record("calibrate", samples_per_s=42.0))
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["kind"] == "solve"
    assert lines[0]["model"]["ndof"] == m.ndof
    assert lines[0]["iters"] == 17
    assert lines[0]["phases"][0]["phase"] == "Assembly"
    assert lines[0]["phases"][0]["nnz"] == 123
    assert lines[1]["samples_per_s"] == 42.0


# ----------------------------------------------------------- distributed

def test_device_mesh_shapes():
    from stan_tpu.parallel import distributed

    mesh = distributed.device_mesh(n_chains=2, n_domain=4)
    assert mesh.axis_names == ("chains", "domain")
    assert mesh.devices.shape == (2, 4)
    assert "chains=2" in distributed.describe(mesh)


def test_device_mesh_refuses_bad_split():
    from stan_tpu.parallel import distributed

    with pytest.raises(ValueError):
        distributed.device_mesh(n_chains=3)  # 8 devices % 3 != 0
    with pytest.raises(ValueError):
        distributed.device_mesh(n_chains=4, n_domain=4)  # needs 16


def test_initialize_single_process_noop():
    from stan_tpu.parallel import distributed

    distributed.initialize()  # must not raise or start a coordinator


# --------------------------------------------------------------- CLI

def _make_stdb(tmp_path):
    from stan_tpu.io import stdb

    m = meshgen.hex_beam(3, 2, 2)
    path = str(tmp_path / "beam.STdb")
    stdb.write(m, path)
    return path


def test_cli_solve_with_config_and_log(tmp_path):
    from stan_tpu import cli

    path = _make_stdb(tmp_path)
    cfgp = tmp_path / "run.toml"
    cfgp.write_text("[analysis]\ntolerance = 1e-8\n")
    logp = tmp_path / "run.jsonl"
    rc = cli.main(["solve", path, "--config", str(cfgp),
                   "--log-json", str(logp)])
    assert rc == 0
    rec = json.loads(open(logp).read().splitlines()[0])
    assert rec["kind"] == "solve" and rec["converged"]
    assert rec["model"]["analysis"]["tolerance"] == 1e-8


def test_cli_solve_refuses_invalid_model(tmp_path):
    from stan_tpu import cli
    from stan_tpu.io import stdb

    m = meshgen.hex_beam(2, 2, 2)
    m.materials[1].E = -999.0
    path = str(tmp_path / "bad.STdb")
    stdb.write(m, path)
    rc = cli.main(["solve", path])
    assert rc == 2


def test_cli_calibrate_synthetic_smoke(tmp_path):
    from stan_tpu import cli

    path = _make_stdb(tmp_path)
    logp = tmp_path / "cal.jsonl"
    rc = cli.main(["calibrate", path, "--synthetic", "--sampler", "vi",
                   "--samples", "60", "--chains", "2",
                   "--log-json", str(logp)])
    assert rc == 0
    rec = json.loads(open(logp).read().splitlines()[0])
    assert rec["kind"] == "calibrate" and rec["sampler"] == "vi"


def test_cli_calibrate_chain_sharded(tmp_path):
    """The [sharding] config section reaches the sampler: calibrate builds
    the (chains x domain) mesh and records it in the run log (VERDICT.md
    round-1 weak item 2)."""
    from stan_tpu import cli

    path = _make_stdb(tmp_path)
    cfgp = tmp_path / "run.toml"
    cfgp.write_text("[sharding]\nchains = 8\ndomain = 1\n")
    logp = tmp_path / "cal.jsonl"
    rc = cli.main(["calibrate", path, "--synthetic", "--sampler", "hmc",
                   "--samples", "20", "--warmup", "20", "--chains", "8",
                   "--config", str(cfgp), "--log-json", str(logp)])
    assert rc == 0
    rec = json.loads(open(logp).read().splitlines()[0])
    assert rec["mesh"] is not None and "chains=8" in rec["mesh"]
    assert rec["n_devices"] == 8
    assert rec["rhat"] is not None


def test_cli_calibrate_refuses_indivisible_chains(tmp_path):
    from stan_tpu import cli

    path = _make_stdb(tmp_path)
    cfgp = tmp_path / "run.toml"
    cfgp.write_text("[sharding]\nchains = 8\n")
    rc = cli.main(["calibrate", path, "--synthetic", "--sampler", "hmc",
                   "--samples", "10", "--warmup", "10", "--chains", "3",
                   "--config", str(cfgp)])
    assert rc == 2
