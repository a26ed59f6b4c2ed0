"""Checkpoint / resume tests: pytree snapshots, solver + sampler resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.utils import checkpoint as ckpt


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6).reshape(2, 3),
        "b": [np.ones(3), {"c": 2.5, "d": "hello", "e": None}],
        "f": (np.float64(1.5), True, 7),
    }
    path = str(tmp_path / "state.npz")
    ckpt.save(path, tree)
    got = ckpt.load(path)
    np.testing.assert_array_equal(got["a"], tree["a"])
    np.testing.assert_array_equal(got["b"][0], tree["b"][0])
    assert got["b"][1]["c"] == 2.5
    assert got["b"][1]["d"] == "hello"
    assert got["b"][1]["e"] is None
    assert got["f"][1] is True and got["f"][2] == 7


def test_load_or_none_missing(tmp_path):
    assert ckpt.load_or_none(str(tmp_path / "nope.npz")) is None
    assert ckpt.load_or_none(None) is None


def test_nonlinear_resume_matches_uninterrupted(tmp_path):
    from stan_tpu.analysis.nonlinear import solve_nonlinear_statics

    def make():
        m = meshgen.hex_beam(2, 2, 2, load=(0.0, 0.0, -50.0))
        m.analysis.type = "Nonlinear_Statics"
        m.analysis.inc_numb = 3
        return m

    ref = solve_nonlinear_statics(make(), store=False)

    # Simulate an interrupted run: first run only increments 1-2 by faking
    # a checkpoint from a truncated pass, then resume to completion.
    path = str(tmp_path / "nl.npz")
    m1 = make()
    m1.analysis.inc_numb = 3
    # run increments with checkpointing, then delete the last increment
    solve_nonlinear_statics(m1, store=False, checkpoint_path=path)
    state = ckpt.load(path)
    assert int(state["next_inc"]) == 4
    # truncate to "only 2 increments were done"
    state["next_inc"] = 3
    state["u"] = state["disp"][2]
    for key in ("disp", "strains", "stresses"):
        state[key] = state[key][:3]
    state["iters"] = state["iters"][:2]
    state["res"] = state["res"][:2]
    ckpt.save(path, state)

    res = solve_nonlinear_statics(make(), store=False, checkpoint_path=path)
    assert res.converged
    np.testing.assert_allclose(res.u, ref.u, rtol=1e-10, atol=1e-12)
    assert res.disp.shape == ref.disp.shape


def test_hmc_checkpoint_resume(tmp_path):
    from stan_tpu.infer import hmc

    cov_inv = jnp.linalg.inv(jnp.array([[1.0, 0.5], [0.5, 1.5]]))
    mean = jnp.array([0.5, -1.0])

    def logp(th):
        d = th - mean
        return -0.5 * d @ cov_inv @ d

    path = str(tmp_path / "hmc.npz")
    kwargs = dict(n_samples=200, n_warmup=150, n_leapfrog=8,
                  checkpoint_path=path, checkpoint_every=50)
    theta0 = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(0)

    full = hmc.run_hmc(logp, theta0, key, **kwargs)
    assert full.samples.shape == (2, 200, 2)

    # Truncate the checkpoint to half-way (chunks of 50: keep the first two
    # sidecars) and resume: identical draws.
    state = ckpt.load(path)
    assert int(state["n_chunks"]) == 4  # append-only chunk files
    state["n_done"] = 100
    state["n_chunks"] = 2
    # theta must be the chain state after 100 draws = last draw of chunk 1
    state["theta"] = ckpt.load_chunks(path, 2)[1][:, -1, :]
    ckpt.save(path, state)
    resumed = hmc.run_hmc(logp, theta0, key, **kwargs)
    np.testing.assert_allclose(
        resumed.samples[:, 100:, :], full.samples[:, 100:, :], atol=1e-12
    )
    np.testing.assert_allclose(resumed.samples, full.samples, atol=1e-12)


def test_nuts_checkpoint_resume(tmp_path):
    """NUTS has the same chunked checkpoint/resume contract as HMC."""
    from stan_tpu.infer import nuts

    def logp(th):
        return -0.5 * jnp.sum(th**2)

    path = str(tmp_path / "nuts.npz")
    kwargs = dict(n_samples=80, n_warmup=80, max_depth=4,
                  checkpoint_path=path, checkpoint_every=40)
    theta0 = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(2)
    full = nuts.run_nuts(logp, theta0, key, **kwargs)

    state = ckpt.load(path)
    state["n_done"] = 40
    state["n_chunks"] = 1
    state["theta"] = ckpt.load_chunks(path, 1)[0][:, -1, :]
    ckpt.save(path, state)
    resumed = nuts.run_nuts(logp, theta0, key, **kwargs)
    np.testing.assert_allclose(resumed.samples, full.samples, atol=1e-12)


def test_checkpoint_kernel_identity_guard(tmp_path):
    """A NUTS checkpoint must NOT resume an HMC run (and vice versa): the
    run-identity fields (kernel, n_warmup, chains, dim) gate resume, and a
    fresh start cleans the stale chunk sidecars (ADVICE r2)."""
    import os

    from stan_tpu.infer import hmc, nuts

    def logp(th):
        return -0.5 * jnp.sum(th**2)

    path = str(tmp_path / "ck.npz")
    theta0 = jnp.zeros((2, 2))
    nuts.run_nuts(logp, theta0, jax.random.PRNGKey(3), n_samples=40,
                  n_warmup=20, max_depth=3, checkpoint_path=path,
                  checkpoint_every=20)
    assert os.path.exists(ckpt.chunk_path(path, 1))
    state = ckpt.load(path)
    assert state["kernel"].startswith("nuts")

    # HMC over the same path: identity mismatch -> fresh run, fresh warmup,
    # chunk sidecars rewritten (the NUTS ones deleted first), and the
    # result matches an HMC run that never saw the stale checkpoint.
    res = hmc.run_hmc(logp, theta0, jax.random.PRNGKey(4), n_samples=30,
                      n_warmup=20, n_leapfrog=4, checkpoint_path=path,
                      checkpoint_every=30)
    clean = hmc.run_hmc(logp, theta0, jax.random.PRNGKey(4), n_samples=30,
                        n_warmup=20, n_leapfrog=4)
    np.testing.assert_allclose(res.samples, clean.samples, atol=1e-12)
    state = ckpt.load(path)
    assert state["kernel"] == "hmc:leapfrog4"
    # 30 draws in one chunk: sidecar 0 exists, stale NUTS sidecar 1 removed.
    assert os.path.exists(ckpt.chunk_path(path, 0))
    assert not os.path.exists(ckpt.chunk_path(path, 1))


def test_final_chunk_padding_no_retrace(tmp_path):
    """n_samples not divisible by the chunk size must not retrace the chunk
    scan with a new static length (VERDICT r3 weak item 4): the final chunk
    runs full-length and is truncated, and draws equal an undivided run."""
    from stan_tpu.infer import hmc

    def logp(th):
        return -0.5 * jnp.sum(th**2)

    theta0 = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(5)
    kwargs = dict(n_warmup=20, n_leapfrog=4)
    ragged = hmc.run_hmc(logp, theta0, key, n_samples=25,
                         checkpoint_every=10, **kwargs)
    assert ragged.samples.shape == (2, 25, 2)
    assert ragged.chunk_sizes == [10, 10, 5]
    # Same schedule, exact-multiple run: the shared prefix must agree (the
    # key schedule is a pure function of (rng, done), independent of
    # truncation).
    exact = hmc.run_hmc(logp, theta0, key, n_samples=30,
                        checkpoint_every=10, **kwargs)
    np.testing.assert_allclose(ragged.samples, exact.samples[:, :25],
                               atol=1e-12)


def test_hmc_checkpoint_missing_chunk_restarts(tmp_path):
    """A checkpoint whose chunk sidecar vanished is treated as absent."""
    import os

    from stan_tpu.infer import hmc

    def logp(th):
        return -0.5 * jnp.sum(th**2)

    path = str(tmp_path / "hmc.npz")
    kwargs = dict(n_samples=40, n_warmup=40, n_leapfrog=4,
                  checkpoint_path=path, checkpoint_every=20)
    theta0 = jnp.zeros((2, 2))
    full = hmc.run_hmc(logp, theta0, jax.random.PRNGKey(1), **kwargs)
    os.remove(ckpt.chunk_path(path, 0))
    redo = hmc.run_hmc(logp, theta0, jax.random.PRNGKey(1), **kwargs)
    np.testing.assert_allclose(redo.samples, full.samples, atol=1e-12)
