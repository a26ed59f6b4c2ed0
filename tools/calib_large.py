"""Large-model calibration smoke on the real TPU (VERDICT r4 task 1c).

Runs a short HMC calibration of (E, nu) on an N^3-element structured mesh
(default 64^3 = 823,875 DOF) through the stencil forward model on a single
chip — the size class where the general gather/scatter operator OOMs — and
appends the result to the run log.

Run:  python tools/calib_large.py [--n 64] [--chains 4] [--samples 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--leapfrog", type=int, default=4)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from stan_tpu.core import meshgen
    from stan_tpu.infer import calibrate, forward, hmc
    from stan_tpu.utils import runlog

    n = args.n
    model = meshgen.hex_beam(n, n, n)
    true_theta = np.array([np.log(190000.0), 0.28, 0.0])
    fwd = forward.build_forward(model, cg_tol=1e-6)
    assert isinstance(fwd, forward.StencilForwardProblem), type(fwd)
    print(f"model {n}^3: ndof {3 * model.nnode}", flush=True)

    t0 = time.time()
    u_true = np.asarray(
        forward.displacement_fn(fwd, model.nelem)(jnp.asarray(true_theta)))
    print(f"forward solve OK in {time.time() - t0:.1f}s "
          f"(|u|max {np.abs(u_true).max():.3e})", flush=True)
    total = np.linalg.norm(u_true, axis=1)
    nodes = np.nonzero(total > 0.3 * total.max())[0][:128]
    obs_nodes = np.repeat(nodes, 3)
    obs_dirs = np.tile([0, 1, 2], len(nodes))
    rng = np.random.default_rng(0)
    sigma = 1e-2 * float(np.abs(u_true).max())
    y = u_true[obs_nodes, obs_dirs] + sigma * rng.normal(size=len(obs_nodes))
    prob = calibrate.make_problem(model, obs_nodes, obs_dirs, y, sigma,
                                  cg_tol=1e-6)

    theta0 = jnp.asarray(
        np.array([np.log(210000.0), 0.0, 0.0])[None]
        + 0.05 * np.random.default_rng(7).normal(size=(args.chains, 3)))
    t0 = time.time()
    res = hmc.run_hmc(
        prob.log_posterior, theta0, jax.random.PRNGKey(11),
        n_samples=args.samples, n_warmup=args.warmup,
        n_leapfrog=args.leapfrog, init_step=0.01,
        checkpoint_every=max(2, args.samples // 3), warmup_chunk=4,
    )
    wall = time.time() - t0
    cons = calibrate.CalibrationProblem.constrain(res.samples)
    rec = {
        "metric": f"hmc_calibration_{n}cubed_tpu",
        "ndof": int(3 * model.nnode),
        "n_chains": args.chains,
        "n_samples": args.samples,
        "wall_seconds": round(wall, 1),
        "warmup_seconds": round(res.warmup_seconds, 1),
        "samples_per_s_chip": round(
            args.chains * sum(res.chunk_sizes[1:])
            / max(sum(res.chunk_seconds[1:]), 1e-9), 4),
        "accept_rate": float(np.mean(res.accept_rate)),
        "posterior_E_mean": float(cons[..., 0].mean()),
        "posterior_nu_mean": float(cons[..., 1].mean()),
        "truth": {"E": 190000.0, "nu": 0.28},
        "note": ("stencil forward model on ONE chip at a size where the "
                 "general gather operator OOMs (README limitation, closed)"),
    }
    runlog.append("runlog.jsonl", runlog.make_record("calib_large", **rec))
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
