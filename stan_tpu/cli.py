"""Command-line interface.

``stan-solve``-style batch driver, the counterpart of the reference console
solver (src/STAN_Solver/Solver.cs:18-69: read STdb -> solve -> overwrite the
same file -> print banner/summary/timings), plus import/export/info commands
covering the data pipeline the reference GUI performs interactively
(.bdf import: MainWindow.xaml.cs:181-238; .vtu export:
ExportWindow.xaml.cs:43-108).

Usage:
  python -m stan_tpu.cli solve model.STdb [--solver CG|Cholesky|LU]
                                          [--tol 1e-6] [--maxiter N]
                                          [--type Linear_Statics|Nonlinear_Statics]
                                          [--increments N] [--out other.STdb]
                                          [--config run.toml] [--log-json run.jsonl]
  python -m stan_tpu.cli calibrate model.STdb [--sampler nuts|hmc|vi|smc]
                                          [--chains N --warmup N --samples N]
                                          [--synthetic] [--n-obs K]
  python -m stan_tpu.cli import mesh.bdf model.STdb [--E 210000 --poisson 0.3]
  python -m stan_tpu.cli export model.STdb out_prefix [--ascii]
  python -m stan_tpu.cli strip-results model.STdb [--out other.STdb]
  python -m stan_tpu.cli info model.STdb
"""

from __future__ import annotations

import argparse
import sys

BANNER = r"""
  ==========================================================
      stan_tpu  —  TPU-native structural analysis
      linear / nonlinear statics · HEX8/TET4 · JAX/XLA
  ==========================================================
"""


def _cmd_solve(args) -> int:
    from stan_tpu.core import model as model_mod  # noqa: F401 (import order)
    from stan_tpu.core import validate
    from stan_tpu.io import stdb
    from stan_tpu.utils import config as config_mod
    from stan_tpu.utils import runlog
    from stan_tpu.utils.timing import PhaseTimer

    print(BANNER)
    timer = PhaseTimer(verbose=True)
    with timer.phase("Read database"):
        model = stdb.read(args.path)
    print(model.summary())

    # Config layering: TOML file (if given) then CLI flags, applied on top
    # of the persisted Analysis settings (the reference GUI also overrides
    # before launch, MainWindow.xaml.cs:444-446).
    if args.config:
        cfg = config_mod.load(args.config)
        cfg.apply_to_model(model)
    if args.solver:
        model.analysis.lin_solver = args.solver
    if args.tol is not None:
        model.analysis.lin_solver_tolerance = args.tol
    if args.maxiter is not None:
        model.analysis.lin_solver_maxiter = args.maxiter
    if args.type:
        model.analysis.type = args.type
    if args.increments is not None:
        model.analysis.inc_numb = args.increments

    # Validate-and-refuse at ingest (SURVEY.md §5.3; the reference only
    # checks material assignment, MainWindow.xaml.cs:474-487).
    problems = validate.check_model(model)
    if problems:
        print("  ERROR: model validation failed:")
        for p in problems:
            print(f"    - {p}")
        return 2

    if model.analysis.type == "Linear_Statics":
        from stan_tpu.analysis.linear import solve_linear_statics

        res = solve_linear_statics(model, timer=timer, n_domain=args.domain)
        ok = res.converged
        print(
            f"   Linear solve: {res.iters} iterations, "
            f"residual {res.residual:.3e}, converged={res.converged}"
        )
        print(f"   Operator: {res.operator} "
              f"({res.n_domain} device{'s' if res.n_domain != 1 else ''})")
        if res.true_residual is not None:
            print(f"   Certified f64 residual: {res.true_residual:.3e} "
                  f"({res.refine_cycles} refinement cycles, "
                  f"{res.refine_iters} extra CG iterations)")
    elif model.analysis.type == "Nonlinear_Statics":
        from stan_tpu.analysis.nonlinear import solve_nonlinear_statics

        res = solve_nonlinear_statics(model, timer=timer)
        ok = res.converged
    else:
        print(f"  ERROR: unknown analysis type {model.analysis.type!r}")
        return 2

    out = args.out or args.path
    with timer.phase("Write database"):
        stdb.write(model, out)
    print(timer.summary())
    if args.log_json:
        runlog.append(args.log_json, runlog.make_record(
            "solve", model=model, timer=timer,
            iters=getattr(res, "iters", None),
            residual=getattr(res, "residual", None),
            converged=bool(ok), path=args.path, out=out,
            operator=getattr(res, "operator", None),
            n_domain=getattr(res, "n_domain", None),
            true_residual=getattr(res, "true_residual", None),
            refine_cycles=getattr(res, "refine_cycles", None),
        ))
    return 0 if ok else 1


def _cmd_calibrate(args) -> int:
    """Bayesian calibration of (E, nu) against observed displacements.

    The BASELINE.json inference configs as a CLI: the FEM solve is the
    forward model, chains run vmapped (sharded over devices when several
    are visible). Observations come from the STdb's stored displacement
    results; --synthetic generates them by solving the model and adding
    noise (a self-check that recovers the true material)."""
    import numpy as np

    from stan_tpu.core import validate
    from stan_tpu.infer import calibrate as cal_mod
    from stan_tpu.io import stdb
    from stan_tpu.utils import config as config_mod
    from stan_tpu.utils import runlog
    from stan_tpu.utils.timing import PhaseTimer

    print(BANNER)
    timer = PhaseTimer(verbose=True)
    cfg = config_mod.load(args.config) if args.config else config_mod.load()
    inf = cfg.inference
    if args.sampler:
        inf.sampler = args.sampler
    if args.chains:
        inf.chains = args.chains
    if args.warmup is not None:
        inf.warmup = args.warmup
    if args.samples is not None:
        inf.samples = args.samples

    with timer.phase("Read database"):
        model = stdb.read(args.path)
    print(model.summary())
    problems = validate.check_model(model)
    if problems:
        print("  ERROR: model validation failed:")
        for p in problems:
            print(f"    - {p}")
        return 2

    # Observations: tip-region DOFs with the largest response.
    with timer.phase("Observations"):
        if model.disp is not None and model.analysis.result_step_no > 0:
            u_obs_full = model.disp[-1]
        elif args.synthetic:
            from stan_tpu.analysis.linear import solve_linear_statics

            res = solve_linear_statics(model, store=False)
            u_obs_full = np.asarray(res.u)
        else:
            print("  ERROR: no results in database "
                  "(run solve first, or pass --synthetic)")
            return 2
        mag = np.abs(u_obs_full).max(axis=1)
        obs_nodes = np.argsort(mag)[-args.n_obs:]
        obs_dirs = np.abs(u_obs_full[obs_nodes]).argmax(axis=1)
        rng = np.random.default_rng(inf.seed)
        y = u_obs_full[obs_nodes, obs_dirs]
        sigma = max(inf.sigma_obs, 1e-3 * float(np.abs(y).max()))
        y = y + rng.normal(0.0, sigma, y.shape)

    with timer.phase("Build posterior"):
        prob = cal_mod.make_problem(
            model, obs_nodes, obs_dirs, y, sigma,
            infer_load=inf.infer_load,
        )

    import time as _time

    import jax as _jax
    import jax.numpy as _jnp

    from stan_tpu.parallel import distributed

    # Device mesh for chain sharding ([sharding] config section; SURVEY.md
    # §2.5 chain parallelism). Explicit extents win; otherwise all visible
    # devices go on the chains axis when the chain count divides evenly.
    sh = cfg.sharding
    n_dev = len(_jax.devices())
    mesh = None
    if sh.chains > 1 or sh.domain > 1:
        try:
            mesh = distributed.device_mesh(sh.chains, sh.domain)
        except ValueError as e:
            # Config/hardware mismatch is a user error: report and exit
            # cleanly instead of tracebacking (ADVICE r2).
            print(f"  ERROR: [sharding] {e}")
            return 2
    elif n_dev > 1 and inf.chains % n_dev == 0:
        mesh = distributed.device_mesh(n_dev, 1)
    if mesh is not None:
        n_chain_dev = mesh.devices.shape[0]
        if inf.chains % n_chain_dev:
            print(f"  ERROR: chains={inf.chains} not divisible by the "
                  f"chains mesh axis ({n_chain_dev})")
            return 2
        print(f"   {distributed.describe(mesh)}")

    # Overdispersed chain initializations (one theta0 tiled across chains
    # would make R-hat systematically understate non-convergence): jitter
    # each chain around the prior mean at ~half the prior scale.
    rng_init = np.random.default_rng(inf.seed)
    init_scale = np.asarray([0.5 * prob.sigma_logE, 1.0,
                             0.5 * prob.sigma_logs])
    if not inf.infer_load:
        init_scale[2] = 0.0
    theta0 = _jnp.asarray(
        np.asarray([prob.mu_logE, 0.0, 0.0])
        + rng_init.normal(0.0, 1.0, (inf.chains, 3)) * init_scale)
    key = _jax.random.PRNGKey(inf.seed)
    rhat = ess = None
    t0 = _time.perf_counter()
    with timer.phase(f"Sample ({inf.sampler})"):
        if inf.sampler in ("hmc", "nuts"):
            from stan_tpu.infer import hmc as hmc_mod
            from stan_tpu.infer import nuts as nuts_mod

            run = hmc_mod.run_hmc if inf.sampler == "hmc" else nuts_mod.run_nuts
            out = run(
                prob.log_posterior, theta0, key,
                n_warmup=inf.warmup, n_samples=inf.samples,
                mesh=mesh,
            )
            samples = np.asarray(out.samples)  # [chains, n, 3]
            accept = float(np.mean(out.accept_rate))
            rhat, ess = np.max(out.rhat), np.min(out.ess)
        elif inf.sampler == "vi":
            from stan_tpu.infer import vi as vi_mod

            out = vi_mod.run_advi(
                prob.log_posterior, theta0[0], key, n_steps=inf.samples)
            samples = out.sample(key, inf.chains * 256)[None]
            accept = float("nan")
        else:  # smc: prior/likelihood split of the same posterior
            from stan_tpu.infer import smc as smc_mod

            def log_prior(theta):
                lp = -0.5 * ((theta[0] - prob.mu_logE) / prob.sigma_logE) ** 2
                lp += _jax.nn.log_sigmoid(theta[1]) + _jax.nn.log_sigmoid(
                    -theta[1])
                return lp - 0.5 * (theta[2] / prob.sigma_logs) ** 2

            def log_like(theta):
                return prob.log_posterior(theta) - log_prior(theta)

            def sample_prior(k, n):
                ks = _jax.random.split(k, 3)
                return _jnp.stack([
                    prob.mu_logE
                    + prob.sigma_logE * _jax.random.normal(ks[0], (n,)),
                    _jax.random.logistic(ks[1], (n,)),
                    prob.sigma_logs * _jax.random.normal(ks[2], (n,)),
                ], axis=1)

            out = smc_mod.run_smc(
                log_prior, log_like, sample_prior, key,
                n_particles=max(inf.chains * 64, 256),
                mesh=mesh,
            )
            samples = np.asarray(out.particles)[None]
            accept = float(np.mean(out.acceptance))
    wall = _time.perf_counter() - t0

    cons = cal_mod.CalibrationProblem.constrain(np.asarray(samples))
    flat = cons.reshape(-1, cons.shape[-1])
    names = ("E", "nu", "load_scale")
    print("  ==================   POSTERIOR   =========================")
    for k, name in enumerate(names):
        q = np.percentile(flat[:, k], [5, 50, 95])
        print(f"   {name:>10s}: median {q[1]:.6g}   90% CI "
              f"[{q[0]:.6g}, {q[2]:.6g}]")
    n_draws = int(np.prod(np.asarray(samples).shape[:-1]))
    sps = n_draws / wall if wall > 0 else float("nan")
    print(f"   draws: {n_draws}  wall: {wall:.1f}s  "
          f"samples/s: {sps:.1f}  accept: {accept:.3f}")
    if rhat is not None:
        print(f"   R-hat: {rhat:.4f} (max over params)  min ESS: {ess:.0f}")
    print(timer.summary())
    if args.log_json:
        runlog.append(args.log_json, runlog.make_record(
            "calibrate", model=model, timer=timer,
            sampler=inf.sampler, chains=inf.chains, draws=n_draws,
            samples_per_s=sps, accept=accept, path=args.path,
            mesh=distributed.describe(mesh) if mesh is not None else None,
            n_devices=n_dev,
            rhat=float(rhat) if rhat is not None else None,
        ))
    return 0


def _cmd_import(args) -> int:
    from stan_tpu.core.model import Material
    from stan_tpu.io import nastran, stdb

    model = nastran.read_bdf(args.bdf, strict=args.strict)
    if model.import_errors:
        print(f"  WARNING: {len(model.import_errors)} cards failed to parse")
        for line in model.import_errors[:10]:
            print(f"    {line[:70]}")
    # Default material assignment so the file is immediately solvable once
    # BCs are added (the reference requires assigning materials in the GUI
    # before running, MainWindow.xaml.cs:474-487).
    if args.E is not None:
        model.materials[1] = Material(
            id=1, name="default", E=args.E, poisson=args.poisson
        )
        import numpy as np

        model.elem_mat = np.ones(model.nelem, dtype=np.int64)
        for info in model.part_info.values():
            info.mat_id = 1
    stdb.write(model, args.out)
    print(model.summary())
    print(f"  Wrote {args.out}")
    return 0


def _cmd_export(args) -> int:
    from stan_tpu.io import stdb
    from stan_tpu.post import fields

    model = stdb.read(args.path)
    if model.disp is None:
        print("  ERROR: no results in database (run solve first)")
        return 2
    paths = fields.export_vtu(
        model, args.prefix, binary=not args.ascii,
        deformed=not args.undeformed,
    )
    for p in paths:
        print(f"  Wrote {p}")
    return 0


def _cmd_strip_results(args) -> int:
    """Remove stored results from an STdb (the reference GUI's
    Remove Results action, MainWindow.xaml.cs:731-763), shrinking the file
    back to pre-solve size."""
    import os

    from stan_tpu.io import stdb

    model = stdb.read(args.path)
    if model.disp is None:
        print("  No results in database; nothing to strip")
        return 0
    before = os.path.getsize(args.path)
    model.strip_results()
    out = args.out or args.path
    stdb.write(model, out)
    after = os.path.getsize(out)
    print(f"  Stripped results: {before} -> {after} bytes ({out})")
    return 0


def _cmd_info(args) -> int:
    from stan_tpu.io import stdb

    model = stdb.read(args.path)
    print(model.summary())
    a = model.analysis
    print(f"   Analysis: {a.type}, solver {a.lin_solver}, "
          f"tol {a.lin_solver_tolerance}, maxiter {a.lin_solver_maxiter}")
    print(f"   Materials: {len(model.materials)}, BCs: {len(model.bcs)}, "
          f"parts: {len(model.part_info)}")
    if model.disp is not None:
        print(f"   Results: {model.disp.shape[0]} increments "
              f"(result_step_no={a.result_step_no})")
    return 0


def _enable_compilation_cache() -> None:
    """Optionally persist XLA executables across CLI invocations.

    Off by default: measured on the tunneled TPU backend here, executable
    (de)serialization makes solves 40-90x slower than a fresh compile, so
    the cache is only enabled when the user sets STAN_TPU_CACHE explicitly.
    """
    import os

    cache_dir = os.environ.get("STAN_TPU_CACHE")
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs — run uncached


def main(argv=None) -> int:
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="stan_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("solve", help="run the solver on an STdb file")
    p.add_argument("path")
    p.add_argument("--solver", choices=["CG", "Cholesky", "LU"])
    p.add_argument("--tol", type=float)
    p.add_argument("--maxiter", type=int)
    p.add_argument("--type", choices=["Linear_Statics", "Nonlinear_Statics"])
    p.add_argument("--increments", type=int)
    p.add_argument("--out", help="write results here instead of overwriting")
    p.add_argument("--domain", type=int, default=None,
                   help="domain-decomposition width (devices); default: all "
                        "visible devices for large meshes, 1 otherwise")
    p.add_argument("--config", help="TOML run config (utils/config.py)")
    p.add_argument("--log-json", help="append a structured run record here")
    p.set_defaults(fn=_cmd_solve)

    p = sub.add_parser(
        "calibrate",
        help="Bayesian calibration of (E, nu) from displacement results")
    p.add_argument("path")
    p.add_argument("--sampler", choices=["hmc", "nuts", "vi", "smc"])
    p.add_argument("--chains", type=int)
    p.add_argument("--warmup", type=int)
    p.add_argument("--samples", type=int)
    p.add_argument("--n-obs", type=int, default=16,
                   help="number of observed DOFs (largest-response nodes)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate observations by solving + adding noise")
    p.add_argument("--config", help="TOML run config (utils/config.py)")
    p.add_argument("--log-json", help="append a structured run record here")
    p.set_defaults(fn=_cmd_calibrate)

    p = sub.add_parser("import", help="convert a Nastran .bdf mesh to STdb")
    p.add_argument("bdf")
    p.add_argument("out")
    p.add_argument("--E", type=float, help="assign a default material E")
    p.add_argument("--poisson", type=float, default=0.3)
    p.add_argument("--strict", action="store_true",
                   help="reference whitelist (CHEXA only)")
    p.set_defaults(fn=_cmd_import)

    p = sub.add_parser("export", help="export results to ParaView .vtu")
    p.add_argument("path")
    p.add_argument("prefix")
    p.add_argument("--ascii", action="store_true")
    p.add_argument("--undeformed", action="store_true")
    p.set_defaults(fn=_cmd_export)

    p = sub.add_parser(
        "strip-results",
        help="remove stored results from an STdb (shrinks the file)")
    p.add_argument("path")
    p.add_argument("--out", help="write here instead of overwriting")
    p.set_defaults(fn=_cmd_strip_results)

    p = sub.add_parser("info", help="print database summary")
    p.add_argument("path")
    p.set_defaults(fn=_cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
