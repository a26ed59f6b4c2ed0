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
  python -m stan_tpu.cli import mesh.bdf model.STdb [--E 210000 --poisson 0.3]
  python -m stan_tpu.cli export model.STdb out_prefix [--ascii]
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
    from stan_tpu.io import stdb
    from stan_tpu.utils.timing import PhaseTimer

    print(BANNER)
    timer = PhaseTimer(verbose=True)
    with timer.phase("Read database"):
        model = stdb.read(args.path)
    print(model.summary())

    # CLI overrides of the persisted Analysis settings (the reference GUI
    # also overrides before launch, MainWindow.xaml.cs:444-446).
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

    for mat in model.materials.values():
        if mat.E == -999.0 or mat.poisson == -999.0:
            print(f"  ERROR: material {mat.id} ({mat.name}) has no E/nu set")
            return 2

    if model.analysis.type == "Linear_Statics":
        from stan_tpu.analysis.linear import solve_linear_statics

        res = solve_linear_statics(model, timer=timer)
        ok = res.converged
        print(
            f"   Linear solve: {res.iters} iterations, "
            f"residual {res.residual:.3e}, converged={res.converged}"
        )
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
    return 0 if ok else 1


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
    p.set_defaults(fn=_cmd_solve)

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

    p = sub.add_parser("info", help="print database summary")
    p.add_argument("path")
    p.set_defaults(fn=_cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
