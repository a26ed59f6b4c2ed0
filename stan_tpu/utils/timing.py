"""Phase timing + structured logging.

Keeps the reference's habit of printing a per-phase timing table
(src/STAN_Solver/Solver.cs:213-216, SolverFunctions.cs:176-177,326-327) while
adding a machine-readable record per phase. Wraps jax.profiler trace
annotations so phases show up in TPU profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


class PhaseTimer:
    def __init__(self, verbose: bool = True):
        self.records: List[Dict] = []
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str, **meta):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self.records.append({"phase": name, "seconds": dt, **meta})
        if self.verbose:
            print(f"   {name + ':':<28s} Done in {dt:.2f}s")

    def total(self) -> float:
        return sum(r["seconds"] for r in self.records)

    def summary(self) -> str:
        sep = "  ========================================================== "
        lines = [sep]
        for r in self.records:
            extra = ", ".join(
                f"{k}={v}" for k, v in r.items() if k not in ("phase", "seconds")
            )
            lines.append(
                f"   {r['phase']:<24s} {r['seconds']:>9.2f} s"
                + (f"   [{extra}]" if extra else "")
            )
        lines.append(f"   {'Total':<24s} {self.total():>9.2f} s")
        lines.append(sep)
        return "\n".join(lines)
