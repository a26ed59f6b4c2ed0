"""Headline benchmark: CG iterations/s at ~1M-DOF hex8 (single chip).

The BASELINE.json metric ("CG iters/s + DOF/s at 1M-DOF hex8"): a 70x70x70
structured HEX8 cantilever (1,073,733 DOF), matrix-free Jacobi-PCG with the
gather-based incidence scatter, float32 on the TPU.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference-*equivalent* CPU pipeline measured on this
machine: scipy CSR SpMV Jacobi-CG (the role ALGLIB lincg plays,
src/STAN_Solver/SolverFunctions.cs:270-330) on the identical 1.07M-DOF
problem. See CPU_BASELINE_ITERS_PER_S provenance note below.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "iters/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

# Measured 2026-08-17 on this machine (2-vCPU host, scipy CSR +
# Jacobi-preconditioned CG, float64, 84.5M-nnz K, same 70^3 hex8 mesh:
# "CPU scipy Jacobi-CG: 50 iters in 9.50s -> 5.26 iters/s");
# see tools/cpu_baseline.py to re-measure.
CPU_BASELINE_ITERS_PER_S = 5.26


def main() -> int:
    small = "--small" in sys.argv
    n = 12 if small else 70  # 70^3 -> 1,073,733 DOF

    import jax
    import jax.numpy as jnp

    from stan_tpu.core import meshgen
    from stan_tpu.fem import stencil

    model = meshgen.hex_beam(n, n, n)
    # Assembled-stencil fast path (Pallas 27-point sweep with exact tiered
    # boundary tables): the TPU-native operator for this mesh family;
    # exact-equivalent to the structured and general operators
    # (tests/test_stencil.py, tests/test_structured.py).
    op = stencil.build_stencil_operator(model)
    assert op is not None
    f = op.to_grid(jnp.asarray(model.load_vector(), dtype=op.dtype))
    rhs = op.free_mask * f
    ndof = 3 * model.nnode

    niters = 100

    @jax.jit
    def cg_fixed(op, b):
        """Jacobi-PCG, fixed iteration count (pure throughput measurement)."""
        diag = op.diagonal()
        inv_diag = jnp.where(diag != 0, 1.0 / diag, 0.0)
        x = jnp.zeros_like(b)
        r = b
        z = inv_diag * r
        p = z
        rz = jnp.sum(r * z)

        def body(_, state):
            x, r, p, rz = state
            Ap = op.apply(p)
            alpha = rz / jnp.sum(p * Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = inv_diag * r
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, r, p, rz_new)

        x, r, _, _ = jax.lax.fori_loop(0, niters, body, (x, r, p, rz))
        return x, jnp.sqrt(jnp.sum(r * r))

    # Compile + warm run (forces a real host readback for true sync through
    # the device tunnel — block_until_ready alone under-reports there).
    x, rn = cg_fixed(op, rhs)
    float(rn)
    # Timed run.
    t0 = time.perf_counter()
    x, rn = cg_fixed(op, rhs)
    resid = float(rn)
    dt = time.perf_counter() - t0

    iters_per_s = niters / dt
    print(json.dumps({
        "metric": f"cg_iters_per_s_{ndof}dof_hex8_f32",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / CPU_BASELINE_ITERS_PER_S, 2),
        "ndof": ndof,
        "nelem": model.nelem,
        "dof_per_s": round(ndof * iters_per_s, 0),
        "seconds_for_100_iters": round(dt, 3),
        "residual": resid,
        "baseline": f"scipy CSR Jacobi-CG on this host: {CPU_BASELINE_ITERS_PER_S} iters/s",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
