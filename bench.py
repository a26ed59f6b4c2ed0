"""Headline benchmark: CG iterations/s at ~1M-DOF hex8 (single chip).

The BASELINE.json metric ("CG iters/s + DOF/s at 1M-DOF hex8"): a 70x70x70
structured HEX8 cantilever (1,073,733 DOF), assembled-stencil Jacobi-PCG,
float32 on the TPU.

Two measurements in one JSON line:
  * headline: fixed-100-iteration CG throughput (pure SpMV + reduction
    speed, comparable across rounds);
  * solve_to_tol: a full while_loop PCG to the reference's default
    tolerance 1e-6 (Analysis.cs:17), its true float64 relative residual
    checked against the exact-f64 operator (fem/stencil.apply_numpy), with
    mixed-precision iterative refinement cycles if the f32 recurrence
    residual alone does not certify 1e-6 (SURVEY.md section 7.3).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference-*equivalent* CPU pipeline measured on this
machine: scipy CSR SpMV Jacobi-CG (the role ALGLIB lincg plays,
src/STAN_Solver/SolverFunctions.cs:270-330) on the identical 1.07M-DOF
problem. See CPU_BASELINE_ITERS_PER_S provenance note below.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "iters/s", "vs_baseline": N, ...}
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

    import numpy as np
    import jax
    import jax.numpy as jnp

    from stan_tpu.core import meshgen
    from stan_tpu.fem import stencil
    from stan_tpu.solvers import cg as cg_mod

    model = meshgen.hex_beam(n, n, n)
    # Assembled-stencil fast path (Pallas 27-point interior sweep + exact
    # XLA boundary corrections): the TPU-native operator for this mesh
    # family; exact-equivalent to the structured and general operators
    # (tests/test_stencil.py, tests/test_structured.py).
    op = stencil.build_stencil_operator(model)
    assert op is not None
    f = op.to_grid(jnp.asarray(model.load_vector(), dtype=op.dtype))
    rhs = op.free_mask * f
    ndof = 3 * model.nnode

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def cg_fixed(op, b, niters):
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

    @partial(jax.jit, static_argnums=2)
    def apply_chain(op, b, niters):
        """op.apply chained on itself: isolates the SpMV from CG algebra."""
        def body(_, x):
            return op.apply(x) * jnp.float32(1e-3)  # rescale, avoid overflow
        return jax.lax.fori_loop(0, niters, body, b)

    def timed(fn, n_it):
        r = fn(op, rhs, n_it)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = fn(op, rhs, n_it)
        jax.block_until_ready(r)
        return time.perf_counter() - t0, r

    # Dispatch-overhead-aware measurement: one jitted call through the
    # device tunnel carries a fixed ~20-25 ms host/sync cost regardless of
    # loop length (measured by differencing two loop lengths), so the
    # headline is the DEVICE marginal per-iteration throughput plus an
    # explicit record of the fixed overhead. Round 3's 100-iteration
    # single-shot timing under-reported by ~1.6x for this reason.
    n_lo, n_hi = (10, 50) if small else (100, 1000)
    t_lo, _ = timed(cg_fixed, n_lo)
    t_hi, (x, rn) = timed(cg_fixed, n_hi)
    resid = float(rn)
    marginal = (t_hi - t_lo) / (n_hi - n_lo)
    fixed_overhead = max(t_lo - n_lo * marginal, 0.0)
    iters_per_s = 1.0 / marginal
    dt = t_hi
    niters = n_hi
    ta_lo, _ = timed(apply_chain, n_lo)
    ta_hi, _ = timed(apply_chain, n_hi)
    apply_ms = 1000.0 * (ta_hi - ta_lo) / (n_hi - n_lo)

    # Roofline accounting (BASELINE "speed-of-light SpMV per chip"): the
    # f32 grid is [3, n+1, n+1, n+1]; one CG iteration touches ~8 vector
    # passes (apply read+write, 2 reduction reads, 3 axpy read/writes).
    vec_mb = rhs.size * rhs.dtype.itemsize / 1e6
    roofline = {
        "device_marginal_ms_per_iter": round(1000.0 * marginal, 4),
        "apply_marginal_ms": round(apply_ms, 4),
        "cg_algebra_ms": round(1000.0 * marginal - apply_ms, 4),
        "fixed_dispatch_ms": round(1000.0 * fixed_overhead, 1),
        "vector_mb": round(vec_mb, 2),
        "analysis": (
            "VMEM-resident regime: the 7-vector CG working set "
            f"(~{7 * vec_mb:.0f} MB) fits on-chip, so HBM bandwidth is not "
            "the binding constraint; the apply is bounded by Pallas "
            "kernel scheduling (27 shifted-window materializations + "
            "tiered boundary ops per block), measured via loop-length "
            "differencing. Variants tried and beaten by the tiered "
            "kernel: flattened-lane Pallas interior + XLA deltas "
            "(1.5x slower), pure-XLA shifted-slice form (2.5x slower), "
            "BX in {4,16,32}."
        ),
    }

    # ---- solve to the reference default tolerance 1e-6 (Analysis.cs:17) ----
    # tol is traced so the refinement correction solves below reuse this
    # exact executable (a fresh 1M-DOF while_loop compile costs ~30 s and
    # was the bulk of round 2's reported refine_seconds).
    diag = op.diagonal()
    solve = jax.jit(lambda b, tol: cg_mod.pcg(
        op.apply, b, diag=diag, tol=tol, maxiter=10 * ndof, ndof=ndof))
    res0 = solve(rhs, 1e-6)
    int(res0.iters)  # warm sync
    t0 = time.perf_counter()
    res = solve(rhs, 1e-6)
    tol_iters = int(res.iters)
    tol_dt = time.perf_counter() - t0

    # True f64 residual against the exact operator (independent host check).
    t64, d64 = stencil.exact_tables(model)
    free = np.asarray(op.free_mask, np.float64)

    def A_hi(xg):
        return (free * stencil.apply_numpy(t64, d64, free * xg)
                + (1.0 - free) * xg)

    b64 = np.asarray(rhs, np.float64)
    bnorm = float(np.linalg.norm(b64.ravel()))
    x64 = np.asarray(res.u, np.float64)
    true_rel = float(np.linalg.norm((b64 - A_hi(x64)).ravel())) / bnorm

    refine_cycles = 0
    refine_iters = 0
    refine_dt = 0.0
    refine_breakdown = None
    if true_rel > 1e-6:
        # f32 recurrence alone did not certify 1e-6: mixed-precision
        # refinement warm-started from the f32 solution, adaptive inner
        # tolerance (each cycle solves the correction only as accurately
        # as the remaining gap to tol requires).
        t0 = time.perf_counter()
        rr = cg_mod.pcg_refined(
            op.apply, b64, A_hi, diag=diag, tol=1e-6,
            maxiter=10 * ndof, ndof=ndof, x0=x64,
            inner_solve=lambda r, t: solve(jnp.asarray(r, op.dtype), t))
        refine_dt = time.perf_counter() - t0
        true_rel = rr.rel_residual
        refine_cycles = rr.cycles
        refine_iters = rr.inner_iters
        refine_breakdown = {
            "f64_sweep_seconds": round(rr.sweep_seconds, 3),
            "inner_solve_seconds": round(rr.inner_seconds, 3),
            "note": (
                "certification floor: an f32 correction solve's true "
                "residual bottoms at ~eps32*kappa (~2e-3 here), so "
                "reaching 1e-6 from an f32 base solve requires two "
                "mandatory refinement cycles; inner_solve_seconds "
                "includes ~0.1-0.3 s/cycle of host<->device transfer "
                "through this environment's HTTP device tunnel "
                "(~100 MB/s; PCIe-attached chips move the same vectors "
                "in <1 ms)"
            ),
        }

    # ---- HMC samples/s/chip (BASELINE.json second metric) ----------------
    # Calibration of (E, nu) against synthetic displacement observations on
    # a 32^3 structured mesh, stencil fast-path forward model
    # (infer/forward.StencilForwardProblem), 1 chain on this chip. Chunked
    # sampling: the first chunk absorbs jit compile, steady-state samples/s
    # comes from the later chunks (hmc.HMCResult.chunk_seconds).
    hmc_stats = None
    try:
        hmc_stats = _hmc_bench(8 if small else 32)
    except Exception as e:  # never let the inference bench kill the CG line
        hmc_stats = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": f"cg_iters_per_s_{ndof}dof_hex8_f32",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / CPU_BASELINE_ITERS_PER_S, 2),
        "ndof": ndof,
        "nelem": model.nelem,
        "dof_per_s": round(ndof * iters_per_s, 0),
        f"seconds_for_{niters}_iters": round(dt, 3),
        "residual": resid,
        "roofline": roofline,
        "solve_to_tol_1e6": {
            "iters": tol_iters,
            "seconds": round(tol_dt, 3),
            "recurrence_rel_residual": float(res.residual) / max(
                float(jnp.sqrt(jnp.sum(rhs * rhs))), 1e-300),
            "true_f64_rel_residual": true_rel,
            "converged": bool(res.converged),
            "refine_cycles": refine_cycles,
            "refine_inner_iters": refine_iters,
            "refine_seconds": round(refine_dt, 3),
            "refine_breakdown": refine_breakdown,
        },
        "baseline": f"scipy CSR Jacobi-CG on this host: {CPU_BASELINE_ITERS_PER_S} iters/s",
        "hmc": hmc_stats,
    }))
    return 0


def _hmc_bench(g: int) -> dict:
    """HMC samples/s/chip on a g^3-element FEM calibration (stencil forward).

    Returns steady-state samples/s (later chunks only; chunk 0 carries the
    jit compile), evals_per_sample, and the posterior-mean sanity check.
    The recorded chains-scaling proxy is re-measured by
    tools/chains_scaling.py on the 8-device virtual CPU mesh.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stan_tpu.core import meshgen
    from stan_tpu.infer import calibrate, forward, hmc

    model = meshgen.hex_beam(g, g, g)
    true_theta = np.array([np.log(190000.0), 0.28, 0.0])
    fwd = forward.build_forward(model, cg_tol=1e-6)
    assert isinstance(fwd, forward.StencilForwardProblem)
    u_true = np.asarray(
        forward.displacement_fn(fwd, model.nelem)(jnp.asarray(true_theta)))
    total = np.linalg.norm(u_true, axis=1)
    nodes = np.nonzero(total > 0.3 * total.max())[0][:128]
    obs_nodes = np.repeat(nodes, 3)
    obs_dirs = np.tile([0, 1, 2], len(nodes))
    rng = np.random.default_rng(0)
    sigma = 1e-4 * float(np.abs(u_true).max())
    y = u_true[obs_nodes, obs_dirs] + sigma * rng.normal(size=len(obs_nodes))
    prob = calibrate.make_problem(model, obs_nodes, obs_dirs, y, sigma,
                                  cg_tol=1e-6)

    n_leapfrog = 8
    n_samples, chunk = 30, 10
    theta0 = jnp.asarray([[np.log(210000.0), 0.0, 0.0]])
    res = hmc.run_hmc(
        prob.log_posterior, theta0, jax.random.PRNGKey(11),
        n_samples=n_samples, n_warmup=48, n_leapfrog=n_leapfrog,
        init_step=0.02, checkpoint_every=chunk,
    )
    steady_s = sum(res.chunk_seconds[1:])
    steady_n = sum(res.chunk_sizes[1:])
    sps = steady_n / steady_s if steady_s > 0 else 0.0
    cons = calibrate.CalibrationProblem.constrain(res.samples)
    return {
        "metric": f"hmc_samples_per_s_chip_{g}cubed_fem_calibration",
        "samples_per_s_chip": round(sps, 3),
        "ndof": int(3 * model.nnode),
        "n_chains": 1,
        "n_leapfrog": n_leapfrog,
        "evals_per_sample": float(np.mean(res.evals_per_sample)),
        "grad_seconds_per_eval": round(
            steady_s / (steady_n * n_leapfrog), 4),
        "accept_rate": float(np.mean(res.accept_rate)),
        "warmup_seconds": round(res.warmup_seconds, 2),
        "posterior_E_mean": float(cons[..., 0].mean()),
        "posterior_nu_mean": float(cons[..., 1].mean()),
        "truth": {"E": 190000.0, "nu": 0.28},
        "chains_scaling_cpu_mesh_recorded": {
            # tools/chains_scaling.py, 8-device virtual CPU mesh, 2026-08-20:
            # raw efficiency limited by 8 virtual devices sharing 2 physical
            # cores; sharded-vs-vmap ~0.99 shows NamedSharding placement
            # itself costs ~1%.
            "scaling_efficiency": 0.771,
            "sharded_vs_vmap": 0.987,
        },
    }


if __name__ == "__main__":
    sys.exit(main())
