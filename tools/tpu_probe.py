"""On-chip probe: marginal timings for the stencil sweep variants + CG.

Measures, via loop-length differencing inside single jitted fori_loops (so
host dispatch through the device tunnel cancels out):

  * f32 fused Pallas sweep (the bench operator's apply)
  * f32 jnp shifted-slice sweep (the XLA form)
  * f64 jnp shifted-slice sweep (the on-device certification matvec),
    traced under scoped jax.enable_x64 — global x64 breaks Mosaic's
    pl.Element lowering (i64 index constants), so f64 work is scoped
  * full f32 CG iteration (apply + algebra)

Optionally captures a jax.profiler trace of the CG loop (--trace DIR).

Run on the TPU:  python tools/tpu_probe.py [--n 70] [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=70)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stan_tpu.core import meshgen
    from stan_tpu.fem import stencil

    n = args.n
    model = meshgen.hex_beam(n, n, n)
    op = stencil.build_stencil_operator(model, dtype=jnp.float32)
    assert op is not None
    f = op.to_grid(jnp.asarray(model.load_vector(), dtype=op.dtype))
    rhs = op.free_mask * f
    print(f"grid {op.node_shape}, ndof {3 * model.nnode}", flush=True)

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def chain_pallas(u, k):
        def body(_, x):
            return op.apply(x) * jnp.float32(1e-3)
        return jax.lax.fori_loop(0, k, body, u)

    t64, d64 = stencil.exact_tables(model)

    t32 = {s: {o: np.asarray(m, np.float32) for o, m in tt.items()}
           for s, tt in t64.items()}
    d32 = stencil.delta_tables(t32)

    def apply32_jnp(u):
        m = op.free_mask
        return (m * stencil._stencil_apply_jnp(t32, d32, m * u)
                + (1.0 - m) * u)

    @partial(jax.jit, static_argnums=(1,))
    def chain_jnp32(u, k):
        def body(_, x):
            return apply32_jnp(x) * jnp.float32(1e-3)
        return jax.lax.fori_loop(0, k, body, u)

    diag = op.diagonal()
    inv_diag = jnp.where(diag != 0, 1.0 / diag, 0.0)

    @partial(jax.jit, static_argnums=(1,))
    def cg_fixed(b, k):
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

        x, r, _, _ = jax.lax.fori_loop(0, k, body, (x, r, p, rz))
        return x, jnp.sqrt(jnp.sum(r * r))

    def marginal_ms(fn, u, lo, hi, reps=3):
        jax.block_until_ready(fn(u, lo))
        jax.block_until_ready(fn(u, hi))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(u, lo))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(fn(u, hi))
            th = time.perf_counter() - t0
            best = min(best, (th - tl) / (hi - lo))
        return 1000.0 * best

    print("pallas f32 apply : %.4f ms"
          % marginal_ms(chain_pallas, rhs, 10, 110), flush=True)
    print("jnp    f32 apply : %.4f ms"
          % marginal_ms(chain_jnp32, rhs, 10, 110), flush=True)

    with jax.enable_x64(True):
        free64 = jnp.asarray(np.asarray(op.free_mask), jnp.float64)

        def apply64(u):
            return (free64 * stencil._stencil_apply_jnp(t64, d64, free64 * u)
                    + (1.0 - free64) * u)

        @partial(jax.jit, static_argnums=(1,))
        def chain_f64(u, k):
            def body(_, x):
                return apply64(x) * jnp.float64(1e-3)
            return jax.lax.fori_loop(0, k, body, u)

        u64 = jnp.asarray(np.asarray(rhs), jnp.float64)
        print("jnp    f64 apply : %.4f ms"
              % marginal_ms(chain_f64, u64, 5, 55), flush=True)

    print("cg     f32 iter  : %.4f ms"
          % marginal_ms(cg_fixed, rhs, 10, 110), flush=True)

    if args.trace:
        jax.block_until_ready(cg_fixed(rhs, 100))
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(cg_fixed(rhs, 100))
        print("trace written to", args.trace, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
