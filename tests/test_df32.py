"""Double-float32 compensated stencil arithmetic (fem/df32.py).

These tests pin the compiler-proofing: XLA backends contract
add(x, mul(p, q)) into single-rounded fma at instruction selection, which
silently corrupts Dekker-style error-free transformations (measured: the
optimized HLO preserves the graph; optimization_barrier is expanded away
before fusion). fem/df32 is built only from contraction-invariant ops
(exact mask-split products + TwoSum); the sweep-accuracy assertions here
fail loudly if a future compiler change re-breaks that invariant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stan_tpu.core import meshgen
from stan_tpu.fem import df32, stencil

pytestmark = pytest.mark.slow


def test_mask_split_exact_and_bounded():
    rng = np.random.default_rng(0)
    a = (rng.normal(size=4096) * 10.0 ** rng.uniform(-30, 30, size=4096)
         ).astype(np.float32)
    hi, lo = jax.jit(df32.mask_split)(jnp.asarray(a))
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    # exact: hi + lo == a bitwise in f64
    np.testing.assert_array_equal(hi.astype(np.float64) + lo.astype(np.float64),
                                  a.astype(np.float64))
    # halves small enough that products of halves are exact in f32
    nz = a != 0
    assert (np.abs(lo[nz]) <= 2.0 ** -11 * np.abs(a[nz])).all()


def test_two_sum_exact_under_jit():
    rng = np.random.default_rng(1)
    a = (rng.normal(size=4096) * 10.0 ** rng.uniform(-6, 6, size=4096)
         ).astype(np.float32)
    b = (rng.normal(size=4096) * 10.0 ** rng.uniform(-6, 6, size=4096)
         ).astype(np.float32)
    s, e = jax.jit(df32.two_sum)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(s).astype(np.float64) + np.asarray(e).astype(np.float64)
    np.testing.assert_array_equal(got, a.astype(np.float64) + b.astype(np.float64))


def _setup(nx=6, ny=5, nz=4):
    m = meshgen.hex_beam(nx, ny, nz)
    op = stencil.build_stencil_operator(m, dtype=jnp.float32)
    t64, d64 = stencil.exact_tables(m)
    free = np.asarray(op.free_mask, np.float64)

    def A_hi(x):
        return (free * stencil.apply_numpy(t64, d64, free * x)
                + (1.0 - free) * x)

    return m, op, t64, d64, free, A_hi


def test_df_sweep_matches_host_f64():
    """The jitted df32 masked sweep reproduces the host float64 operator to
    ~1e-12 relative on an adversarial (6-decade dynamic range) operand —
    while the plain f32 sweep sits at ~1e-7. The second assertion is the
    compiler-contraction canary: if fma contraction ever re-corrupts the
    compensation, the df32 error rises to f32 level and this fails."""
    m, op, t64, d64, free, A_hi = _setup()
    rng = np.random.default_rng(2)
    shape = (3,) + tuple(s + 1 for s in (6, 5, 4))
    x64 = rng.normal(size=shape) * 10.0 ** rng.uniform(-3, 3, size=shape)
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    x_eff = xh.astype(np.float64) + xl.astype(np.float64)

    apply_df = df32.make_df_masked_apply(t64, d64, op.free_mask)
    fh, fl = jax.jit(apply_df)(jnp.asarray(xh), jnp.asarray(xl))
    got = np.asarray(fh).astype(np.float64) + np.asarray(fl).astype(np.float64)
    ref = A_hi(x_eff)
    scale = np.abs(ref).max()
    err_df = np.abs(got - ref).max() / scale

    got32 = np.asarray(jax.jit(op.apply)(jnp.asarray(x_eff, jnp.float32)),
                       np.float64)
    err_32 = np.abs(got32 - ref).max() / scale

    assert err_df < 1.0e-11, f"df32 sweep error {err_df:.3e}"
    assert err_df < 1.0e-3 * err_32, (
        f"compensation not engaging: df32 {err_df:.3e} vs f32 {err_32:.3e}")


def test_pcg_certified_reaches_true_1e6():
    """The on-device certified solve reaches a TRUE (host-f64-checked)
    relative residual <= 1e-6 — past the f32 recurrence floor — with its
    own on-device df32 residual agreeing with the host check."""
    from stan_tpu.solvers import cg as cg_mod

    m, op, t64, d64, free, A_hi = _setup()
    f = np.asarray(op.to_grid(jnp.asarray(m.load_vector()))) * free
    diag = op.diagonal()
    ndof = 3 * m.nnode
    dfA = df32.make_df_masked_apply(t64, d64, op.free_mask)

    cert = cg_mod.pcg_certified(
        op.apply, f, dfA, diag=diag, tol=1e-6, ndof=ndof)
    assert cert.converged
    assert cert.rel_residual <= 1e-6
    bnorm = np.linalg.norm(f.ravel())
    true_rel = np.linalg.norm((f - A_hi(cert.u)).ravel()) / bnorm
    assert true_rel <= 1.2e-6, f"host cross-check {true_rel:.3e}"
    # on-device df32 residual and host f64 residual agree
    assert true_rel == pytest.approx(cert.rel_residual, rel=0.3, abs=2e-8)
