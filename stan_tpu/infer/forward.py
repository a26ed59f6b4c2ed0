"""Differentiable FEM forward model for probabilistic inference.

The inference layer (BASELINE.json north star) treats the linear-statics
solve as the forward model: parameters theta = (material constants, load
scale) -> displacement field u(theta). Gradients flow through the linear
solve *implicitly* via jax.lax.custom_linear_solve — an adjoint solve with
the same SPD operator — rather than unrolled CG (SURVEY.md §7.3
"Differentiating through the solve").

Design: the stiffness action is a function of per-element (lam, mu) Lame
fields, so material parameters enter through a [E]-shaped map; load
parameters scale the RHS. Everything stays matrix-free and jit/vmap/grad
composable — vmap over theta batches gives the chain/particle axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stan_tpu.core.model import FEModel
from stan_tpu.fem import kernels
from stan_tpu.fem.kernels import _einsum
from stan_tpu.fem.operator import StiffnessOperator, build_operator, default_dtype
from stan_tpu.solvers import cg as cg_mod


def _default_infer_maxiter(nnode: int) -> int:
    """Default CG iteration cap for the INFERENCE forward solves.

    The theoretical exact-termination bound (ndof) is the right default
    for a production solve, but inside an HMC leapfrog the sampler probes
    arbitrary theta — a large negative log_E makes K nearly singular and
    the (chain-synchronized) CG grinds toward the full ndof bound: at 16
    chains x 32^3 that is minutes of device time in one dispatch, which
    trips the TPU runtime watchdog (observed as a device fault). Any
    theta whose solve genuinely needs more than this cap produces a
    garbage displacement whose likelihood is astronomically low, so the
    Metropolis step rejects it either way; capping just bounds the cost
    of visiting it. Calibration-grade solves at sane theta need a few
    hundred iterations at 1e-6..1e-8 tolerances (measured ~250 at 32^3,
    ~1.5k at 70^3 with 1e-8), comfortably under the cap.
    """
    return min(3 * nnode, 4000)


def lame_from_E_nu(E, nu):
    """Lame (lam, mu) from Young's modulus / Poisson ratio
    (Material.SetElastic, Material.cs:31-56)."""
    lam = E * nu / ((1.0 - 2.0 * nu) * (1.0 + nu))
    mu = 0.5 * E / (1.0 + nu)
    return lam, mu


def d_matrix_from_lame(lam, mu):
    """Batched 6x6 isotropic D from scalar/[...]-shaped (lam, mu)."""
    lam, mu = jnp.broadcast_arrays(jnp.asarray(lam), jnp.asarray(mu))
    D = jnp.zeros(lam.shape + (6, 6), dtype=lam.dtype)
    D = D.at[..., :3, :3].add(lam[..., None, None])
    i3 = jnp.arange(3)
    D = D.at[..., i3, i3].add(2.0 * mu[..., None])
    i6 = jnp.arange(3, 6)
    D = D.at[..., i6, i6].add(mu[..., None])
    return D


@dataclasses.dataclass(frozen=True)
class ForwardProblem:
    """Precomputed mesh data for theta -> u solves.

    geometry (conn/dN/detJw/masks) is fixed; D_e varies with theta.
    """

    op0: StiffnessOperator  # operator with placeholder D (geometry carrier)
    f0: jax.Array  # [nnode, 3] unit load vector (masked)
    cg_tol: float
    cg_maxiter: int

    @property
    def dtype(self):
        return self.op0.dtype

    def operator_with(self, D_e: jax.Array) -> StiffnessOperator:
        return dataclasses.replace(self.op0, D=D_e)

    def solve(self, D_e: jax.Array, f: Optional[jax.Array] = None) -> jax.Array:
        """Solve K(D_e) u = f with implicit-differentiation semantics.

        custom_linear_solve makes d(solve)/d(D_e, f) an adjoint solve with
        the same operator (symmetric SPD -> transpose solve == solve).
        """
        op = self.operator_with(D_e)
        rhs = op.free_mask * (self.f0 if f is None else f)
        diag = op.diagonal()

        def matvec(u):
            return op.apply(u)

        def solver(mv, b):
            return cg_mod.pcg(
                mv, b, diag=diag, tol=self.cg_tol,
                maxiter=self.cg_maxiter, ndof=3 * op.nnode,
            ).u

        return jax.lax.custom_linear_solve(
            matvec, rhs, solve=solver, symmetric=True
        )


@dataclasses.dataclass(frozen=True)
class StencilForwardProblem:
    """theta -> u forward model on the Pallas stencil fast path.

    For a structured single-formulation HEX8 grid with a *homogeneous*
    material — exactly the calibration setting, where theta = (E, nu) is one
    global material — the assembled stencil tables are linear in the Lame
    constants: ke = lam*ke_lam + mu*ke_mu (Material.SetElastic,
    src/STAN_Database/Material.cs:31-56), hence

        K(theta)·u = lam * K_lam·u  +  mu * K_mu·u

    with K_lam / K_mu two *fixed-table* stencil sweeps (fem/stencil.py).
    Both tables are baked at build time, so jit traces once for all theta;
    each sweep is a self-adjoint linear primitive (stencil._sweep_p), so HMC
    gradients flow through custom_linear_solve's implicit adjoint with no
    unrolling and chains vmap over it. This replaces
    the general gather/scatter operator (~100x slower at 1M DOF, VERDICT r3
    missing item 3) as the inference forward model on qualifying meshes.
    """

    ft_lam: tuple  # frozen unit-lambda stencil tables (static)
    ft_mu: tuple   # frozen unit-mu stencil tables (static)
    free_mask: jax.Array  # [3, nnx, nny, nnz]
    d_lam: jax.Array  # raw unit-lambda diagonal grid [3, nnx, nny, nnz]
    d_mu: jax.Array   # raw unit-mu diagonal grid
    f0: jax.Array     # [3, nnx, nny, nnz] unit load grid
    node_shape: tuple
    cg_tol: float
    cg_maxiter: int

    @property
    def dtype(self):
        return self.f0.dtype

    def to_flat(self, u_grid: jax.Array) -> jax.Array:
        n = self.node_shape
        return u_grid.transpose(1, 2, 3, 0).reshape(n[0] * n[1] * n[2], 3)

    def matvec_fn(self, lam, mu) -> Callable[[jax.Array], jax.Array]:
        """Masked SPD action u -> M K(theta) (M u) + (I - M) u on the grid.

        K(theta)·u runs as ONE coefficient-parameterized Pallas pass
        (stencil.theta_sweep: a·K_l u + b·K_m u with static tables and SMEM
        coefficients) — the same FMA count as a single fixed-table sweep,
        i.e. half the cost of summing two separate unit sweeps.
        """
        from stan_tpu.fem import stencil

        m = self.free_mask

        def matvec(u):
            mu_u = m * u
            ku = stencil.theta_sweep(lam, mu, mu_u, self.ft_lam, self.ft_mu)
            return m * ku + (1.0 - m) * u

        return matvec

    def diagonal(self, lam, mu) -> jax.Array:
        m = self.free_mask
        return m * (lam * self.d_lam + mu * self.d_mu) + (1.0 - m)

    def solve(self, lam, mu, f: Optional[jax.Array] = None) -> jax.Array:
        """Solve K(lam, mu) u = f on the grid with implicit-diff semantics.

        Same custom_linear_solve structure as ForwardProblem.solve: the
        adjoint solve reuses the (symmetric) operator, and d(matvec)/d(lam,
        mu) is two extra fixed-table sweeps via linear_call jvp/transpose.
        """
        matvec = self.matvec_fn(lam, mu)
        rhs = self.free_mask * (self.f0 if f is None else f)
        diag = self.diagonal(lam, mu)

        def solver(mv, b):
            return cg_mod.pcg(
                mv, b, diag=diag, tol=self.cg_tol,
                maxiter=self.cg_maxiter,
                ndof=int(3 * np.prod(self.node_shape)),
            ).u

        return jax.lax.custom_linear_solve(
            matvec, rhs, solve=solver, symmetric=True
        )


def _stencil_forward_pieces(model: FEModel, dtype=None):
    """Shared geometry derivation for the stencil forward models: the
    structured base operator, unit-coefficient signature tables, raw Jacobi
    diagonal grids and the unit load grid. None if the mesh doesn't
    qualify."""
    from stan_tpu.fem import stencil, structured

    base = structured.build_structured_operator(model, dtype=dtype)
    if base is None or min(base.node_shape) < 3:
        return None
    tables_lam = stencil.signature_tables(np.asarray(base.ke_lam, np.float64))
    tables_mu = stencil.signature_tables(np.asarray(base.ke_mu, np.float64))
    # Raw (unmasked, unit-coefficient) Jacobi diagonals, geometry-only.
    shape = (24, *base.nelems)
    dl = jnp.broadcast_to(
        jnp.diagonal(base.ke_lam)[:, None, None, None], shape)
    dm = jnp.broadcast_to(jnp.diagonal(base.ke_mu)[:, None, None, None], shape)
    d_lam = base.scatter_elements(dl)
    d_mu = base.scatter_elements(dm)
    f0 = base.to_grid(jnp.asarray(model.load_vector(), dtype=base.dtype))
    return base, tables_lam, tables_mu, d_lam, d_mu, f0


def build_stencil_forward(
    model: FEModel,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
) -> Optional[StencilForwardProblem]:
    """Build the stencil fast-path forward model, or None if the mesh does
    not qualify (structured meshgen-ordered HEX8 grid required; the material
    table is *ignored* — theta supplies the material)."""
    from stan_tpu.fem import stencil

    pieces = _stencil_forward_pieces(model, dtype)
    if pieces is None:
        return None
    base, tables_lam, tables_mu, d_lam, d_mu, f0 = pieces
    if cg_maxiter == 0:
        cg_maxiter = _default_infer_maxiter(model.nnode)
    return StencilForwardProblem(
        ft_lam=stencil._freeze_tables(tables_lam),
        ft_mu=stencil._freeze_tables(tables_mu),
        free_mask=base.free_mask,
        d_lam=d_lam,
        d_mu=d_mu,
        f0=f0,
        node_shape=base.node_shape,
        cg_tol=cg_tol,
        cg_maxiter=cg_maxiter,
    )


@dataclasses.dataclass(frozen=True)
class StructuredFieldForwardProblem:
    """theta -> u forward model with PER-ELEMENT (lam, mu) Lame fields on
    the structured MXU path (fem/structured.py).

    The stencil fast path requires a homogeneous material (translation
    invariance); heterogeneous-material calibration previously had only
    the general gather/scatter operator, which OOMs at 64^3 (VERDICT r4
    weak item 6). The structured operator's apply is a slice gather + one
    stacked [48,24]x[24,N] MXU matmul scaled by the per-element
    lam_e/mu_e fields + padded-shifted-read scatter — every op plain jnp,
    so solve() is reverse-differentiable THROUGH the per-element fields
    with custom_linear_solve's implicit adjoint: random-field material
    posteriors (one theta entry per element or per region) ride the MXU.

    solve(lam_e, mu_e): fields are [nx, ny, nz] element grids. The
    displacement_fn contract (global theta = (log_E, logit-nu, log_s))
    broadcasts a homogeneous material, matching the other forward types.
    Reference anchor for per-part materials: Part.Set_MatID
    (src/STAN_Database/Part.cs:767-775).
    """

    op0: "StructuredOperator"  # geometry carrier; lam_e/mu_e replaced
    f0: jax.Array  # [3, nnx, nny, nnz] unit load grid
    cg_tol: float
    cg_maxiter: int

    @property
    def dtype(self):
        return self.op0.dtype

    @property
    def node_shape(self):
        return self.op0.node_shape

    @property
    def nelems(self):
        return self.op0.nelems

    def to_flat(self, u_grid: jax.Array) -> jax.Array:
        return self.op0.to_flat(u_grid)

    def solve(self, lam_e: jax.Array, mu_e: jax.Array,
              f: Optional[jax.Array] = None) -> jax.Array:
        """Solve K(lam_e, mu_e) u = f on the grid, implicit-diff gradients
        w.r.t. the per-element fields and the RHS."""
        import dataclasses as _dc

        from stan_tpu.fem.structured import StructuredOperator  # noqa: F401

        op = _dc.replace(self.op0,
                         lam_e=jnp.asarray(lam_e, self.dtype),
                         mu_e=jnp.asarray(mu_e, self.dtype))
        rhs = op.free_mask * (self.f0 if f is None else f)
        diag = op.diagonal()

        def solver(mv, b):
            return cg_mod.pcg(
                mv, b, diag=diag, tol=self.cg_tol, maxiter=self.cg_maxiter,
                ndof=int(3 * np.prod(self.node_shape)),
            ).u

        return jax.lax.custom_linear_solve(
            op.apply, rhs, solve=solver, symmetric=True)


def build_structured_field_forward(
    model: FEModel,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
) -> Optional[StructuredFieldForwardProblem]:
    """Build the per-element-field forward model, or None if the mesh is
    not a structured meshgen-ordered HEX8 grid."""
    from stan_tpu.fem import structured

    base = structured.build_structured_operator(model, dtype=dtype)
    if base is None:
        return None
    f0 = base.to_grid(jnp.asarray(model.load_vector(), dtype=base.dtype))
    if cg_maxiter == 0:
        cg_maxiter = _default_infer_maxiter(model.nnode)
    return StructuredFieldForwardProblem(
        op0=base, f0=f0, cg_tol=cg_tol, cg_maxiter=cg_maxiter)


@dataclasses.dataclass(frozen=True)
class ShardedStencilForwardProblem:
    """Domain-sharded differentiable theta -> u forward model.

    The chains x domain composition of SURVEY.md §2.5/§5.8 *inside the
    inference layer* (VERDICT r4 missing item 1): the FEM grid is x-slab
    sharded on `domain_axis` of a 2-axis mesh, HMC chains ride
    `chains_axis`, and the whole log-posterior gradient runs under ONE
    shard_map:

      * the matvec is the pure-jnp slab form (fem/stencil.slab_theta_apply)
        behind a ppermute halo exchange — every op transposable, so
        custom_linear_solve's implicit adjoint (an extra sharded CG with
        the same operator) and the (lam, mu, load) cotangents all flow
        through shard_map with no unrolling;
      * per-chain CG solves run with sync_axes=(chains_axis,): a uniform
        launch-wide trip count (converged chains execute masked no-op
        bodies), so the halo/psum schedule can never desynchronize across
        chain rows — the fix proven by parallel/sharded_stencil
        .chain_batched_pcg (MULTICHIP_r03 rendezvous abort);
      * local observation likelihoods and local theta-cotangents are
        explicitly psum'd over the domain axis (the AD inside the shard_map
        body produces per-device contributions; the psum completes the
        global value/gradient).

    The reference's solve being composed is ALGLIB lincg
    (src/STAN_Solver/SolverFunctions.cs:270-330); the reference itself has
    no distributed backend.
    """

    ft_lam: tuple  # frozen unit-lambda signature tables (static)
    ft_mu: tuple
    fc_lam: tuple  # frozen slab correction tables (static)
    fc_mu: tuple
    free_mask: jax.Array  # [3, NNX, NNY, NNZ] global grids
    d_lam: jax.Array
    d_mu: jax.Array
    f0: jax.Array
    node_shape: tuple
    cg_tol: float
    cg_maxiter: int
    mesh: object  # jax.sharding.Mesh (static)
    domain_axis: str = "domain"
    chains_axis: str = "chains"

    @property
    def dtype(self):
        return self.f0.dtype

    @property
    def ndev(self):
        return self.mesh.shape[self.domain_axis]

    def _thawed(self):
        from stan_tpu.fem import stencil

        return (stencil._thaw_tables(self.ft_lam),
                stencil._thaw_tables(self.ft_mu),
                stencil._thaw_corrections(self.fc_lam),
                stencil._thaw_corrections(self.fc_mu))

    def _local_matvec_fn(self, tl, tm, cl, cm, lam, mu, m_local,
                         is_low, is_high):
        """Masked SPD action on the local slab (inside shard_map): halo
        ppermute + slab theta sweep. Non-wrapping perms: the absent source
        on the global edge devices yields zeros — the stencil's ghost
        convention."""
        from stan_tpu.fem import stencil

        ax = self.domain_axis
        n = self.ndev
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]

        def matvec(u):
            um = m_local * u
            from_left = jax.lax.ppermute(um[:, -1:], ax, fwd)
            from_right = jax.lax.ppermute(um[:, :1], ax, bwd)
            u_ext = jnp.concatenate([from_left, um, from_right], axis=1)
            ku = stencil.slab_theta_apply(
                tl, tm, cl, cm, lam, mu, u_ext, is_low, is_high)
            return m_local * ku + (1.0 - m_local) * u

        return matvec

    def make_batched_logp_grad(
        self,
        w_grid: jax.Array,  # [3, NNX, NNY, NNZ] 0/1 observation mask
        y_grid: jax.Array,  # [3, NNX, NNY, NNZ] observed values (0 where w=0)
        sigma_obs: float,
        theta_to_material: Callable,  # theta[D] -> (lam, mu, load_scale)
        prior_logp: Callable,  # theta[D] -> scalar
    ) -> Callable:
        """Build logp_grad_b: [C, D] -> ([C], [C, D]) for hmc.run_chains.

        One shard_map over (chains_axis, domain_axis): chains split across
        chain rows and vmapped locally; each chain's logp/gradient is
        computed with jax.value_and_grad INSIDE the body (local likelihood
        term), then psum'd over the domain axis — each domain device's
        cotangent contribution is exactly its slab's share of the global
        gradient, so the psum completes it. The prior is added once,
        outside the psum.
        """
        from jax.sharding import PartitionSpec as P

        from stan_tpu.solvers import cg as cg_mod

        tl, tm, cl, cm = self._thawed()
        dom, ch = self.domain_axis, self.chains_axis
        tol, maxiter = self.cg_tol, self.cg_maxiter
        ndof = int(3 * np.prod(self.node_shape))
        sig2 = float(sigma_obs) ** 2

        def local_body(theta_l, m_l, dl_l, dm_l, f0_l, w_l, y_l):
            n = jax.lax.axis_size(dom)
            idx = jax.lax.axis_index(dom)
            is_low = (idx == 0).astype(jnp.int32)
            is_high = (idx == n - 1).astype(jnp.int32)

            def local_loglik(theta_i):
                lam, mu, s = theta_to_material(theta_i)
                lam = jnp.asarray(lam, f0_l.dtype)
                mu = jnp.asarray(mu, f0_l.dtype)
                rhs = m_l * (jnp.asarray(s, f0_l.dtype) * f0_l)
                diag = m_l * (lam * dl_l + mu * dm_l) + (1.0 - m_l)
                matvec = self._local_matvec_fn(
                    tl, tm, cl, cm, lam, mu, m_l, is_low, is_high)

                def solver(mv, b):
                    return cg_mod.pcg(
                        mv, b, diag=diag, tol=tol, maxiter=maxiter,
                        ndof=ndof, axis_name=dom, sync_axes=(ch,),
                    ).u

                u = jax.lax.custom_linear_solve(
                    matvec, rhs, solve=solver, symmetric=True)
                resid2 = w_l * (u - y_l) ** 2
                return -0.5 * jnp.sum(resid2) / sig2

            v_loc, g_loc = jax.vmap(
                jax.value_and_grad(local_loglik))(theta_l)
            v = jax.lax.psum(v_loc, dom) + jax.vmap(prior_logp)(theta_l)
            g = (jax.lax.psum(g_loc, dom)
                 + jax.vmap(jax.grad(prior_logp))(theta_l))
            return v, g

        gs = P(None, dom, None, None)
        fn = jax.shard_map(
            local_body, mesh=self.mesh,
            in_specs=(P(ch), gs, gs, gs, gs, gs, gs),
            out_specs=(P(ch), P(ch)),
            check_vma=False,
        )
        leaves = (self.free_mask, self.d_lam, self.d_mu, self.f0,
                  jnp.asarray(w_grid, self.dtype),
                  jnp.asarray(y_grid, self.dtype))

        def logp_grad_b(theta_b):
            return fn(theta_b, *leaves)

        return logp_grad_b

    def solve_batched(self, thetas: jax.Array, theta_to_material: Callable
                      ) -> jax.Array:
        """Per-chain displacement grids u [C, 3, NNX, NNY, NNZ] under the
        same sharded solve path (forward only; used by tests/tools)."""
        from jax.sharding import PartitionSpec as P

        from stan_tpu.solvers import cg as cg_mod

        tl, tm, cl, cm = self._thawed()
        dom, ch = self.domain_axis, self.chains_axis
        tol, maxiter = self.cg_tol, self.cg_maxiter
        ndof = int(3 * np.prod(self.node_shape))

        def local_body(theta_l, m_l, dl_l, dm_l, f0_l):
            n = jax.lax.axis_size(dom)
            idx = jax.lax.axis_index(dom)
            is_low = (idx == 0).astype(jnp.int32)
            is_high = (idx == n - 1).astype(jnp.int32)

            def one(theta_i):
                lam, mu, s = theta_to_material(theta_i)
                lam = jnp.asarray(lam, f0_l.dtype)
                mu = jnp.asarray(mu, f0_l.dtype)
                rhs = m_l * (jnp.asarray(s, f0_l.dtype) * f0_l)
                diag = m_l * (lam * dl_l + mu * dm_l) + (1.0 - m_l)
                matvec = self._local_matvec_fn(
                    tl, tm, cl, cm, lam, mu, m_l, is_low, is_high)
                return cg_mod.pcg(
                    matvec, rhs, diag=diag, tol=tol, maxiter=maxiter,
                    ndof=ndof, axis_name=dom, sync_axes=(ch,)).u

            return jax.vmap(one)(theta_l)

        gs = P(None, dom, None, None)
        fn = jax.shard_map(
            local_body, mesh=self.mesh,
            in_specs=(P(ch), gs, gs, gs, gs),
            out_specs=P(ch, None, dom, None, None),
            check_vma=False,
        )
        return fn(thetas, self.free_mask, self.d_lam, self.d_mu, self.f0)


def build_sharded_stencil_forward(
    model: FEModel,
    mesh,
    *,
    domain_axis: str = "domain",
    chains_axis: str = "chains",
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
) -> Optional[ShardedStencilForwardProblem]:
    """Build the domain-sharded stencil forward model on a 2-axis mesh, or
    None if the mesh/model doesn't qualify (structured HEX8 grid; NNX
    divisible by the domain-axis size — same slab contract as
    parallel/sharded_stencil)."""
    from stan_tpu.fem import stencil

    if domain_axis not in mesh.axis_names or chains_axis not in mesh.axis_names:
        raise ValueError(
            f"mesh needs axes ({chains_axis}, {domain_axis}); "
            f"has {mesh.axis_names}")
    pieces = _stencil_forward_pieces(model, dtype)
    if pieces is None:
        return None
    base, tables_lam, tables_mu, d_lam, d_mu, f0 = pieces
    ndev = mesh.shape[domain_axis]
    if ndev < 1 or base.node_shape[0] % ndev != 0:
        return None
    if cg_maxiter == 0:
        cg_maxiter = _default_infer_maxiter(model.nnode)
    return ShardedStencilForwardProblem(
        ft_lam=stencil._freeze_tables(tables_lam),
        ft_mu=stencil._freeze_tables(tables_mu),
        fc_lam=stencil._freeze_corrections(
            stencil.slab_correction_tables(tables_lam)),
        fc_mu=stencil._freeze_corrections(
            stencil.slab_correction_tables(tables_mu)),
        free_mask=base.free_mask,
        d_lam=d_lam,
        d_mu=d_mu,
        f0=f0,
        node_shape=base.node_shape,
        cg_tol=cg_tol,
        cg_maxiter=cg_maxiter,
        mesh=mesh,
        domain_axis=domain_axis,
        chains_axis=chains_axis,
    )


def build_forward(
    model: FEModel,
    *,
    dtype=None,
    cg_tol: float = 1.0e-8,
    cg_maxiter: int = 0,
    prefer_stencil: bool = True,
):
    """Build the theta -> u forward model, auto-selecting the fastest
    qualifying operator: the Pallas stencil path (StencilForwardProblem) on
    structured HEX8 grids, else the general gather/scatter path
    (ForwardProblem)."""
    if dtype is None:
        dtype = default_dtype()
    # Homogeneity decides the fast path: the stencil forward's contract is
    # "theta supplies ONE global material", which would silently mask a
    # heterogeneous model's fields; such models route to the per-element
    # field problem instead (whose primary API, solve(lam_e, mu_e), keeps
    # the heterogeneity — VERDICT r4 weak item 6).
    used = (set(np.asarray(model.elem_mat).tolist())
            if model.elem_mat is not None else set())
    homog = len({(model.materials[i].E, model.materials[i].poisson)
                 for i in used if i in model.materials}) <= 1
    if prefer_stencil and homog:
        sfwd = build_stencil_forward(
            model, dtype=dtype, cg_tol=cg_tol, cg_maxiter=cg_maxiter)
        if sfwd is not None:
            return sfwd
    if prefer_stencil:
        # Structured grid but heterogeneous material (or other stencil
        # disqualifier): the per-element-field MXU path still beats the
        # general gather operator by ~100x and does not OOM at 64^3.
        ffwd = build_structured_field_forward(
            model, dtype=dtype, cg_tol=cg_tol, cg_maxiter=cg_maxiter)
        if ffwd is not None:
            return ffwd
    op = build_operator(
        model.coords, model.conn, model.elem_d_matrices(),
        model.fix_mask(), model.formulation(), dtype=dtype,
    )
    f0 = jnp.asarray(model.load_vector(), dtype=dtype)
    if cg_maxiter == 0:
        cg_maxiter = _default_infer_maxiter(model.nnode)
    return ForwardProblem(op0=op, f0=f0, cg_tol=cg_tol, cg_maxiter=cg_maxiter)


def displacement_fn(
    fwd, nelem: int
) -> Callable[[jax.Array], jax.Array]:
    """theta = (log_E, nu, log_load_scale) -> u [nnode, 3].

    The calibration parameterization of BASELINE.json ("NUTS/HMC calibration
    of E and nu", "SMC load-uncertainty"): homogeneous material with
    unconstrained log_E, nu, and a log load scale. Dispatches on the
    forward-problem type (stencil fast path vs general operator).
    """
    if isinstance(fwd, StencilForwardProblem):
        def u_of_stencil(theta):
            log_E, nu, log_s = theta[0], theta[1], theta[2]
            lam, mu = lame_from_E_nu(jnp.exp(log_E), nu)
            u_grid = fwd.solve(lam, mu, fwd.f0 * jnp.exp(log_s))
            return fwd.to_flat(u_grid)

        return u_of_stencil
    if isinstance(fwd, StructuredFieldForwardProblem):
        def u_of_field(theta):
            log_E, nu, log_s = theta[0], theta[1], theta[2]
            lam, mu = lame_from_E_nu(jnp.exp(log_E), nu)
            shape = fwd.nelems
            u_grid = fwd.solve(
                jnp.broadcast_to(jnp.asarray(lam, fwd.dtype), shape),
                jnp.broadcast_to(jnp.asarray(mu, fwd.dtype), shape),
                fwd.f0 * jnp.exp(log_s))
            return fwd.to_flat(u_grid)

        return u_of_field
    dtype = fwd.op0.dtype

    def u_of(theta):
        log_E, nu, log_s = theta[0], theta[1], theta[2]
        E = jnp.exp(log_E)
        lam, mu = lame_from_E_nu(E, nu)
        D = d_matrix_from_lame(lam, mu).astype(dtype)
        D_e = jnp.broadcast_to(D, (nelem, 6, 6))
        return fwd.solve(D_e, fwd.f0 * jnp.exp(log_s))

    return u_of


jax.tree_util.register_pytree_node(
    ForwardProblem,
    lambda p: ((p.op0, p.f0), (p.cg_tol, p.cg_maxiter)),
    lambda aux, leaves: ForwardProblem(
        op0=leaves[0], f0=leaves[1], cg_tol=aux[0], cg_maxiter=aux[1]
    ),
)

jax.tree_util.register_pytree_node(
    StructuredFieldForwardProblem,
    lambda p: ((p.op0, p.f0), (p.cg_tol, p.cg_maxiter)),
    lambda aux, leaves: StructuredFieldForwardProblem(
        op0=leaves[0], f0=leaves[1], cg_tol=aux[0], cg_maxiter=aux[1]
    ),
)

jax.tree_util.register_pytree_node(
    StencilForwardProblem,
    lambda p: ((p.free_mask, p.d_lam, p.d_mu, p.f0),
               (p.ft_lam, p.ft_mu, p.node_shape, p.cg_tol, p.cg_maxiter)),
    lambda aux, leaves: StencilForwardProblem(
        ft_lam=aux[0], ft_mu=aux[1],
        free_mask=leaves[0], d_lam=leaves[1], d_mu=leaves[2], f0=leaves[3],
        node_shape=aux[2], cg_tol=aux[3], cg_maxiter=aux[4],
    ),
)
