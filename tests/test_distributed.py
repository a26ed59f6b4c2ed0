"""Real multi-process jax.distributed exercise (SURVEY.md §5.8).

Rounds 1-4 could only no-op-test distributed.initialize in a single
process; this spawns TWO actual processes (4 virtual CPU devices each)
that join one JAX runtime over the coordination service and then run

  * a global jit reduction over a (2 x 4) chains x domain mesh whose rows
    live on different processes,
  * a cross-process shard_map psum,
  * the REAL chains x domain solver path: chain_batched_pcg
    (parallel/sharded_stencil) with the domain axis split across both
    processes — halo ppermutes and sync_axes CG reductions crossing the
    process boundary.

This is the same code path a TPU pod would run over DCN+ICI; only the
transport differs (Gloo here).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pid = int(sys.argv[1]); port = sys.argv[2]

    from stan_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert jax.device_count() == 8

    import numpy as np, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = distributed.device_mesh(n_chains=2)  # 2 x 4 over both processes
    assert {d.process_index for d in mesh.devices.flat} == {0, 1}

    # 1) global jit reduction across processes
    sharding = NamedSharding(mesh, P("chains", "domain"))
    arr = np.arange(8, dtype=np.float64).reshape(2, 4)
    garr = jax.make_array_from_callback((2, 4), sharding, lambda i: arr[i])
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    val = float(np.asarray(out.addressable_shards[0].data))
    assert val == 28.0, val

    # 2) cross-process shard_map psum
    f = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(x, ("chains", "domain")),
        mesh=mesh, in_specs=P("chains", "domain"), out_specs=P()))
    r = f(garr)
    assert float(np.asarray(r.addressable_shards[0].data).ravel()[0]) == 28.0

    # 3) chains x domain stencil PCG with the domain axis crossing the
    #    process boundary (devices 0-3 on process 0, 4-7 on process 1:
    #    chain row 1's slabs all live on process 1, and the sync_axes
    #    psum over chains crosses processes every CG iteration).
    from stan_tpu.core import meshgen
    from stan_tpu.fem import stencil
    from stan_tpu.parallel import sharded_stencil as ss
    model = meshgen.hex_beam(7, 2, 2)  # NNX = 8 = 2 slabs / domain device
    sop = stencil.build_stencil_operator(model)
    op = ss.build_sharded_stencil_operator(model, 4)
    f0 = sop.to_grid(jnp.asarray(model.load_vector(), dtype=sop.dtype))
    rough = jax.random.normal(jax.random.PRNGKey(0), f0.shape, f0.dtype)
    f_chains = jnp.stack([f0, f0 + 0.5 * rough])
    res = ss.chain_batched_pcg(mesh, op, f_chains,
                               scales=jnp.ones((2,), f0.dtype),
                               tol=1e-8, maxiter=200)
    iters = np.asarray(
        [np.asarray(s.data).ravel() for s in res.iters.addressable_shards]
    ).ravel()
    conv = np.asarray(
        [np.asarray(s.data).ravel() for s in res.converged.addressable_shards]
    ).ravel()
    assert conv.all(), (pid, iters, conv)
    for s in res.u.addressable_shards:
        assert np.isfinite(np.asarray(s.data)).all()
    print(f"worker {pid} OK: sum {val}, pcg iters(local) {iters}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"worker {i} OK" in out
