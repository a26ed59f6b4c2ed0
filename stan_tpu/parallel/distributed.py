"""Multi-host runtime initialization + the (chains x domain) device mesh.

SURVEY.md §5.8: the reference is a single Windows process with no transport
beyond the STdb file hand-off (MainWindow.xaml.cs:490-496); the rebuild's
NCCL-equivalent is JAX collectives over a 2-axis device mesh. This module is
the one place that knows how to stand that mesh up:

  * single host: all local devices (real TPU chips, or a virtual CPU mesh
    under XLA_FLAGS=--xla_force_host_platform_device_count=N);
  * multi host: ``initialize()`` wraps jax.distributed.initialize so N
    processes join one runtime over DCN, then the same mesh helper runs on
    the *global* device list.

Axis layout convention (why chains is the outer/slow axis): chain/particle
parallelism is embarrassingly parallel — its only collectives are the rare
cross-chain diagnostics and SMC resampling — so it is laid out across hosts
(DCN); the domain axis carries the per-iteration halo exchange and CG
reductions and must ride ICI, so it is the inner axis mapping to chips
within a host/pod slice. That is the placement jax mesh-major ordering gives
when chains is axis 0 over a device list ordered host-major.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join (or start) the multi-host JAX runtime.

    No-ops on single-process runs so callers can invoke it unconditionally.
    Arguments default to the standard JAX_* / cloud-TPU environment
    discovery that jax.distributed.initialize performs itself.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("STAN_TPU_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def device_mesh(n_chains: int = 1, n_domain: Optional[int] = None,
                devices: Optional[Sequence] = None):
    """Build the (chains, domain) Mesh over the global device list.

    ``n_domain=None`` uses every remaining device. Raises if the requested
    extents don't divide the device count (refuse, don't silently shrink).
    """
    import jax
    from jax.sharding import Mesh

    devs = list(devices if devices is not None else jax.devices())
    if n_domain is None:
        if len(devs) % n_chains:
            raise ValueError(
                f"{len(devs)} devices not divisible by chains={n_chains}")
        n_domain = len(devs) // n_chains
    need = n_chains * n_domain
    if need > len(devs):
        raise ValueError(
            f"mesh {n_chains}x{n_domain} needs {need} devices, "
            f"have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_chains, n_domain)
    return Mesh(grid, axis_names=("chains", "domain"))


def describe(mesh) -> str:
    """One-line human summary for logs."""
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    kinds = {d.platform for d in mesh.devices.flat}
    return (f"mesh chains={shape.get('chains')} x domain={shape.get('domain')}"
            f" on {mesh.devices.size} {'/'.join(sorted(kinds))} device(s)")
