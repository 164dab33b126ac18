"""Multi-host orchestration (DCN + ICI mesh layout).

The reference is single-process (SURVEY.md section 2.8); scaling beyond
one host is new surface this framework defines.  Layout policy, following
the standard JAX multi-host recipe:

  * one process per host, ``jax.distributed.initialize`` from the
    environment (coordinator address, process id/count);
  * a 2-D mesh ``(hosts, chips)``: the *data* axis (reads) maps to hosts
    so each host's input pipeline feeds only its own shard over DCN once,
    and the *band* axis (LSH hash positions) maps to the intra-host chips
    so the vote's all_gather/psum_scatter collectives ride ICI;
  * per-host sharded sketch stores (io/datstore.write_npz one shard per
    host) make checkpoint/resume embarrassingly parallel.

On a single host this degrades to the 1-D mesh used by
parallel/sharded.py.  Host failure = rerun that host's shard: the
pipeline is stateless between phases (SURVEY.md section 5 failure
handling).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_from_env() -> bool:
    """Initialize jax.distributed when launched as one process per host
    (JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID env).  Returns
    True if distributed mode is active."""
    coord = os.environ.get("JAX_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    return True


def make_host_chip_mesh(axis_hosts: str = "data",
                        axis_chips: str = "band") -> Mesh:
    """(hosts, chips) mesh: data-parallel over DCN, band-parallel over ICI.

    With one process the host axis has size 1 and the mesh is equivalent
    to the single-host band mesh.
    """
    devices = np.asarray(jax.devices())
    n_local = jax.local_device_count()
    n_hosts = len(devices) // n_local
    grid = devices.reshape(n_hosts, n_local)
    return Mesh(grid, (axis_hosts, axis_chips))


def host_read_shard(n_reads: int, process_id: int | None = None,
                    n_processes: int | None = None) -> slice:
    """Contiguous read-id range owned by this host (balanced remainder)."""
    pid = jax.process_index() if process_id is None else process_id
    np_ = jax.process_count() if n_processes is None else n_processes
    per = n_reads // np_
    extra = n_reads % np_
    start = pid * per + min(pid, extra)
    return slice(start, start + per + (1 if pid < extra else 0))
