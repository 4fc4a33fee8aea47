"""Device mesh + sharding rules: the framework's entire communication backend.

The reference is single-process single-device with no comm layer (SURVEY.md section 2
"Parallelism"/"Distributed communication backend": ABSENT). TPU-native, the mesh IS
the backend: we lay out a ("data", "ctx") mesh, annotate shardings, and XLA emits the
collectives (psum for DP gradient reduction, all_gathers/ppermutes for CP) over ICI.
No user-level NCCL/MPI analogue exists anywhere in this codebase by design.

Axes:
- "data": data parallelism over the batch dimension. The FVTA model is ~1-5M params —
  it fits in one core's HBM thousands of times over, so DP is the only strategy chip
  scale needs (TP/PP/EP are deliberately out of scope; SURVEY.md section 2).
- "ctx": context parallelism over the context *time* axis for long-sequence configs
  (TGIF-QA-style frame sequences, BASELINE.json config 4) — see parallel/cp.py.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; jax.devices()
then spans hosts and the same mesh/shardings drive DCN+ICI collectives unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fvta_memexqa_tpu.config import MeshConfig


def maybe_initialize_distributed() -> bool:
    """Multi-host entry (SURVEY.md section 5 "Distributed communication backend"):
    when launched under a multi-host coordinator (JAX_COORDINATOR_ADDRESS et al. in
    the environment), initialize the DCN layer so jax.devices() spans all hosts and
    the same mesh/shardings drive ICI+DCN collectives unchanged. No-op otherwise.
    Returns True if distributed mode was initialized."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    if not addr:
        return False
    if os.environ.get("JAX_NUM_PROCESSES") and os.environ.get("JAX_PROCESS_ID"):
        # explicit topology (e.g. a hand-launched coordinator+worker pair, the
        # real-2-process test): initialize() cannot infer these outside a
        # managed cluster (SLURM/GKE), so pass them through
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()  # managed-cluster autodetection
    return True


def make_mesh(cfg: MeshConfig, devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = cfg.data_parallel * cfg.context_parallel
    if len(devices) < need:
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(cfg.data_parallel, cfg.context_parallel)
    return Mesh(dev, axis_names=("data", "ctx"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh):
    """Every Batch leaf is sharded along its leading (example) dim over "data"."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, example-sharded over the "data" axis."""
    s = batch_shardings(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
