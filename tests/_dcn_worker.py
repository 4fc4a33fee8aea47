"""Worker for the real 2-process jax.distributed test (test_parallel.py).

Launched twice by TestRealTwoProcessDCN with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment. Exercises the REAL
multi-host entry path (parallel.mesh.maybe_initialize_distributed →
jax.distributed.initialize), then proves the processes form one system:

1. global topology: process_count == 2, device_count == 2 * local_device_count
2. a cross-process collective: a global array sharded over both processes'
   devices is summed under jit — XLA must move data across the process
   boundary (the DCN analogue on CPU) to produce the replicated total
3. the framework's own mesh helpers build a global mesh spanning processes

Prints one JSON line on success; any assertion kills the worker → nonzero
exit observed by the parent test.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores JAX_PLATFORMS

import numpy as np  # noqa: E402

from fvta_memexqa_tpu.config import MeshConfig  # noqa: E402
from fvta_memexqa_tpu.parallel.mesh import (make_mesh,  # noqa: E402
                                            maybe_initialize_distributed)

assert maybe_initialize_distributed() is True, "env-gated init did not trigger"
assert jax.process_count() == 2, jax.process_count()
n_local = jax.local_device_count()
n = jax.device_count()
assert n == 2 * n_local, (n, n_local)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

mesh = make_mesh(MeshConfig(data_parallel=n))
sharding = NamedSharding(mesh, P("data"))
data = np.arange(n, dtype=np.float32)
x = jax.make_array_from_callback(
    (n,), sharding, lambda idx: data[idx])

total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(x)
# fetching the replicated scalar requires the cross-process reduction to have
# actually run on every process
got = float(total)
want = float(n * (n - 1) / 2)
assert got == want, (got, want)

print(json.dumps({"process_id": int(os.environ["JAX_PROCESS_ID"]),
                  "devices": n, "local_devices": n_local, "sum": got}))
sys.stdout.flush()
jax.distributed.shutdown()
