"""Multi-host (multi-process) execution support.

The reference has no distributed backend at all (SURVEY.md section 2.3: one
hard-coded CUDA device, main_sampling.py:1030). This module provides the
TPU-native multi-host runtime the survey's north star requires: JAX
process-group initialization over the cluster coordination service, a
global device mesh whose 'chain' axis spans ICI within a slice and DCN
across slices, per-host work sharding, and process-0 metric/artifact
aggregation.

Usage (each host/process):

    from nshmc_tpu.parallel import multihost as mh
    mh.maybe_initialize()              # env-gated jax.distributed init
    mesh = mh.global_chain_mesh()      # 1-D mesh over ALL global devices
    files = mh.shard_files(files)      # this process's slice of the dataset
    ...run...
    rows = mh.gather_records(local_rows)   # process-0 gets everything
    if mh.is_primary():
        write(rows)

Environment contract (mirrors standard JAX cluster envs):
    NSHMC_DIST=1                enable distributed init
    NSHMC_COORDINATOR=host:port coordination service address
    NSHMC_NUM_PROCESSES=N       total process count
    NSHMC_PROCESS_ID=i          this process's id
On TPU pods the four values can all be omitted (NSHMC_DIST=1 alone):
jax.distributed.initialize() autodetects from the TPU metadata server.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

_initialized = False


def maybe_initialize(force: bool = False) -> bool:
    """Initialize the JAX process group if NSHMC_DIST=1 (or force=True).

    Returns True when running multi-process (after init), False for the
    ordinary single-process path. Idempotent.
    """
    global _initialized
    import jax

    if _initialized:
        return True
    if not force and os.environ.get("NSHMC_DIST", "") != "1":
        return False

    kwargs = {}
    coord = os.environ.get("NSHMC_COORDINATOR", "")
    if coord:
        kwargs["coordinator_address"] = coord
        kwargs["num_processes"] = int(os.environ["NSHMC_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["NSHMC_PROCESS_ID"])
    # else: TPU-pod autodetection via the metadata server
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    return process_index() == 0


def global_chain_mesh(n_devices: Optional[int] = None):
    """1-D ('chain',) mesh over ALL global devices (every process must
    build the identical mesh). Contrast parallel.chains.chain_mesh, which
    uses only process-local devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()  # global, ordered identically on every process
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("chain",))


def shard_files(files: Sequence[str]) -> List[str]:
    """This process's strided slice of the dataset (per-host data
    sharding): process i handles files[i::P]. Single-process: identity."""
    if process_count() == 1:
        return list(files)
    return list(files)[process_index()::process_count()]


def make_global_chain_states(mesh, states):
    """Lift process-local chain states (leading axis = this host's chains)
    into a global jax.Array sharded over the mesh's 'chain' axis.

    Each process passes its LOCAL chains; the global leading axis is
    local_chains * process_count. Single-process: returns states unchanged
    (device_put handles local meshes)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def lift(leaf):
        leaf = np.asarray(leaf)
        sharding = NamedSharding(mesh, P("chain"))
        global_shape = (leaf.shape[0] * process_count(),) + leaf.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, leaf, global_shape=global_shape)

    return jax.tree.map(lift, states)


def fetch_local_shards(tree):
    """Pull this process's addressable shards of a globally-sharded pytree
    back to host memory (leading axis = this host's chains)."""
    import jax

    def pull(leaf):
        if not isinstance(leaf, jax.Array):
            return np.asarray(leaf)
        shards = [s for s in leaf.addressable_shards]
        shards.sort(key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree.map(pull, tree)


def gather_records(records: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """All-gather small JSON-serializable per-host records (metric rows).
    Every process receives the full concatenated list ordered by process
    id; callers typically write it out only on the primary."""
    if process_count() == 1:
        return list(records)
    from jax.experimental import multihost_utils

    payload = json.dumps(records).encode()
    n = np.zeros((), np.int32) + len(payload)
    sizes = multihost_utils.process_allgather(n)
    maxlen = int(sizes.max())
    buf = np.zeros((maxlen,), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out: List[Dict[str, Any]] = []
    for row, size in zip(np.asarray(gathered).reshape(-1, maxlen), sizes.ravel()):
        out.extend(json.loads(bytes(row[: int(size)]).decode()))
    return out


def sync(name: str = "nshmc") -> None:
    """Barrier across processes (no-op single-process)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
