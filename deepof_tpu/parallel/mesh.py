"""SPMD scaling over a JAX device mesh.

TPU-native replacement for the reference's torch DDP/NCCL stack
(deepof/clustering/model_utils_new.py:196-262 ddp_init_if_needed + Slurm
env mapping; deepof/clustering/training.py:1087-1129 DDP wrapping): instead
of wrapping modules and all-reducing gradients over NCCL, the train step is
jitted over a ``Mesh`` with the batch sharded along the ``data`` axis and
parameters replicated — XLA inserts the psum collectives over ICI.

The models here are small (1e5-1e6 params) and windows are short, so pure
data parallelism saturates the hardware; tensor/pipeline axes are not
needed (SURVEY.md §2.3). Multi-host runs initialize via
``jax.distributed.initialize`` with the same Slurm variable mapping the
reference used for torchrun.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def distributed_init_if_needed() -> None:
    """Initialize multi-host JAX if launched under Slurm/distributed env.

    Mirrors the reference's Slurm -> rendezvous env mapping
    (model_utils_new.py:196-226) but drives jax.distributed instead of NCCL.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return
    n_procs = os.environ.get("SLURM_NTASKS") or os.environ.get("JAX_NUM_PROCESSES")
    proc_id = os.environ.get("SLURM_PROCID") or os.environ.get("JAX_PROCESS_ID")
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if n_procs and int(n_procs) > 1 and proc_id is not None:
        if coord is None:
            node_list = os.environ.get("SLURM_JOB_NODELIST", "localhost")
            coord = f"{node_list.split(',')[0].split('[')[0]}:12355"
        jax.distributed.initialize(  # pragma: no cover - multi-host only
            coordinator_address=coord,
            num_processes=int(n_procs),
            process_id=int(proc_id),
        )
    _DISTRIBUTED_INITIALIZED = True


def is_main_process() -> bool:
    """Host-0 gating for checkpointing/logging (DDP is_main equivalent)."""
    return jax.process_index() == 0


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dimension sharding (leading axis split across the mesh)."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (for parameters and optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data", pad_policy: str = "repeat"):
    """Place a pytree of host arrays on the mesh, batch-sharded.

    Arrays whose leading dim is not divisible by the mesh size are handled
    per ``pad_policy``:

    - ``"repeat"`` (default): pad by repeating the final rows. Train-step
      gradients weight the repeated samples slightly more on the (rare)
      ragged final batch of an epoch; with shuffling this is noise, and
      epoch metrics are corrected by the true-size weighting in
      ``_epoch_mean``. Use :func:`ragged_eval` where exact metrics matter.
    - ``"drop"``: trim the trailing remainder rows (drop-last semantics).
      Required for losses whose STRUCTURE padding corrupts — e.g.
      contrastive objectives, where a duplicated row is a false hard
      negative of its twin in the similarity matrix.
    """
    n = mesh.devices.size
    sharding = data_sharding(mesh, axis_name)

    def place(arr):
        arr = np.asarray(arr)
        b = arr.shape[0]
        if b % n:
            if pad_policy == "drop":
                arr = arr[: (b // n) * n]
            else:
                pad = n - (b % n)
                arr = np.concatenate([arr, arr[-1:].repeat(pad, axis=0)], axis=0)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(place, batch)


def ragged_eval(run, batch, mesh: Mesh, axis_name: str = "data"):
    """Exact sharded evaluation of a possibly-ragged batch.

    Splits the leading axis into a mesh-divisible head (evaluated sharded)
    and the remainder tail (evaluated unsharded on the default device), then
    combines the two log dicts weighted by their true sample counts — so
    per-sample-mean metrics come out exactly as if computed over the raw
    batch, with no padding bias. ``run`` maps the placed batch tuple to a
    dict of scalar per-sample means. The tail shape is constant across an
    epoch, so it costs at most one extra compile.

    ``None`` entries in ``batch`` pass through untouched (optional streams).
    """
    n = mesh.devices.size
    sizes = [np.asarray(a).shape[0] for a in batch if a is not None]
    b = sizes[0] if sizes else 0
    head = (b // n) * n
    if head == b or head == 0:
        return run(shard_batch(batch, mesh, axis_name))
    split = lambda lo, hi: tuple(
        None if a is None else np.asarray(a)[lo:hi] for a in batch
    )
    logs_head = run(shard_batch(split(0, head), mesh, axis_name))
    logs_tail = run(split(head, b))
    r = b - head
    return {
        k: (head * logs_head[k] + r * logs_tail[k]) / b for k in logs_head
    }
