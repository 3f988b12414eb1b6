"""Orbax-backed training checkpoints with resume support.

Behavioral spec: the reference's per-epoch Lightning/torch checkpointing
(deepof/clustering/trainers.py:1196-1248 — ``save_checkpoints`` writes
epoch snapshots; training can resume from the latest one). Here the full
train state (params, optimizer state, mutable collections, epoch) is a
JAX pytree saved asynchronously through ``orbax.checkpoint``, which is
multi-host aware: on a pod slice every process participates in the save
and sharded arrays are written once.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


class TrainCheckpointer:
    """Epoch-granular checkpoint manager around orbax CheckpointManager.

    Saves the complete optimization state — not just weights — so an
    interrupted run resumes bit-exact modulo data order. Structure-aware
    restore requires a template pytree with the same treedef (optax states
    are namedtuples; orbax rebuilds them from the template).
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        save_interval_epochs: int = 1,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_interval_epochs = max(1, int(save_interval_epochs))
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    # ------------------------------------------------------------------ #

    def save(self, epoch: int, state: Dict[str, Any], force: bool = False) -> bool:
        """Save `state` under step `epoch`. Returns True when a save ran."""
        if not force and (epoch + 1) % self.save_interval_epochs != 0:
            return False
        self._mgr.save(epoch, args=self._ocp.args.StandardSave(state))
        return True

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template: Dict[str, Any], epoch: Optional[int] = None
    ) -> Dict[str, Any]:
        """Restore the state saved at `epoch` (default: latest).

        `template` must have the target treedef; its leaf values are only
        used for shape/dtype/sharding metadata.
        """
        step = self.latest_epoch() if epoch is None else epoch
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        return self._mgr.restore(step, args=self._ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_epoch_checkpoint_hook(
    checkpointer: Optional[TrainCheckpointer],
    get_state,
):
    """Build an on_epoch_end hook saving the fit closure's live state.

    `get_state` is a zero-arg callable returning the current state pytree
    (fit loops keep it in a closure dict, so the hook reads it lazily).
    Returns None when no checkpointer is configured.
    """
    if checkpointer is None:
        return None

    def hook(epoch, train_logs, val_logs):
        state = dict(get_state())
        state["epoch"] = epoch
        checkpointer.save(epoch, jax.device_get(state))

    return hook


def maybe_resume(
    checkpointer: Optional[TrainCheckpointer],
    template: Dict[str, Any],
) -> tuple:
    """(start_epoch, state_or_None) from the latest checkpoint, if any."""
    if checkpointer is None or checkpointer.latest_epoch() is None:
        return 0, None
    tmpl = dict(template)
    tmpl["epoch"] = 0
    restored = checkpointer.restore(tmpl)
    start_epoch = int(restored.pop("epoch")) + 1
    # Orbax commits restored arrays to one device; hand back host arrays so
    # jitted steps re-place them against the sharded batch like fresh params.
    return start_epoch, jax.device_get(restored)
