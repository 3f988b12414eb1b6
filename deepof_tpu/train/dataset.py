"""Window dataset + host input pipeline feeding the device mesh.

Behavioral spec: deepof/clustering/dataset.py — HDF5 spill with a
build-complete flag and keys-hash staleness check (:61-290), block-shuffled
sequential reads, per-video ranges, moving-block bootstrap sampling (:505),
and loader-level sharding (:417+). Host-side numpy feeding jitted steps;
multi-host sharding takes every process's slice of the block order.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Iterator, Optional, Tuple

import h5py
import numpy as np

from deepof_tpu.core.storage import get_dt


def _keys_hash(preprocessed: Dict, extra: str = "") -> str:
    parts = [extra]
    for key in sorted(preprocessed.keys()):
        obj = get_dt(preprocessed, key, only_metainfo=True)
        parts.append(f"{key}:{obj.get('shape')}")
    return hashlib.sha1("|".join(map(str, parts)).encode()).hexdigest()


class WindowDataset:
    """Windowed (x, a, ang) tensors with per-video ranges.

    Holds data in RAM for normal projects and in chunked HDF5 for very
    large ones; either way batches are produced as numpy arrays.
    """

    def __init__(
        self,
        preprocessed: Dict,
        dataset_folder: Optional[str] = None,
        dataset_name: str = "train",
        force_rebuild: bool = False,
        spill_to_disk: bool = False,
        h5_chunk_len: int = 4096,
        supervised_dict: Optional[Dict] = None,
    ):
        self.keys = list(preprocessed.keys())
        self.video_ranges: Dict[str, Tuple[int, int]] = {}
        self._h5_path = None

        if spill_to_disk and dataset_folder is not None:
            os.makedirs(dataset_folder, exist_ok=True)
            self._h5_path = os.path.join(dataset_folder, f"{dataset_name}_windows.h5")
            self._build_h5(preprocessed, force_rebuild, h5_chunk_len)
        else:
            xs, as_, angs = [], [], []
            offset = 0
            for key in self.keys:
                nodes, edges, angles = get_dt(preprocessed, key)
                n = nodes.shape[0]
                self.video_ranges[key] = (offset, offset + n)
                offset += n
                xs.append(np.asarray(nodes, np.float32))
                as_.append(np.asarray(edges, np.float32))
                angs.append(np.asarray(angles, np.float32))
            self.x = np.concatenate(xs, axis=0) if xs else np.zeros((0, 1, 1), np.float32)
            self.a = np.concatenate(as_, axis=0) if as_ else np.zeros((0, 1, 1), np.float32)
            self.angles = (
                np.concatenate(angs, axis=0) if angs else np.zeros((0, 1, 0), np.float32)
            )

        self.labels = None
        if supervised_dict is not None:
            labels = []
            for key in self.keys:
                labels.append(np.asarray(get_dt(supervised_dict, key), np.float32))
            self.labels = np.concatenate(labels, axis=0)

    # ------------------------------------------------------------------ #

    def _build_h5(self, preprocessed, force_rebuild, chunk_len):
        """Chunked HDF5 spill with build-complete + staleness detection
        (dataset.py:61-290)."""
        want_hash = _keys_hash(preprocessed)
        if os.path.exists(self._h5_path) and not force_rebuild:
            try:
                with h5py.File(self._h5_path, "r") as f:
                    if (
                        f.attrs.get("build_complete", False)
                        and f.attrs.get("keys_hash", "") == want_hash
                    ):
                        self.video_ranges = json.loads(f.attrs["video_ranges"])
                        self.video_ranges = {
                            k: tuple(v) for k, v in self.video_ranges.items()
                        }
                        return
            except OSError:
                pass

        with h5py.File(self._h5_path, "w") as f:
            f.attrs["build_complete"] = False
            f.attrs["keys_hash"] = want_hash
            offset = 0
            x_ds = a_ds = ang_ds = None
            for key in self.keys:
                nodes, edges, angles = get_dt(preprocessed, key)
                nodes = np.asarray(nodes, np.float32)
                edges = np.asarray(edges, np.float32)
                angles = np.asarray(angles, np.float32)
                n = nodes.shape[0]
                if x_ds is None:
                    def make(name, arr):
                        tail = arr.shape[1:]
                        # h5py rejects zero-size chunks (e.g. no angles).
                        chunks = (
                            (min(chunk_len, max(n, 1)),) + tail
                            if all(d > 0 for d in tail)
                            else None
                        )
                        return f.create_dataset(
                            name, shape=(0,) + tail, maxshape=(None,) + tail,
                            chunks=chunks, dtype=np.float32,
                        )

                    x_ds = make("x", nodes)
                    a_ds = make("a", edges)
                    ang_ds = make("ang", angles)
                for ds, arr in ((x_ds, nodes), (a_ds, edges), (ang_ds, angles)):
                    ds.resize(offset + n, axis=0)
                    ds[offset : offset + n] = arr
                self.video_ranges[key] = (offset, offset + n)
                offset += n
            f.attrs["video_ranges"] = json.dumps(
                {k: list(v) for k, v in self.video_ranges.items()}
            )
            f.attrs["build_complete"] = True

    # ------------------------------------------------------------------ #

    def __len__(self) -> int:
        if self._h5_path is not None:
            with h5py.File(self._h5_path, "r") as f:
                return f["x"].shape[0]
        return self.x.shape[0]

    def _read(self, idx: np.ndarray):
        if self._h5_path is not None:
            order = np.argsort(idx)
            with h5py.File(self._h5_path, "r") as f:
                xs = f["x"][idx[order]]
                as_ = f["a"][idx[order]]
                ang_ds = f["ang"]
                angs = (
                    ang_ds[idx[order]]
                    if all(d > 0 for d in ang_ds.shape[1:])
                    else np.zeros((len(idx),) + ang_ds.shape[1:], np.float32)
                )
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            return xs[inv], as_[inv], angs[inv]
        return self.x[idx], self.a[idx], self.angles[idx]

    @property
    def angles(self) -> np.ndarray:
        """Full angles tensor (teacher PCA views read it densely)."""
        if self._h5_path is not None:
            with h5py.File(self._h5_path, "r") as f:
                return np.asarray(f["ang"], np.float32)
        return self._angles

    @angles.setter
    def angles(self, value):
        self._angles = value

    def batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        block_size: int = 256,
        bootstrap: bool = False,
        shard_id: int = 0,
        n_shards: int = 1,
        drop_last: bool = False,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (x, a, angles, idx) batches.

        Block shuffling keeps HDF5 reads sequential within blocks
        (dataset.py:417-620); bootstrap resamples moving blocks with
        replacement (dataset.py:505); shards take strided block subsets.
        """
        n = len(self)
        if n == 0:
            return
        rng = rng or np.random.default_rng(0)

        n_blocks = (n + block_size - 1) // block_size
        if bootstrap:
            block_ids = rng.integers(0, n_blocks, size=n_blocks)
        else:
            block_ids = np.arange(n_blocks)
            if shuffle:
                rng.shuffle(block_ids)
        block_ids = block_ids[shard_id::n_shards]

        indices = np.concatenate(
            [
                np.arange(b * block_size, min((b + 1) * block_size, n))
                for b in block_ids
            ]
        ) if len(block_ids) else np.zeros(0, np.int64)
        if shuffle:
            rng.shuffle(indices)

        for start in range(0, len(indices), batch_size):
            batch_idx = indices[start : start + batch_size]
            if drop_last and len(batch_idx) < batch_size:
                break
            x, a, ang = self._read(batch_idx)
            yield x, a, ang, batch_idx

    def n_batches(self, batch_size: int, n_shards: int = 1) -> int:
        per_shard = (len(self) + n_shards - 1) // n_shards
        return (per_shard + batch_size - 1) // batch_size


class PrefetchIterator:
    """Background-thread prefetch over a batch iterator (the reference's
    DataLoader workers + prefetch_factor, trainers dataset.py:335; on TPU
    the host pipeline overlaps HDF5 reads with device compute)."""

    def __init__(self, iterator, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(1, depth))
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterator, depth: int = 2):
    """Wrap `iterator` so the next `depth` batches load on a host thread."""
    return PrefetchIterator(iterator, depth)
