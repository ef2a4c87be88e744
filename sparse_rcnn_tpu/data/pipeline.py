"""Host input pipeline: worker threads + prefetch + async device transfer.

Realizes "host-side voxelization overlap" (BASELINE config 5) at the
framework level: scene loading + augmentation (+ optionally the C++ host
voxelizer) run in background threads while the device computes; batches are
moved with non-blocking ``jax.device_put`` into a double-buffered queue so
the next batch is already on device when the step function wants it.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ..config import Config
from .augment import augment_scene
from .datasets import build_dataset


def _collate(scenes) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}


def host_voxelize_scene(scene: Dict[str, np.ndarray], cfg: Config) -> Dict[str, np.ndarray]:
    """Attach C++-voxelized tables to a scene dict (keys the device path
    recognizes and then skips its own voxelization for)."""
    from .. import native

    coords, feats, nv, p2v, ovf = native.voxelize_scene(
        scene["points"], scene["feats"], scene["valid"].astype(np.uint8),
        np.asarray(cfg.data.voxel_size, np.float32), cfg.data.voxel_capacity,
    )
    out = dict(scene)
    out["voxel_coords"] = coords
    out["voxel_feats"] = feats
    out["voxel_nvalid"] = np.int32(nv)
    out["p2v"] = p2v
    out["voxel_overflow"] = np.int32(ovf)
    return out


class Loader:
    """Infinite (train) or single-pass (eval) batch iterator."""

    def __init__(self, cfg: Config, split: str = "train",
                 train: bool = True, seed: int = 0,
                 sharding: Optional[jax.sharding.Sharding] = None):
        self.cfg = cfg
        self.split = split
        self.train = train
        self.dataset = build_dataset(cfg, split)
        self.seed = seed
        self.sharding = sharding
        # Training streams are order-free, so cfg.data.num_workers threads
        # produce batches concurrently (augment + optional C++ voxelize are
        # the host-side cost to hide — BASELINE config 5). Eval is a single
        # ordered pass → one worker.
        self._num_workers = max(1, cfg.data.num_workers) if train else 1
        self._q: queue.Queue = queue.Queue(
            maxsize=max(self._num_workers, cfg.data.prefetch)
        )
        self._stop = threading.Event()
        # starvation accounting (BASELINE config 5 "host-side voxelization
        # overlap" must be MEASURED, not assumed): wall time the consumer
        # spent blocked waiting for a batch, and batches delivered. A
        # well-overlapped pipeline keeps wait_s ≈ 0 past the first batch.
        self.wait_s = 0.0
        self.batches_out = 0
        self._threads = [
            threading.Thread(target=self._worker, args=(w,), daemon=True)
            for w in range(self._num_workers)
        ]
        for t in self._threads:
            t.start()

    def _scene(self, idx: int, rng: np.random.Generator):
        scene = self.dataset[idx % len(self.dataset)]
        if self.train and self.cfg.data.augment:
            scene = augment_scene(scene, self.cfg.data, rng)
        if self.cfg.data.host_voxelize:
            from .. import native

            if native.available():
                scene = host_voxelize_scene(scene, self.cfg)
        return scene

    def _worker(self, wid: int):
        rng = np.random.default_rng((self.seed, wid))
        b = self.cfg.data.batch_size
        if self.train:
            while not self._stop.is_set():
                idxs = rng.integers(0, len(self.dataset), b)
                self._put(_collate([self._scene(int(i), rng) for i in idxs]))
        else:
            n = len(self.dataset)
            for start in range(0, n, b):
                if self._stop.is_set():
                    return
                idxs = [(start + j) % n for j in range(b)]  # wrap-pad last batch
                self._put(_collate([self._scene(i, rng) for i in idxs]))
            self._put(None)

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    def _to_device(self, item):
        if item is None:
            return None
        if self.sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.sharding), item
            )
        return jax.tree_util.tree_map(jax.device_put, item)

    def _timed_get(self):
        t0 = time.perf_counter()
        item = self._q.get()
        self.wait_s += time.perf_counter() - t0
        return item

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        # Double buffering: device_put is async, so starting the NEXT
        # batch's H2D transfer before yielding the current one overlaps the
        # copy with the consumer's device compute.
        nxt = self._to_device(self._timed_get())
        while nxt is not None:
            cur = nxt
            nxt = self._to_device(self._timed_get())
            self.batches_out += 1
            yield cur

    def close(self):
        self._stop.set()
