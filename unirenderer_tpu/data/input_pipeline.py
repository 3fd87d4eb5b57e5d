"""Async input pipeline (SURVEY §7.5 / BASELINE north star: 'a tf.data/
Grain pipeline feeding sharded TPU hosts').

Implementation: `ThreadedPrefetcher` (background thread + bounded queue)
with tf.data-equivalent semantics — shard -> shuffle -> map(collate) ->
prefetch(depth).  A tf.data graph is deliberately NOT used: the heavy
per-batch work is the JITTED on-device render collate, which must run in
the JAX process (see `input_pipeline` design note below).

Per-host sharding: each process sees indices i with
i % process_count == process_index (SURVEY 2.5 'per-host data loading').
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence


def host_shard_indices(n: int, process_index: int, process_count: int,
                       seed: int = 0, shuffle: bool = True) -> List[int]:
    import numpy as np
    idx = np.arange(n)
    if shuffle:
        idx = np.random.default_rng(seed).permutation(idx)
    return [int(i) for i in idx[process_index::process_count]]


class ThreadedPrefetcher:
    """Background-thread batch producer: overlaps host-side collate
    (incl. the jitted render) with the device train step."""

    def __init__(self, make_batch: Callable[[int], object],
                 num_batches: Optional[int] = None, depth: int = 2):
        self._make = make_batch
        self._n = num_batches
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        i = 0
        while not self._stop.is_set():
            if self._n is not None and i >= self._n:
                self._q.put(None)
                return
            try:
                self._q.put(self._make(i))
            except Exception as e:          # surface errors to consumer
                self._q.put(e)
                return
            i += 1

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def input_pipeline(dataset, batch_size: int,
                   collate: Callable[[List[dict]], dict],
                   seed: int = 0, prefetch: int = 2,
                   process_index: int = 0, process_count: int = 1,
                   num_batches: Optional[int] = None) -> ThreadedPrefetcher:
    """Sharded, prefetched batch stream over an indexable mesh dataset.

    Design note: the heavy per-batch work here is the JITTED on-device
    render collate (data/objaverse.py collate_render) — a tf.data/Grain
    graph adds nothing on top of async prefetch + host sharding for that
    shape of work (the render must run in the JAX process), so the
    pipeline is a thread+queue prefetcher with tf.data-equivalent
    semantics: shard -> shuffle -> map(collate) -> prefetch(depth).
    """
    idx = host_shard_indices(len(dataset), process_index, process_count,
                             seed)

    def make_batch(b):
        items = [dataset[idx[(b * batch_size + j) % len(idx)]]
                 for j in range(batch_size)]
        return collate(items)

    return ThreadedPrefetcher(make_batch, num_batches=num_batches,
                              depth=prefetch)


def cached_batch_source(batches: Iterator, pool_size: int,
                        cache_dir: Optional[str] = None,
                        seed: int = 0,
                        expect_batch: Optional[int] = None,
                        expect_resolution: Optional[int] = None) -> Iterator:
    """Materialise `pool_size` collated batches ONCE (to host RAM, and to
    `cache_dir` as .npz shards when given), then yield shuffled batches
    from the pool forever.

    Rationale: with a finite synthetic distribution (quality-benchmark
    training, tools/make_synthetic_data.py) the on-the-fly render collate
    re-pays per-dispatch relay latency every step for scenes it has
    already rendered; a pre-rendered pool makes training device-bound.
    A populated cache_dir is reused across runs (e.g. the VAE and
    diffusion phases of the same quality run share one render pass).

    `expect_batch` / `expect_resolution`: the consumer's global batch size
    and image resolution.  A reused pool whose shards don't match raises
    instead of silently training at the pool's shape (a round-2 footgun:
    one pool shared between train_vae --batch 4 and train.py batch 8 ran
    diffusion at batch 4 — ADVICE.md round-2 medium #2; mismatched batch
    also breaks DP sharding on multi-device meshes).
    """
    import glob
    import json
    import os

    import numpy as np

    def _validate(shape, src):
        if expect_batch is not None and shape[0] != expect_batch:
            raise ValueError(
                f"cached pool {src} has batch {shape[0]} but the consumer "
                f"expects global batch {expect_batch}; re-render with "
                f"a fresh --cache-dir or matching --batch")
        if expect_resolution is not None and shape[1] != expect_resolution:
            raise ValueError(
                f"cached pool {src} has resolution {shape[1]} but the "
                f"consumer expects {expect_resolution}; re-render with a "
                f"fresh --cache-dir or matching config")

    pool = []
    files = sorted(glob.glob(os.path.join(cache_dir, "b*.npz"))) \
        if cache_dir else []
    if len(files) >= pool_size:
        meta_path = os.path.join(cache_dir, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                _validate(tuple(json.load(f)["image_shape"]), cache_dir)
        for f in files[:pool_size]:
            with np.load(f) as z:
                b = {k: z[k] for k in z.files}
            _validate(b["image"].shape, f)
            pool.append(b)
    else:
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        import itertools
        for i, b in enumerate(itertools.islice(batches, pool_size)):
            hb = {k: np.asarray(v) for k, v in b.items()}
            _validate(hb["image"].shape, "(freshly rendered)")
            pool.append(hb)
            if cache_dir:
                np.savez(os.path.join(cache_dir, f"b{i:05d}.npz"), **hb)
        if cache_dir and pool:
            with open(os.path.join(cache_dir, "meta.json"), "w") as f:
                json.dump({"image_shape": list(pool[0]["image"].shape),
                           "keys": sorted(pool[0]),
                           "n_batches": len(pool)}, f)
    assert pool, "cached_batch_source: empty pool"
    close = getattr(batches, "close", None)
    if close:
        close()
    rng = np.random.default_rng(seed)
    while True:
        yield pool[int(rng.integers(len(pool)))]
