"""Input pipeline tests: host sharding, prefetch overlap, error surfacing,
and the relight API (SURVEY 2.5 per-host loading; eval/test_app relight
flow)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.data.input_pipeline import (
    ThreadedPrefetcher, host_shard_indices, input_pipeline,
)


def test_host_shard_indices_partition():
    all_idx = set()
    for p in range(4):
        part = host_shard_indices(103, p, 4, seed=1)
        assert not (all_idx & set(part))
        all_idx |= set(part)
    assert all_idx == set(range(103))


def test_prefetcher_produces_and_finishes():
    pf = ThreadedPrefetcher(lambda i: i * 2, num_batches=5)
    assert list(pf) == [0, 2, 4, 6, 8]


def test_prefetcher_overlaps_work():
    def slow_batch(i):
        time.sleep(0.05)
        return i

    pf = ThreadedPrefetcher(slow_batch, num_batches=6, depth=3)
    it = iter(pf)
    first = next(it)
    time.sleep(0.2)               # consumer 'trains'; producer fills queue
    t0 = time.time()
    rest = list(it)
    dt = time.time() - t0
    assert first == 0 and rest == [1, 2, 3, 4, 5]
    assert dt < 0.22              # most batches were prefetched


def test_prefetcher_surfaces_errors():
    def bad(i):
        if i == 2:
            raise ValueError("boom")
        return i

    pf = ThreadedPrefetcher(bad, num_batches=5)
    with pytest.raises(ValueError):
        list(pf)


def test_input_pipeline_with_dataset():
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"v": i}

    pipe = input_pipeline(Toy(), batch_size=3,
                          collate=lambda items: [x["v"] for x in items],
                          num_batches=2, process_index=0, process_count=2)
    batches = list(pipe)
    assert len(batches) == 2 and all(len(b) == 3 for b in batches)
    # only even-shard.. indices from this host's shard
    shard = set(host_shard_indices(10, 0, 2, seed=0))
    assert all(v in shard for b in batches for v in b)


def test_relight_smoke():
    from unirenderer_tpu.core import config
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.tiny()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    s = cfg.vae.sample_size
    img = jax.random.uniform(jax.random.key(1), (1, s, s, 3), minval=-1,
                             maxval=1)
    mask = jnp.ones((1, s, s, 3))
    env = jax.random.uniform(jax.random.key(2), (8, 16, 3))  # HDR latlong
    out = pipe.relight(image=img, mask=mask, new_env=env,
                       rng=jax.random.key(3), num_steps=2, ensemble=1,
                       env_res=16, env_samples=8)
    assert out.shape == (1, s, s, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_cached_batch_source_pools_and_persists(tmp_path):
    """Pool renders once, persists npz shards, reloads from disk."""
    import numpy as np

    from unirenderer_tpu.data.input_pipeline import cached_batch_source

    calls = []

    def gen():
        i = 0
        while True:
            calls.append(i)
            yield {"image": np.full((2, 4, 4, 3), float(i))}
            i += 1

    d = str(tmp_path / "pool")
    src = cached_batch_source(gen(), 3, cache_dir=d, seed=0)
    got = [next(src) for _ in range(10)]
    assert len(calls) == 3                      # rendered exactly pool_size
    vals = {float(b["image"][0, 0, 0, 0]) for b in got}
    assert vals <= {0.0, 1.0, 2.0} and len(vals) > 1

    # second run hits the disk cache: no generator calls at all
    calls.clear()
    src2 = cached_batch_source(gen(), 3, cache_dir=d, seed=1)
    b = next(src2)
    assert calls == []
    assert b["image"].shape == (2, 4, 4, 3)


def test_cached_batch_source_validates_shape(tmp_path):
    """Reusing a pool with a different batch/resolution than the consumer
    expects must raise, not silently train at the pool's shape
    (ADVICE round-2 medium #2)."""
    import numpy as np
    import pytest

    from unirenderer_tpu.data.input_pipeline import cached_batch_source

    def gen():
        while True:
            yield {"image": np.zeros((4, 8, 8, 3))}

    d = str(tmp_path / "pool")
    src = cached_batch_source(gen(), 2, cache_dir=d,
                              expect_batch=4, expect_resolution=8)
    next(src)

    # matching reuse is fine
    src2 = cached_batch_source(gen(), 2, cache_dir=d,
                               expect_batch=4, expect_resolution=8)
    next(src2)

    with pytest.raises(ValueError, match="batch 4"):
        next(iter(cached_batch_source(gen(), 2, cache_dir=d,
                                      expect_batch=8)))
    with pytest.raises(ValueError, match="resolution 8"):
        next(iter(cached_batch_source(gen(), 2, cache_dir=d,
                                      expect_resolution=16)))

    # freshly rendered batches are validated too
    with pytest.raises(ValueError, match="batch 4"):
        next(iter(cached_batch_source(gen(), 2, expect_batch=2)))
