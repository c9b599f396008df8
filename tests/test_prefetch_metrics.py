"""Prefetch iterator + evaluation metrics."""

import time

import numpy as np

import jax.numpy as jnp

from svcc23_fastsvc_tpu.data.prefetch import PrefetchIterator
from svcc23_fastsvc_tpu.utils.metrics import log_mel_spectrogram, mcd, mel_l1


def test_prefetch_preserves_order_and_items():
    src = [{"i": np.full((2,), i)} for i in range(10)]
    out = list(PrefetchIterator(iter(src), depth=3))
    assert len(out) == 10
    for i, item in enumerate(out):
        np.testing.assert_array_equal(item["i"], np.full((2,), i))


def test_prefetch_overlaps_production():
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)
            yield i

    it = PrefetchIterator(slow_gen(), depth=4)
    time.sleep(0.30)  # producer should have filled the queue meanwhile
    t0 = time.time()
    items = [next(it) for _ in range(4)]
    assert time.time() - t0 < 0.05, "prefetched items should be instant"
    assert items == [0, 1, 2, 3]


def test_prefetch_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(bad_gen(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "boom" in str(e)


def test_mel_l1_zero_for_identical():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(8000), jnp.float32)
    assert float(mel_l1(x, x)) == 0.0
    y = jnp.asarray(rng.standard_normal(8000), jnp.float32)
    assert float(mel_l1(x, y)) > 0.1


def test_mcd_properties():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((40, 60)).astype(np.float32)
    assert float(mcd(a, a)) == 0.0
    b = a + 0.1
    # c0 excluded -> uniform offset on c0 only would be free; here all dims
    v = float(mcd(a, b))
    assert v > 0
