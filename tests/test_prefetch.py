"""Background-thread batch prefetcher (data/prefetch.py) — the TPU-native
equivalent of the reference's DataLoader worker overlap
(reference train_latent.py:157-229, num_workers>0)."""

import time

import pytest

from gvfdiffusion_tpu.data.prefetch import Prefetcher


def test_prefetch_order_and_place_fn():
    seen = []

    def place(x):
        seen.append(x)
        return x * 10

    with Prefetcher(iter(range(8)), place_fn=place) as pf:
        out = [next(pf) for _ in range(8)]
    assert out == [i * 10 for i in range(8)]
    assert seen[:8] == list(range(8))


def test_prefetch_stop_iteration():
    pf = Prefetcher(iter([1, 2]))
    assert next(pf) == 1
    assert next(pf) == 2
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()


def test_prefetch_propagates_worker_exception():
    def gen():
        yield 1
        raise ValueError("loader failed")

    pf = Prefetcher(gen())
    assert next(pf) == 1
    with pytest.raises(ValueError, match="loader failed"):
        next(pf)
    pf.close()


def test_prefetch_runs_ahead_of_consumer():
    """The worker must fill the queue while the consumer is busy."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    pf = Prefetcher(gen(), depth=2)
    deadline = time.time() + 5.0
    # queue depth 2 + the one the worker holds in-flight => >= 2 produced
    # before the consumer asks for anything
    while len(produced) < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 2
    assert [next(pf) for _ in range(4)] == list(range(4))
    pf.close()


def test_prefetch_close_unblocks_full_queue():
    def gen():
        while True:
            yield 0

    pf = Prefetcher(gen(), depth=1)
    time.sleep(0.1)  # let the worker block on a full queue
    pf.close()
    assert not pf._thread.is_alive()
