"""Bounded ordered thread map backing --num_workers (data/prefetch.py) —
the torch-DataLoader-workers analogue (reference train.py:538-546,563)."""

import threading
import time

import pytest

from multihmr_tpu.data.prefetch import bounded_parallel_map


def test_serial_fallback_preserves_order_and_laziness():
    calls = []

    def fn(i):
        calls.append(i)
        return i * i

    it = bounded_parallel_map(fn, range(10), num_workers=0)
    assert calls == []  # generator: nothing runs until consumed
    assert next(it) == 0
    assert calls == [0]  # serial path is fully lazy
    assert list(it) == [i * i for i in range(1, 10)]


def test_parallel_order_matches_input():
    def fn(i):
        # reverse-staggered sleeps: later items finish FIRST unless the
        # map re-orders results back to input order
        time.sleep((16 - i) * 0.005)
        return i * 10

    assert list(bounded_parallel_map(fn, range(16), num_workers=4)) == [
        i * 10 for i in range(16)
    ]


def test_in_flight_window_is_bounded():
    lock = threading.Lock()
    live = 0
    max_live = 0
    started = []

    def fn(i):
        nonlocal live, max_live
        with lock:
            live += 1
            max_live = max(max_live, live)
            started.append(i)
        time.sleep(0.01)
        with lock:
            live -= 1
        return i

    out = list(bounded_parallel_map(fn, range(40), num_workers=3, prefetch=2))
    assert out == list(range(40))
    # concurrency can never exceed the worker count...
    assert max_live <= 3
    # ...and submission is windowed: with workers+prefetch=5 the last item
    # cannot have started before most of the stream was consumed
    assert started.index(39) >= 30


def test_worker_exception_propagates_in_order():
    def fn(i):
        if i == 5:
            raise ValueError("boom at 5")
        return i

    it = bounded_parallel_map(fn, range(10), num_workers=4)
    assert [next(it) for _ in range(5)] == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="boom at 5"):
        next(it)


def test_short_input_smaller_than_window():
    assert list(bounded_parallel_map(lambda i: -i, range(3), num_workers=8)) == [
        0, -1, -2
    ]
    assert list(bounded_parallel_map(lambda i: i, [], num_workers=2)) == []
