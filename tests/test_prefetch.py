"""Producer-thread prefetch: ordering, exception propagation, early abandon."""

import time

from hpgq.pipeline.prefetch import prefetched


def test_order_and_transform():
    out = list(prefetched(range(100), depth=4, transform=lambda x: x * 2))
    assert out == [x * 2 for x in range(100)]


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetched(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    try:
        next(it)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "boom" in str(e)


def test_consumer_abandons_early():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetched(gen(), depth=2)
    for _ in range(3):
        next(it)
    it.close()
    time.sleep(0.3)
    assert len(produced) < 10_000  # producer stopped, not drained
