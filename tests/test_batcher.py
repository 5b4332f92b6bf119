"""QueryBatcher: concurrent same-parameter searches coalesce into one
``search_batch`` device dispatch (engine/batcher.py).

The reference gets request concurrency from the SeekDB server process;
our in-process engine instead coalesces concurrent requests into one
batched program launch, so these tests assert the contract the serving
path relies on: correctness vs. the direct path, actual coalescing,
parameter isolation, error propagation, and the max-batch flush.
"""

from __future__ import annotations

import asyncio

import pytest

from super_rag_tpu.engine.batcher import QueryBatcher, batched_search


class FakeEngine:
    """Engine double recording every search_batch dispatch."""

    def __init__(self):
        self.calls: list[tuple[list[str], dict]] = []

    def search_batch(self, queries, **params):
        self.calls.append((list(queries), dict(params)))
        return [[f"{q}:{params.get('mode', 'hybrid')}"] for q in queries]

    def search(self, query, **params):
        return self.search_batch([query], **params)[0]


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_concurrent_searches_coalesce_into_one_dispatch():
    eng = FakeEngine()
    b = QueryBatcher(max_batch=64, max_wait_ms=20.0)

    async def go():
        return await asyncio.gather(*[
            b.search(eng, f"q{i}", top_k=5, mode="hybrid") for i in range(8)
        ])

    results = run(go())
    assert results == [[f"q{i}:hybrid"] for i in range(8)]
    assert len(eng.calls) == 1  # one device dispatch for 8 requests
    assert eng.calls[0][0] == [f"q{i}" for i in range(8)]
    assert b.stats()["avg_batch"] == 8.0


def test_different_params_do_not_batch_together():
    eng = FakeEngine()
    b = QueryBatcher(max_batch=64, max_wait_ms=20.0)

    async def go():
        return await asyncio.gather(
            b.search(eng, "a", top_k=5, mode="hybrid"),
            b.search(eng, "b", top_k=5, mode="dense"),
        )

    ra, rb = run(go())
    assert ra == ["a:hybrid"] and rb == ["b:dense"]
    assert len(eng.calls) == 2  # parameter sets stay separate programs


def test_max_batch_flushes_immediately():
    eng = FakeEngine()
    b = QueryBatcher(max_batch=4, max_wait_ms=10_000.0)  # window never fires

    async def go():
        return await asyncio.wait_for(
            asyncio.gather(*[
                b.search(eng, f"q{i}", top_k=3) for i in range(4)
            ]),
            timeout=2.0,
        )

    results = run(go())
    assert len(results) == 4
    assert len(eng.calls) == 1


def test_engine_errors_propagate_to_every_waiter():
    class Boom:
        def search_batch(self, queries, **params):
            raise RuntimeError("device error")

    b = QueryBatcher(max_batch=64, max_wait_ms=5.0)

    async def go():
        return await asyncio.gather(
            b.search(Boom(), "a", top_k=1),
            b.search(Boom(), "b", top_k=1),
            return_exceptions=True,
        )

    res = run(go())
    assert all(isinstance(r, RuntimeError) for r in res)


def test_batched_search_helper_falls_back_without_batcher():
    eng = FakeEngine()
    hits = run(batched_search({}, eng, "q", top_k=2, mode="dense"))
    assert hits == ["q:dense"]

    b = QueryBatcher(max_batch=8, max_wait_ms=5.0)
    hits = run(batched_search({"batcher": b}, eng, "q2", top_k=2,
                              mode="dense"))
    assert hits == ["q2:dense"]
    assert b.stats()["dispatches"] == 1


def test_unhashable_params_freeze_consistently():
    eng = FakeEngine()
    b = QueryBatcher(max_batch=64, max_wait_ms=20.0)

    async def go():
        return await asyncio.gather(
            b.search(eng, "a", index_types=["vector", "summary"],
                     doc_rows=[1, 2]),
            b.search(eng, "b", index_types=["vector", "summary"],
                     doc_rows=[1, 2]),
        )

    run(go())
    assert len(eng.calls) == 1  # list-valued params batch together


def test_arrivals_during_busy_drain_as_one_batch():
    """Dynamic batching: requests arriving while the device worker is
    busy accumulate and dispatch TOGETHER on completion (batch size
    tracks arrival rate x device latency, not the idle window)."""
    import threading

    release = threading.Event()
    eng = FakeEngine()
    slow_calls = []

    class SlowEngine(FakeEngine):
        def search_batch(self, queries, **params):
            slow_calls.append(list(queries))
            if len(slow_calls) == 1:
                release.wait(5)  # hold the worker busy on dispatch #1
            return super().search_batch(queries, **params)

    slow = SlowEngine()
    b = QueryBatcher(max_batch=64, max_wait_ms=1.0)

    async def go():
        first = asyncio.create_task(b.search(slow, "q0", top_k=1))
        await asyncio.sleep(0.05)  # window fires; worker now busy
        rest = [asyncio.create_task(b.search(slow, f"q{i}", top_k=1))
                for i in range(1, 11)]
        await asyncio.sleep(0.05)  # all 10 arrive while busy
        release.set()
        return await asyncio.gather(first, *rest)

    results = run(go())
    assert len(results) == 11
    assert len(slow_calls) == 2  # 1 (busy) + 1 drained batch of 10
    assert sorted(len(c) for c in slow_calls) == [1, 10]


def test_zero_window_dispatches_immediately_and_coalesces_under_load():
    """Default continuous batching: an idle worker fires NOW (no +window
    on cold-query p50); arrivals during the device call still coalesce
    via the busy-drain."""
    import threading

    release = threading.Event()
    calls = []

    class SlowEngine:
        def search_batch(self, queries, **params):
            calls.append(list(queries))
            if len(calls) == 1:
                release.wait(5.0)  # hold the worker busy for the burst
            return [[q] for q in queries]

    async def main():
        b = QueryBatcher(max_batch=64, max_wait_ms=0.0)
        eng = SlowEngine()
        first = asyncio.create_task(b.search(eng, "q0", top_k=1))
        await asyncio.sleep(0.05)  # q0 dispatched alone, worker busy
        assert calls == [["q0"]]
        burst = [asyncio.create_task(b.search(eng, f"q{i}", top_k=1))
                 for i in range(1, 9)]
        await asyncio.sleep(0.05)
        release.set()
        res = await asyncio.gather(first, *burst)
        assert [r[0] for r in res] == [f"q{i}" for i in range(9)]
        # the burst coalesced into ONE follow-up dispatch
        assert len(calls) == 2 and sorted(calls[1]) == [
            f"q{i}" for i in range(1, 9)
        ]

    asyncio.run(main())
