"""WS streaming control-frame handling (stop/cancel during generation)."""

import asyncio

from super_rag_tpu.api.wsflow import next_message, pump


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


async def gen_n(n, closed_flag=None):
    try:
        for i in range(n):
            yield {"event": "delta", "data": {"i": i}}
    finally:
        if closed_flag is not None:
            closed_flag.append(True)


def test_pump_streams_to_completion():
    async def go():
        inbox = asyncio.Queue()
        sent = []

        async def send(e):
            sent.append(e)

        outcome, leftover = await pump(gen_n(3), inbox, send)
        return outcome, leftover, sent

    outcome, leftover, sent = run(go())
    assert outcome == "done" and leftover == []
    assert [e["data"]["i"] for e in sent] == [0, 1, 2]


def test_pump_stop_aborts_generator():
    async def go():
        inbox = asyncio.Queue()
        closed = []
        sent = []

        async def send(e):
            sent.append(e)
            if len(sent) == 2:  # stop arrives mid-stream
                await inbox.put({"type": "stop"})

        outcome, leftover = await pump(gen_n(100, closed), inbox, send)
        return outcome, leftover, sent, closed

    outcome, leftover, sent, closed = run(go())
    assert outcome == "stopped"
    assert closed == [True]  # generator finalized, not abandoned
    assert sent[-1]["event"] == "stopped"
    assert len(sent) < 100


def test_pump_queues_non_control_frames():
    async def go():
        inbox = asyncio.Queue()
        await inbox.put({"message": "next question"})
        sent = []

        async def send(e):
            sent.append(e)

        outcome, leftover = await pump(gen_n(2), inbox, send)
        return outcome, leftover, sent

    outcome, leftover, sent = run(go())
    assert outcome == "done"
    assert leftover == [{"message": "next question"}]
    assert len(sent) == 2


def test_pump_connection_close_mid_stream():
    async def go():
        inbox = asyncio.Queue()
        await inbox.put(None)
        sent = []

        async def send(e):
            sent.append(e)

        return await pump(gen_n(5), inbox, sent.append and send)

    outcome, _ = run(go())
    assert outcome == "closed"


def test_next_message_skips_bare_stop():
    async def go():
        inbox = asyncio.Queue()
        await inbox.put({"type": "stop"})
        await inbox.put({"message": "hi"})
        leftover = [{"type": "cancel"}, {"message": "queued"}]
        first = await next_message(inbox, leftover)
        second = await next_message(inbox, leftover)
        await inbox.put(None)
        third = await next_message(inbox, [])
        return first, second, third

    first, second, third = run(go())
    assert first == {"message": "queued"}
    assert second == {"message": "hi"}
    assert third is None
