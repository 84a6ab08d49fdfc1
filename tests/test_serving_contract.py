"""Serving shape contract + server hardening (VERDICT round-1 items 3, 4, 9).

The core invariant: after `SmallTTS.warmup()`, NO in-contract request can
trigger an XLA compile in the request path (compiles are minutes on TPU).
Proven two ways: a pure shape-coverage sweep over the batcher's padding
logic, and a compile-counting integration test on a tiny model.
"""

import socket
import threading
import time
import warnings
from concurrent.futures import Future

import numpy as np
import pytest

from smalltts_tpu.data.bucketing import (
    LATENT_BUCKETS,
    SERVING_PHONEME_BUCKETS,
    SERVING_REF_BUCKETS,
)
from smalltts_tpu.serving.batcher import (
    Batcher,
    QueueFull,
    Request,
    group_requests,
    pad_group,
)

# ------------------------------------------------------- contract coverage


def test_pad_group_shapes_always_in_contract():
    """Whatever mix of requests arrives, pad_group lands on the warmup
    grid: batch in {1, max_batch}, r/p on the serving ladders, t on
    LATENT_BUCKETS."""
    rng = np.random.RandomState(0)
    max_batch = 8
    contract = {
        (b, r, p, t)
        for b in (1, max_batch)
        for r in SERVING_REF_BUCKETS
        for p in SERVING_PHONEME_BUCKETS
        for t in LATENT_BUCKETS
    }
    for trial in range(200):
        n = rng.randint(1, 20)
        reqs = [
            Request(
                np.zeros((rng.randint(1, 400), 64), np.float32),
                [1] * rng.randint(1, 500),
                float(rng.uniform(0.2, 35.0)),
            )
            for _ in range(n)
        ]
        for group in group_requests(reqs, max_batch):
            ref, _, ph, _, seq_lens, t_bucket, b_bucket = pad_group(group, max_batch)
            shape = (b_bucket, ref.shape[1], ph.shape[1], t_bucket)
            assert shape in contract, f"off-contract shape {shape} (trial {trial})"
            assert (seq_lens >= 1).all() and (seq_lens <= t_bucket).all()


def test_no_compile_after_warmup():
    """Compile-count integration: warm a sub-grid, serve in-contract
    requests, assert the jit cache does not grow."""
    import jax

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    n = tts.warmup(
        batch_sizes=(1, 2), t_buckets=(16,), r_buckets=(64,), p_buckets=(128,)
    )
    warmed = tts.compile_cache_size()
    enc_warmed = tts._encode_fn._cache_size()
    assert warmed == n == 2
    assert enc_warmed == 1  # one encoder graph per warmed ref bucket

    batcher = Batcher(tts, max_batch=2)
    try:
        # single request -> batch class 1; two concurrent -> batch class 2;
        # varying TRUE lengths must all reuse the warmed executables
        for ref_len, tok_len, dur in [(8, 3, 1.0), (40, 90, 2.0), (64, 128, 2.1)]:
            fut = batcher.submit(np.zeros((ref_len, 64), np.float32),
                                 [1] * tok_len, dur)
            fut.result(timeout=60)
        futs = [
            batcher.submit(np.zeros((10, 64), np.float32), [1, 2, 3], 1.5)
            for _ in range(2)
        ]
        for f in futs:
            f.result(timeout=60)
    finally:
        batcher.close()
    assert tts.compile_cache_size() == warmed, (
        "request-path XLA compile detected: an in-contract request shape "
        "was not covered by warmup()"
    )
    # arbitrary clip lengths all reuse the bucketed encoder graph
    for samples in (3200, 5000, 123_456, 64 * 3200):
        lat = tts.encode_reference(np.zeros((samples,), np.float32))
        assert lat.shape[0] == max(-(-samples // 3200), 1)
    assert tts._encode_fn._cache_size() == enc_warmed, (
        "encode_reference compiled per clip length (request-path compile)"
    )


def test_contract_shapes_matches_default_grid():
    from smalltts_tpu.infer.pipeline import SmallTTS

    shapes = SmallTTS.contract_shapes(object())  # self unused
    assert len(shapes) == 2 * len(SERVING_REF_BUCKETS) * len(
        SERVING_PHONEME_BUCKETS
    ) * len(LATENT_BUCKETS)


# ----------------------------------------------------- long-reference path


def test_long_reference_no_longer_truncated_at_64():
    reqs = [Request(np.ones((150, 64), np.float32), [1], 1.0)]
    ref, ref_lens, *_ = pad_group(reqs, 8)
    assert ref.shape[1] == 256
    assert ref_lens[0] == 150  # full reference survives (round 1: cut to 64)


def test_bucketize_warns_beyond_largest_bucket():
    import jax

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, ref_len, *_ = tts._bucketize(np.zeros((300, 64), np.float32), [1], 1.0)
    assert ref_len == 256
    assert any("truncating" in str(x.message) for x in w)
    # in-range refs warn nothing
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, ref_len, *_ = tts._bucketize(np.zeros((100, 64), np.float32), [1], 1.0)
    assert ref_len == 100
    assert not w


# ------------------------------------------------------------ backpressure


class _SlowTTS:
    """Stand-in pipeline: block until released, return zeros."""

    def __init__(self):
        self.release = threading.Event()
        self.calls = 0

    def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens, t_bucket,
                          key=None, fetch=True):
        self.release.wait(timeout=30)
        self.calls += 1
        return np.zeros((ref.shape[0], 1, int(t_bucket) * 3200), np.float32)


def test_queue_cap_raises_queue_full():
    tts = _SlowTTS()
    b = Batcher(tts, max_batch=4, max_queue=5)
    try:
        futs = []
        with pytest.raises(QueueFull):
            for _ in range(500):
                futs.append(b.submit(np.zeros((4, 64), np.float32), [1], 1.0))
        assert b.pending() <= 5  # cap held at the moment of rejection
        tts.release.set()
        for f in futs:
            assert f.result(timeout=30).shape[0] == 1
    finally:
        tts.release.set()
        b.close()


def test_saturation_stress_all_requests_complete():
    """Hundreds of concurrent submissions: every future either resolves or
    was rejected with QueueFull; nothing hangs, queue stays bounded."""

    class _FastTTS:
        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            time.sleep(0.001)
            return np.zeros((ref.shape[0], 1, int(t_bucket) * 3200), np.float32)

    b = Batcher(_FastTTS(), max_batch=8, max_queue=64, window_ms=1.0)
    results = {"ok": 0, "rejected": 0}
    lock = threading.Lock()

    def client(n):
        rng = np.random.RandomState(n)
        for _ in range(40):
            try:
                fut = b.submit(
                    np.zeros((rng.randint(1, 80), 64), np.float32),
                    [1] * rng.randint(1, 50),
                    float(rng.uniform(0.3, 12.0)),
                )
                fut.result(timeout=30)
                with lock:
                    results["ok"] += 1
            except QueueFull:
                with lock:
                    results["rejected"] += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "client thread hung"
    b.close()
    assert results["ok"] + results["rejected"] == 8 * 40
    assert results["ok"] > 0


def test_priority_request_jumps_queue():
    """A priority-1 submission (a stream's first chunk) must dispatch ahead
    of ALREADY-QUEUED priority-0 requests: TTFB must not wait behind other
    streams' later chunks (VERDICT r3 weak #2)."""
    order = []

    class _Recorder:
        def __init__(self):
            self.release = threading.Event()

        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            self.release.wait(timeout=30)
            order.append(int(ph_lens[0]))  # tag = phoneme count
            return np.zeros((ref.shape[0], 1, int(t_bucket) * 3200),
                            np.float32)

    tts = _Recorder()
    b = Batcher(tts, max_batch=1, window_ms=1.0)
    try:
        ref = np.zeros((4, 64), np.float32)
        # hold the dispatch thread on request #1, queue normals, then a
        # priority request — it must run before the queued normals
        futs = [b.submit(ref, [1] * 1, 1.0)]
        time.sleep(0.05)  # let #1 reach the (blocked) synthesize call
        futs += [b.submit(ref, [1] * n, 1.0) for n in (2, 3, 4)]
        pri = b.submit(ref, [1] * 9, 1.0, priority=1)
        tts.release.set()
        pri.result(timeout=30)
        for f in futs:
            f.result(timeout=30)
    finally:
        tts.release.set()
        b.close()
    assert order[0] == 1  # in-flight when priority arrived
    assert order[1] == 9, f"priority request ran at position {order.index(9)}"


def test_priority_skips_collection_window():
    """A lone priority request must dispatch immediately, not after the
    window_ms collection sleep."""

    class _Instant:
        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            return np.zeros((ref.shape[0], 1, int(t_bucket) * 3200),
                            np.float32)

    b = Batcher(_Instant(), max_batch=8, window_ms=200.0)
    try:
        t0 = time.monotonic()
        fut = b.submit(np.zeros((4, 64), np.float32), [1], 1.0, priority=1)
        fut.result(timeout=30)
        elapsed = time.monotonic() - t0
        assert elapsed < 0.15, (
            f"priority request waited the {elapsed * 1e3:.0f} ms window")
    finally:
        b.close()


# -------------------------------------------------------- stats ring buffer


def test_stats_ring_buffer_bounded():
    from smalltts_tpu.serving.server import STATS_WINDOW, ServerStats

    s = ServerStats()
    for i in range(STATS_WINDOW * 3):
        s.synth_ms.append(float(i))
    assert len(s.synth_ms) == STATS_WINDOW
    assert s.synth_ms[0] == float(STATS_WINDOW * 2)  # oldest rolled off


# ------------------------------------------------------- transport limits


def _start_server(server):
    import asyncio

    loop = asyncio.new_event_loop()
    ready = threading.Event()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            srv = await asyncio.start_server(server._serve_conn, "127.0.0.1", 0)
            holder["port"] = srv.sockets[0].getsockname()[1]
            ready.set()
            async with srv:
                await srv.serve_forever()

        try:
            loop.run_until_complete(main())
        except Exception:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(timeout=10)
    return holder["port"], loop


def test_stalled_client_connection_times_out():
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    server = TTSServer(x402_cfg=X402Config(mode="disabled"), read_timeout_s=0.4)
    port, loop = _start_server(server)
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"GET /health HTTP/1.1\r\nhost: x\r\npartial-head")  # never finishes
        s.settimeout(5)
        t0 = time.time()
        data = s.recv(4096)  # server must CLOSE, not hang
        assert data == b"", f"expected close, got {data!r}"
        assert time.time() - t0 < 4.0
        s.close()
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_oversized_headers_rejected_431():
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    server = TTSServer(x402_cfg=X402Config(mode="disabled"))
    port, loop = _start_server(server)
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        big = b"x-filler: " + b"a" * 20_000 + b"\r\n"
        s.sendall(b"GET /health HTTP/1.1\r\n" + big + b"\r\n")
        s.settimeout(5)
        resp = s.recv(65536)
        assert b"431" in resp.split(b"\r\n")[0]
        s.close()
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_bad_content_length_rejected_400():
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    server = TTSServer(x402_cfg=X402Config(mode="disabled"))
    port, loop = _start_server(server)
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"POST /synthesize HTTP/1.1\r\ncontent-length: banana\r\n\r\n")
        s.settimeout(5)
        resp = s.recv(65536)
        assert b"400" in resp.split(b"\r\n")[0]
        s.close()
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_long_reference_clone_through_pipeline():
    """VERDICT item 4's clone test: a ~13 s reference (100 latent frames)
    flows through SmallTTS.synthesize without being cut to 64 frames."""
    import jax

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    ref = np.random.RandomState(0).randn(100, 64).astype(np.float32)
    # the padded entry point records the true (un-truncated) ref length
    reff, ref_len, ph, ph_len, seq_len, t_bucket = tts._bucketize(ref, [1, 2], 1.0)
    assert reff.shape[0] == 256 and ref_len == 100
    audio = tts.synthesize(ref, [1, 2, 3], 1.0)
    assert audio.shape == (1, 8 * 3200)
    assert np.isfinite(audio).all()


def test_streaming_long_form_endpoint():
    """POST /synthesize/stream: chunked-transfer WAV whose pieces arrive per
    chunk; total PCM equals the crossfaded long-form length, with the
    first-chunk fast path (head_split) producing a SHORT first piece so TTFB
    rides the smallest latent bucket (VERDICT r3 weak #2)."""
    import jax

    from smalltts_tpu.data.bucketing import frames_for_duration
    from smalltts_tpu.infer.pipeline import SmallTTS, estimate_duration
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda t: [1, 2, 3])
    port, loop = _start_server(server)
    try:
        # two sentences too long to merge (max_chars 330)
        s1 = "alpha " * 33  # ~198 chars
        s2 = "bravo " * 33
        text = s1.strip() + ". " + s2.strip() + "."
        import struct

        sr = 24_000
        pcm16 = (np.zeros(sr, np.float32) * 32767).astype("<i2").tobytes()
        wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm16)) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
               + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
        boundary = "SB"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="audio"\r\n\r\n'
        ).encode() + wav + (
            f"\r\n--{boundary}\r\n"
            'Content-Disposition: form-data; name="text"\r\n\r\n'
            + text + "\r\n"
            f"--{boundary}--\r\n"
        ).encode()
        req = (
            f"POST /synthesize/stream?duration=3 HTTP/1.1\r\nhost: x\r\n"
            f"content-type: multipart/form-data; boundary={boundary}\r\n"
            f"content-length: {len(body)}\r\n\r\n"
        ).encode() + body

        s = socket.create_connection(("127.0.0.1", port), timeout=300)
        s.sendall(req)
        s.settimeout(300)
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(65536)
        head, rest = buf.split(b"\r\n\r\n", 1)
        assert b"200" in head.split(b"\r\n")[0]
        assert b"transfer-encoding: chunked" in head.lower()

        # drain chunked body
        pieces = []
        buf = rest
        while True:
            while b"\r\n" not in buf:
                buf += s.recv(65536)
            size_line, buf = buf.split(b"\r\n", 1)
            size = int(size_line, 16)
            if size == 0:
                break
            while len(buf) < size + 2:
                buf += s.recv(65536)
            pieces.append(buf[:size])
            buf = buf[size + 2:]
        s.close()

        assert len(pieces) >= 4  # wav header + head piece + >=2 more
        assert pieces[0][:4] == b"RIFF"
        assert struct.unpack("<I", pieces[0][4:8])[0] == 0xFFFFFFFF
        # expected chunk plan mirrors the server: sentence split, then the
        # first sentence head-split for the TTFB fast path
        from smalltts_tpu.infer.long_form import head_split, split_sentences

        sents = split_sentences(text)
        head, rest_of_s1 = head_split(sents[0])
        chunks = [head, rest_of_s1] + sents[1:]
        samples = [frames_for_duration(estimate_duration(c)) * 3200
                   for c in chunks]
        fade = int(24_000 * 20 / 1e3)
        total_pcm = sum(len(p) for p in pieces[1:]) // 2
        expect = sum(samples) - (len(samples) - 1) * fade
        assert total_pcm == expect, (total_pcm, expect, samples)
        # fast-path contract: the first audio piece is strictly shorter than
        # any full-sentence piece (it rode a smaller latent bucket)
        assert len(pieces[1]) < max(len(p) for p in pieces[2:]), (
            [len(p) for p in pieces])
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_ready_endpoint_lifecycle():
    """503 before the pipeline exists, 200 once batched serving is live,
    503 again while draining."""
    import asyncio

    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    server = TTSServer(x402_cfg=X402Config(mode="disabled"))
    loop = asyncio.new_event_loop()
    try:
        status, _, body = loop.run_until_complete(
            server.handle("GET", "/ready", {}, {}, b""))
        assert status == 503 and b"not warmed" in body

        class _Fast:
            def synthesize_padded(self, *a, **k):
                import numpy as np
                return np.zeros((a[0].shape[0], 1, int(a[5]) * 3200), np.float32)

            def encode_reference(self, x):
                import numpy as np
                return np.zeros((4, 64), np.float32)

        server._tts = _Fast()
        server._ensure_pipeline()
        status, _, _ = loop.run_until_complete(
            server.handle("GET", "/ready", {}, {}, b""))
        assert status == 200

        loop.run_until_complete(server.shutdown())
        status, _, body = loop.run_until_complete(
            server.handle("GET", "/ready", {}, {}, b""))
        assert status == 503 and b"draining" in body
        # liveness stays green throughout
        status, _, _ = loop.run_until_complete(
            server.handle("GET", "/health", {}, {}, b""))
        assert status == 200
    finally:
        loop.close()


def test_dispatch_fetch_pipelining():
    """The batcher must dispatch group N+1 while group N's result is still
    being materialized (on a tunneled TPU the fetch is a ~30 ms round trip;
    serializing it after every group forfeits ~3.5x sustained throughput)."""

    events = []
    lock = threading.Lock()

    class _LazyAudio:
        """Device-array stand-in: materialization blocks, like np.asarray on
        an in-flight jax array."""

        def __init__(self, n, b, samples):
            self.n, self.shape = n, (b, 1, samples)

        def __array__(self, dtype=None, copy=None):
            with lock:
                events.append(("fetch_start", self.n))
            time.sleep(0.05)
            with lock:
                events.append(("fetch_done", self.n))
            return np.zeros(self.shape, np.float32)

    class _AsyncTTS:
        def __init__(self):
            self.n = 0

        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            with lock:
                self.n += 1
                events.append(("dispatch", self.n))
            return _LazyAudio(self.n, ref.shape[0], int(t_bucket) * 3200)

    b = Batcher(_AsyncTTS(), max_batch=1, window_ms=0.0)
    try:
        futs = [b.submit(np.zeros((4, 64), np.float32), [1], 1.0)
                for _ in range(4)]
        for f in futs:
            assert f.result(timeout=30).shape[0] == 1
    finally:
        b.close()

    # at least one later dispatch happened before an earlier fetch finished
    order = {("dispatch", 2): None, ("fetch_done", 1): None}
    idx = {e: i for i, e in enumerate(events) if e in order}
    assert ("dispatch", 2) in idx and ("fetch_done", 1) in idx, events
    assert idx[("dispatch", 2)] < idx[("fetch_done", 1)], events


def test_fetch_error_propagates_to_waiters():
    """An exception raised while materializing a dispatched batch (e.g. a
    device OOM surfacing at fetch time under async dispatch) must reject
    that group's futures, and the batcher must keep serving."""

    class _Boom:
        def __init__(self, n):
            self.n = n

        def __array__(self, dtype=None, copy=None):
            if self.n == 1:
                raise RuntimeError("device exploded at fetch")
            return np.zeros((1, 1, 16 * 3200), np.float32)

    class _TTS:
        def __init__(self):
            self.n = 0

        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            self.n += 1
            return _Boom(self.n)

    b = Batcher(_TTS(), max_batch=1, window_ms=0.0)
    try:
        f1 = b.submit(np.zeros((4, 64), np.float32), [1], 1.0)
        with pytest.raises(RuntimeError, match="device exploded"):
            f1.result(timeout=30)
        f2 = b.submit(np.zeros((4, 64), np.float32), [1], 1.0)
        assert f2.result(timeout=30).shape[0] == 1  # still serving
    finally:
        b.close()


def test_close_drains_inflight_work():
    """close() must not drop dispatched-but-unfetched groups."""

    class _SlowFetch:
        def __array__(self, dtype=None, copy=None):
            time.sleep(0.2)
            return np.zeros((1, 1, 16 * 3200), np.float32)

    class _TTS:
        def synthesize_padded(self, *a, **k):
            return _SlowFetch()

    b = Batcher(_TTS(), max_batch=1, window_ms=0.0)
    futs = [b.submit(np.zeros((4, 64), np.float32), [1], 1.0) for _ in range(3)]
    time.sleep(0.05)  # let dispatch happen
    b.close()
    for f in futs:
        assert f.result(timeout=30).shape[0] == 1


def test_pending_counts_dispatched_unfetched_requests():
    """pending() must include dispatched-but-unfetched requests (the
    pipelining window) — monitoring built on the gauge must not see an
    idle server while groups await materialization."""

    class _Gate:
        def __init__(self):
            self.release = threading.Event()

        def __array__(self, dtype=None, copy=None):
            self.release.wait(timeout=30)
            return np.zeros((1, 1, 16 * 3200), np.float32)

    gates = []

    class _TTS:
        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            g = _Gate()
            gates.append(g)
            return g

    b = Batcher(_TTS(), max_batch=1, window_ms=0.0)
    try:
        futs = [b.submit(np.zeros((4, 64), np.float32), [1], 1.0)
                for _ in range(3)]
        deadline = time.time() + 10
        while b.pending() < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert b.pending() == 3, b.pending()  # all dispatched or queued, none delivered
        # groups dispatch (and create gates) one at a time: release
        # continuously so every future resolves regardless of ordering
        stop = threading.Event()

        def releaser():
            while not stop.is_set():
                for g in list(gates):
                    g.release.set()
                time.sleep(0.005)

        rel = threading.Thread(target=releaser, daemon=True)
        rel.start()
        for f in futs:
            assert f.result(timeout=30).shape[0] == 1
        deadline = time.time() + 10
        while b.pending() and time.time() < deadline:
            time.sleep(0.01)
        assert b.pending() == 0
        stop.set()
        rel.join(timeout=5)
    finally:
        for g in list(gates):
            g.release.set()
        b.close()


def test_submit_after_close_raises_queue_full():
    """ADVICE r2: a submit after close() must fail fast (mapped to 503 at
    the HTTP layer) instead of parking a Future the dead dispatch thread can
    never resolve."""

    class _TTS:
        def synthesize_padded(self, *a, **k):
            return np.zeros((1, 1, 16 * 3200), np.float32)

    b = Batcher(_TTS(), max_batch=1, window_ms=0.0)
    b.close()
    with pytest.raises(QueueFull, match="closed"):
        b.submit(np.zeros((4, 64), np.float32), [1], 1.0)


def test_streaming_body_holds_drain_slot():
    """ADVICE r2 (medium): the chunked-stream generator keeps submitting
    work after _synthesize returns, so it must hold its own _active slot —
    otherwise shutdown() can close the batcher mid-stream and hang the
    connection. Drive the generator directly and watch the gauge."""
    import asyncio
    import struct

    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    class _Fast:
        def synthesize_padded(self, ref, *a, **k):
            seq = int(a[4]) if len(a) > 4 else 16
            return np.zeros((ref.shape[0], 1, seq * 3200), np.float32)

        def encode_reference(self, x):
            return np.zeros((4, 64), np.float32)

    server = TTSServer(tts=_Fast(), x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda t: [1, 2, 3])
    server._ensure_pipeline()

    sr = 24_000
    pcm16 = np.zeros(sr, "<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm16)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
    boundary = "SB"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        "one sentence here.\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}

    async def drive():
        status, _, agen = await server.handle(
            "POST", "/synthesize/stream", {"duration": "2"}, headers, body)
        assert status == 200
        assert server._active == 0  # handler slot released on return
        it = agen.__aiter__()
        await it.__anext__()  # wav header: generator now running
        assert server._active == 1, "stream must hold a drain slot"
        # exhaust
        try:
            while True:
                await it.__anext__()
        except StopAsyncIteration:
            pass
        assert server._active == 0
        # TTFB recorded for the stream
        snap = server._stat_snapshot()
        assert snap["stream_ttfb_ms_p50"] > 0.0

        # an ABANDONED stream must release its slot via aclose (the
        # transport closes the generator on client disconnect)
        status, _, agen2 = await server.handle(
            "POST", "/synthesize/stream", {"duration": "2"}, headers, body)
        it2 = agen2.__aiter__()
        await it2.__anext__()
        assert server._active == 1
        await agen2.aclose()
        assert server._active == 0

    loop = asyncio.new_event_loop()
    try:
        loop.run_until_complete(drive())
        loop.run_until_complete(server.shutdown(drain_timeout_s=2))
    finally:
        loop.close()


def test_stream_after_batcher_close_fails_fast():
    """A stream racing past /ready during drain must truncate promptly
    (submit raises once closed) instead of hanging on a parked Future."""
    import asyncio
    import struct

    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    class _Fast:
        def synthesize_padded(self, ref, *a, **k):
            return np.zeros((ref.shape[0], 1, 16 * 3200), np.float32)

        def encode_reference(self, x):
            return np.zeros((4, 64), np.float32)

    server = TTSServer(tts=_Fast(), x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda t: [1, 2, 3])
    server._ensure_pipeline()

    sr = 24_000
    pcm16 = np.zeros(sr, "<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm16)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
    boundary = "SB"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        "a sentence.\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}

    async def drive():
        status, _, agen = await server.handle(
            "POST", "/synthesize/stream", {"duration": "2"}, headers, body)
        assert status == 200
        server._batcher.close()  # drain completed while stream was parked
        # must terminate, not hang — and by RAISING, so _respond_chunked
        # aborts without the terminal chunk instead of presenting the
        # truncation as a complete response (review r3)
        chunks = []
        with pytest.raises(QueueFull):
            async for c in agen:
                chunks.append(c)
        assert len(chunks) <= 1  # header at most; no audio after close

    loop = asyncio.new_event_loop()
    try:
        loop.run_until_complete(asyncio.wait_for(drive(), timeout=30))
    finally:
        loop.close()


def test_stream_first_chunk_before_last_sentence_synthesized():
    """The point of /synthesize/stream: the first audio chunk must be
    delivered while LATER sentences are still unsynthesized (playback
    starts after sentence 1). Instrumented fake TTS counts synthesis calls;
    when the first PCM piece arrives, most sentences must still be
    pending."""
    import asyncio
    import struct

    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    calls = []

    class _Slow:
        def synthesize_padded(self, ref, *a, **k):
            calls.append(time.monotonic())
            time.sleep(0.25)  # per-sentence synthesis cost
            return np.zeros((ref.shape[0], 1, 16 * 3200), np.float32)

        def encode_reference(self, x):
            return np.zeros((4, 64), np.float32)

    server = TTSServer(tts=_Slow(), x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda t: [1, 2, 3])
    server._ensure_pipeline()

    sr = 24_000
    pcm16 = np.zeros(sr, "<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm16)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
    n_sentences = 4
    text = " ".join((f"sentence number {i} " * 12).strip() + "."
                    for i in range(n_sentences))
    boundary = "SB"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        + text + "\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    headers = {"content-type": f"multipart/form-data; boundary={boundary}"}

    async def drive():
        status, _, agen = await server.handle(
            "POST", "/synthesize/stream", {"duration": "2"}, headers, body)
        assert status == 200
        n_calls_at_first_pcm = None
        pieces = 0
        async for piece in agen:
            pieces += 1
            if pieces == 2 and n_calls_at_first_pcm is None:
                # piece 1 = RIFF header; piece 2 = first synthesized PCM
                n_calls_at_first_pcm = len(calls)
        return n_calls_at_first_pcm, pieces

    loop = asyncio.new_event_loop()
    try:
        n_at_first, pieces = loop.run_until_complete(
            asyncio.wait_for(drive(), timeout=60))
    finally:
        loop.close()
    assert pieces >= n_sentences  # header + one piece per sentence
    # first PCM must arrive before the final sentence has even STARTED:
    # with crossfade holdback the first emit happens during sentence 2
    assert n_at_first is not None and n_at_first < n_sentences, (
        f"first audio chunk only after {n_at_first}/{n_sentences} sentences")


def test_stream_payment_caps_synthesized_duration():
    """Payment is priced on ?duration= (gate.check verified value >=
    price_for_duration(duration)), so in enforcing modes the stream must
    not synthesize more than was paid for — without the cap a 1 s payment
    buys an arbitrarily long text (review r3). Local mode also gets the
    same x-payment-response acknowledgment as the non-stream endpoint."""
    import asyncio
    import struct

    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config, X402Gate

    submitted: list = []

    class _Fast:
        def synthesize_padded(self, ref, *a, **k):
            return np.zeros((ref.shape[0], 1, 16 * 3200), np.float32)

        def encode_reference(self, x):
            return np.zeros((4, 64), np.float32)

    pay_to = "0xBAc675C310721717Cd4A37F6cbeA1F081b1C2a07"
    server = TTSServer(tts=_Fast(),
                       x402_cfg=X402Config(mode="local", pay_to=pay_to),
                       tokenizer=lambda t: [1, 2, 3])
    batcher = server._ensure_pipeline()
    real_submit = batcher.submit

    def spying_submit(ref, tokens, duration_sec, **kw):
        submitted.append(duration_sec)
        return real_submit(ref, tokens, duration_sec, **kw)

    batcher.submit = spying_submit

    sr = 24_000
    pcm16 = np.zeros(sr, "<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm16)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
    # 6 sentences, each estimate_duration-clamped to >= 0.5 s: unpaid total
    # >= 3 s, paid duration 1.0 s -> at most ~2-3 capped submissions
    text = " ".join("this is spoken sentence number %d." % i for i in range(6))
    boundary = "SB"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        f"{text}\r\n"
        f"--{boundary}--\r\n"
    ).encode()

    # sign a real local-mode payment for 1 s
    import base64
    import json as _json
    gate: X402Gate = server.gate
    hdr = gate.payment_required_header(1.0, "/synthesize/stream")
    accept = _json.loads(base64.b64decode(hdr))["accepts"][0]
    payment = gate.sign_payment(0xD15C0, accept)
    headers = {"content-type": f"multipart/form-data; boundary={boundary}",
               "x-payment": payment}

    async def drive():
        status, resp_headers, agen = await server.handle(
            "POST", "/synthesize/stream", {"duration": "1.0"}, headers, body)
        assert status == 200, status
        # local mode acknowledges the accepted authorization on stream too
        assert any(k == "x-payment-response" for k, _ in resp_headers)
        async for _ in agen:
            pass

    loop = asyncio.new_event_loop()
    try:
        loop.run_until_complete(asyncio.wait_for(drive(), timeout=60))
        loop.run_until_complete(server.shutdown(drain_timeout_s=2))
    finally:
        loop.close()

    assert submitted, "stream synthesized nothing"
    assert sum(submitted) <= 1.0 + 1e-6, (
        f"stream synthesized {sum(submitted):.2f}s on a 1.0s payment")
    assert len(submitted) < 6, "cap never engaged"


def test_negative_content_length_rejected_400():
    """int() accepts '-1' and readexactly(-1) raises uncaught, killing the
    connection task with no response (review r3) — must 400 like any other
    bad content-length."""
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"))
    port, loop = _start_server(server)
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"POST /synthesize HTTP/1.1\r\nhost: x\r\n"
                  b"content-length: -1\r\n\r\n")
        s.settimeout(5)
        data = s.recv(4096)
        assert data.startswith(b"HTTP/1.1 400"), data[:60]
        s.close()
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_request_framing_smuggling_vectors_rejected():
    """Hand-rolled HTTP framing must refuse the classic desync primitives
    rather than silently mis-framing (review r3 continuation): a chunked
    request body this server doesn't support would otherwise parse as the
    NEXT request on the connection (501 + close); duplicate conflicting
    Content-Length and obs-fold continuations 400 + close (RFC 7230
    3.3.3 / 3.2.4)."""
    from smalltts_tpu.serving.server import TTSServer
    from smalltts_tpu.serving.x402 import X402Config

    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"))
    port, loop = _start_server(server)

    def raw(req: bytes) -> bytes:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(req)
        s.settimeout(5)
        buf = b""
        while True:
            piece = s.recv(4096)
            if not piece:
                break
            buf += piece
        s.close()
        return buf

    try:
        # transfer-encoding: 501, connection closed, and the smuggled
        # "request" hidden in the chunked body is NEVER answered
        resp = raw(b"POST /synthesize HTTP/1.1\r\nhost: x\r\n"
                   b"transfer-encoding: chunked\r\n\r\n"
                   b"5\r\nAAAAA\r\n0\r\n\r\n"
                   b"GET /health HTTP/1.1\r\nhost: x\r\n\r\n")
        assert resp.startswith(b"HTTP/1.1 501"), resp[:60]
        assert resp.count(b"HTTP/1.1") == 1, "desync: second request answered"

        # conflicting duplicate content-length: 400 + close
        resp = raw(b"POST /synthesize HTTP/1.1\r\nhost: x\r\n"
                   b"content-length: 5\r\ncontent-length: 0\r\n\r\nAAAAA")
        assert resp.startswith(b"HTTP/1.1 400"), resp[:60]
        assert resp.count(b"HTTP/1.1") == 1

        # obs-fold header continuation: 400 + close
        resp = raw(b"GET /health HTTP/1.1\r\nhost: x\r\n"
                   b"x-thing: a\r\n b\r\n\r\n")
        assert resp.startswith(b"HTTP/1.1 400"), resp[:60]

        # repeated IDENTICAL content-length stays accepted (RFC allows it)
        resp = raw(b"GET /health HTTP/1.1\r\nhost: x\r\n"
                   b"content-length: 0\r\ncontent-length: 0\r\n"
                   b"connection: close\r\n\r\n")
        assert resp.startswith(b"HTTP/1.1 200"), resp[:60]
    finally:
        loop.call_soon_threadsafe(loop.stop)
