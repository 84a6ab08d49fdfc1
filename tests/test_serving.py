"""HTTP/x402 contract tests mirroring the reference e2e suite
(reference: src/server/tests/e2e.rs:87-315) plus an end-to-end synthesize
through the continuous batcher on a tiny model."""

import asyncio
import base64
import json

import numpy as np
import pytest

from smalltts_tpu.serving.audio_io import decode_wav, encode_wav
from smalltts_tpu.serving.multipart import parse_multipart
from smalltts_tpu.serving.server import TTSServer
from smalltts_tpu.serving.x402 import X402Config, price_for_duration


def make_sine_wav(seconds=1.0, sr=24_000, freq=440.0) -> bytes:
    t = np.arange(int(seconds * sr)) / sr
    return encode_wav(0.5 * np.sin(2 * np.pi * freq * t), sr)


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


@pytest.fixture()
def gated_server():
    return TTSServer(tts=object(), x402_cfg=X402Config(mode="trust"))


def test_health_returns_ok(gated_server):
    status, _, body = run(gated_server.handle("GET", "/health", {}, {}, b""))
    assert status == 200 and body == b"ok"


def test_health_not_payment_gated(gated_server):
    # no payment header, still 200 (e2e.rs:276-289)
    status, _, _ = run(gated_server.handle("GET", "/health", {}, {}, b""))
    assert status == 200


def test_unpaid_synthesize_402(gated_server):
    status, headers, body = run(
        gated_server.handle("POST", "/synthesize", {"duration": "5"}, {}, b"")
    )
    assert status == 402
    assert body == b""  # 402 without body (e2e.rs:241-253)


def test_402_payment_required_header_contents(gated_server):
    status, headers, _ = run(
        gated_server.handle("POST", "/synthesize", {"duration": "5"}, {}, b"")
    )
    hdrs = dict(headers)
    assert "payment-required" in hdrs
    payload = json.loads(base64.b64decode(hdrs["payment-required"]))
    accept = payload["accepts"][0]
    assert accept["scheme"] == "exact"
    assert accept["network"].startswith("eip155")
    assert accept["payTo"].startswith("0x")
    assert int(accept["maxAmountRequired"]) == price_for_duration(5.0)


def test_price_scales_linearly_with_duration():
    # e2e.rs:181-239
    assert price_for_duration(60.0) == 10_020  # ~$0.01/min at 167/s
    p2, p4, p8 = (price_for_duration(d) for d in (2, 4, 8))
    assert p4 == 2 * p2 and p8 == 4 * p2
    assert price_for_duration(0.01) == price_for_duration(0.1)  # clamp


def test_wav_fixture_validity():
    wav = make_sine_wav(0.5)
    samples, sr = decode_wav(wav)
    assert sr == 24_000
    assert samples.shape[1] == 12_000
    assert np.abs(samples).max() <= 1.0
    assert np.abs(samples).max() > 0.4


def test_discovery_json(gated_server):
    status, headers, body = run(
        gated_server.handle("GET", "/.well-known/x402", {}, {}, b"")
    )
    assert status == 200
    doc = json.loads(body)
    assert doc["version"] == 1
    assert any(r.endswith("/synthesize") for r in doc["resources"])
    assert "instructions" in doc


def test_paid_request_passes_gate_in_trust_mode(gated_server):
    status, _, body = run(
        gated_server.handle(
            "POST", "/synthesize", {"duration": "2"},
            {"x-payment": base64.b64encode(b"{}").decode()}, b"",
        )
    )
    # passes the gate, fails multipart validation (no model touched)
    assert status == 400
    assert b"multipart" in body


def test_multipart_parser():
    boundary = "XBOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        "hello world\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"; filename="a.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
    ).encode() + b"\x00\x01\x02" + f"\r\n--{boundary}--\r\n".encode()
    fields = parse_multipart(body, f'multipart/form-data; boundary="{boundary}"')
    assert fields["text"] == b"hello world"
    assert fields["audio"] == b"\x00\x01\x02"


def test_end_to_end_synthesize_through_batcher():
    """Full request path: wav in -> latents -> batched sampler -> wav out."""
    import jax

    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda text: [1, 2, 3, 4])

    boundary = "XB"
    wav = make_sine_wav(0.6)
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\n'
        "hi\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    status, headers, out = run(
        server.handle(
            "POST", "/synthesize", {"duration": "1.0"},
            {"content-type": f"multipart/form-data; boundary={boundary}"}, body,
        )
    )
    assert status == 200, out
    assert dict(headers)["content-type"] == "audio/wav"
    samples, sr = decode_wav(out)
    assert sr == 24_000
    assert samples.shape[1] == 8 * 3200  # ceil(1.0s * 7.5) = 8 frames
    server._batcher.close()


def test_facilitator_mode_verifies_payment(monkeypatch):
    """facilitator mode POSTs the payment for verification; the gate honors
    the isValid verdict (and fails closed on network errors)."""
    import io
    import urllib.request

    from smalltts_tpu.serving.x402 import X402Gate

    gate = X402Gate(X402Config(mode="facilitator"))
    calls = {}

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=0):
        calls["url"] = req.full_url
        calls["body"] = json.loads(req.data)
        return FakeResp(json.dumps({"isValid": calls.get("valid", True)}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    payment = base64.b64encode(json.dumps({"sig": "0xabc"}).encode()).decode()

    ok, challenge = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert ok and challenge is None
    assert calls["url"].endswith("/verify")
    assert calls["body"]["paymentRequirements"]["maxAmountRequired"] == str(
        price_for_duration(5.0)
    )

    calls["valid"] = False
    ok, challenge = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert not ok and challenge

    def broken(req, timeout=0):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", broken)
    ok, challenge = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert not ok  # fails closed


def test_socket_transport_health_and_402():
    """Real asyncio socket round-trip: HTTP parsing, 402 header, keep-alive."""
    import urllib.error
    import urllib.request

    async def scenario():
        server = TTSServer(tts=object(), x402_cfg=X402Config(mode="trust"))
        srv = await asyncio.start_server(server._serve_conn, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]

        def requests():
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
                assert r.status == 200 and r.read() == b"ok"
            try:
                urllib.request.urlopen(
                    urllib.request.Request(
                        f"http://127.0.0.1:{port}/synthesize?duration=3",
                        data=b"", method="POST",
                    )
                )
                raise AssertionError("expected 402")
            except urllib.error.HTTPError as e:
                assert e.code == 402
                assert e.headers["payment-required"]
                assert e.read() == b""

        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, requests)
        srv.close()
        await srv.wait_closed()

    run(scenario())


def test_socket_synthesize_end_to_end():
    """Full HTTP round-trip over a real socket: multipart wav+text in,
    audio/wav out, through the tiny model + continuous batcher."""
    import urllib.request

    import jax

    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda text: [1, 2, 3])

    async def scenario():
        srv = await asyncio.start_server(server._serve_conn, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]

        def request():
            boundary = "XB"
            wav = make_sine_wav(0.6)
            body = (
                f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="audio"\r\n\r\n'
            ).encode() + wav + (
                f"\r\n--{boundary}\r\n"
                'Content-Disposition: form-data; name="text"\r\n\r\nhi\r\n'
                f"--{boundary}--\r\n"
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize?duration=1.0",
                data=body,
                headers={"content-type": f"multipart/form-data; boundary={boundary}"},
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                assert resp.status == 200
                assert resp.headers["content-type"] == "audio/wav"
                out = resp.read()
            samples, sr = decode_wav(out)
            assert sr == 24_000 and samples.shape[1] == 8 * 3200
            # stats endpoint reflects the request
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as resp:
                stats = json.loads(resp.read())
            assert stats["requests"] == 1 and stats["synth_ms_p50"] > 0

        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, request)
        srv.close()
        await srv.wait_closed()

    run(scenario())
    if server._batcher:
        server._batcher.close()


def test_batcher_groups_by_bucket():
    from smalltts_tpu.serving.batcher import Request, group_requests, pad_group

    reqs = [Request(np.zeros((8, 64), np.float32), [1, 2], d) for d in (1.0, 1.1, 9.0)]
    groups = group_requests(reqs)
    buckets = sorted(max(r.t_bucket for r in g) for g in groups)
    assert buckets == [16, 80]  # 1.0/1.1s share a bucket; 9s separate
    # multi-request groups pad the batch dim to max_batch (two batch classes
    # — 1 and max_batch — keep the warmup contract small)
    ref, ref_lens, ph, ph_lens, seq_lens, t_bucket, b_bucket = pad_group(
        groups[0], max_batch=8
    )
    assert ref.shape[0] == b_bucket == 8
    assert t_bucket == 16
    assert ref.shape[1] == 64  # smallest SERVING_REF_BUCKET


def test_reference_latents_lru_cache():
    """Repeated reference audio skips the encode round trip (content-hash
    LRU); distinct audio misses; the cache stays bounded."""
    import jax

    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda text: [1, 2, 3], ref_cache_size=2)

    def req(freq):
        boundary = "XB"
        wav = make_sine_wav(0.6, freq=freq)
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="audio"\r\n\r\n'
        ).encode() + wav + (
            f"\r\n--{boundary}\r\n"
            'Content-Disposition: form-data; name="text"\r\n\r\nhi\r\n'
            f"--{boundary}--\r\n"
        ).encode()
        status, _, out = run(server.handle(
            "POST", "/synthesize", {"duration": "1.0"},
            {"content-type": f"multipart/form-data; boundary={boundary}"}, body,
        ))
        assert status == 200, out

    req(440.0)
    req(440.0)   # hit
    req(880.0)   # miss
    req(220.0)   # miss -> evicts 440
    req(440.0)   # miss again (evicted)
    assert server.stats.ref_cache_hits == 1
    assert server.stats.ref_cache_misses == 4
    assert len(server._ref_cache) == 2
    server._batcher.close()


def test_reference_cache_coalesces_concurrent_misses():
    """A burst of requests sharing a cold voice runs ONE encode; the rest
    wait on the in-flight Future instead of paying their own round trip."""
    import threading
    import time as _time

    calls = {"n": 0}

    class _TTS:
        def encode_reference(self, samples):
            calls["n"] += 1
            _time.sleep(0.1)
            return np.full((4, 64), 7.0, np.float32)

    server = TTSServer(tts=_TTS(), x402_cfg=X402Config(mode="disabled"))
    samples = np.ones((2400,), np.float32)
    out = [None] * 6

    def worker(i):
        out[i] = server._encode_reference_cached(samples)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert calls["n"] == 1, calls
    assert all(o is not None and o[0, 0] == 7.0 for o in out)
    assert server.stats.ref_cache_misses == 1
    assert server.stats.ref_cache_hits == 5


def test_metrics_prometheus_exposition():
    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"))
    server.stats.requests = 3
    server.stats.ref_cache_hits = 2
    server.stats.synth_ms.extend([10.0, 20.0, 30.0])
    status, headers, body = run(server.handle("GET", "/metrics", {}, {}, b""))
    assert status == 200
    assert dict(headers)["content-type"].startswith("text/plain")
    text = body.decode()
    assert "smalltts_requests_total 3" in text
    assert "smalltts_ref_cache_hits_total 2" in text
    assert 'smalltts_synth_ms{quantile="0.5"} 20.0' in text


def test_multipart_parser_hostile_inputs_never_crash():
    """Property: parse_multipart either returns a dict or raises ValueError —
    no other exception, no hang — for arbitrary hostile bytes (the request
    body is fully attacker-controlled up to the 2 MiB cap)."""
    rng = np.random.RandomState(0)
    hostile = [
        (b"", "multipart/form-data"),                      # no boundary at all
        (b"", 'multipart/form-data; boundary=""'),
        (b"--B\r\n\r\n", "multipart/form-data; boundary=B"),
        (b"--B\r\nContent-Disposition: form-data\r\n\r\nx--B--", 
         "multipart/form-data; boundary=B"),               # part without name
        (b"--B--", "multipart/form-data; boundary=B"),     # empty envelope
        (b"\xff" * 4096, "multipart/form-data; boundary=B"),
        (b"--B\r\n" * 500, "multipart/form-data; boundary=B"),  # many headers
        (("--B\r\nContent-Disposition: form-data; name=\"" + "a" * 10_000
          + "\"\r\n\r\nv\r\n--B--").encode(),
         "multipart/form-data; boundary=B"),               # giant field name
    ]
    for _ in range(50):  # random garbage, some containing the boundary
        blob = rng.bytes(rng.randint(1, 2048))
        if rng.rand() < 0.5:
            blob = blob.replace(b"\x00", b"--B")
        hostile.append((blob, "multipart/form-data; boundary=B"))
    for body, ctype in hostile:
        try:
            fields = parse_multipart(body, ctype)
        except ValueError:
            continue
        assert isinstance(fields, dict)
        for k, v in fields.items():
            assert isinstance(k, str) and isinstance(v, bytes)


def test_graceful_drain_finishes_inflight_then_rejects():
    """shutdown() must let an in-flight request finish (its coroutine still
    needs the executor pool after resuming) while rejecting stragglers that
    arrive past the /ready flip."""
    import asyncio
    import threading
    import time as _time

    class _SlowTTS:
        def synthesize_padded(self, ref, ref_lens, ph, ph_lens, seq_lens,
                              t_bucket, key=None, fetch=True):
            _time.sleep(0.3)
            return np.zeros((ref.shape[0], 1, int(t_bucket) * 3200), np.float32)

        def encode_reference(self, samples):
            return np.zeros((4, 64), np.float32)

    server = TTSServer(tts=_SlowTTS(), x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda t: [1, 2, 3])
    boundary = "XB"
    wav = make_sine_wav(0.3)
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\nhi\r\n'
        f"--{boundary}--\r\n"
    ).encode()
    ctype = {"content-type": f"multipart/form-data; boundary={boundary}"}

    async def scenario():
        inflight = asyncio.create_task(server.handle(
            "POST", "/synthesize", {"duration": "1.0"}, dict(ctype), body))
        await asyncio.sleep(0.05)  # let it enter the pipeline
        drain = asyncio.create_task(server.shutdown())
        await asyncio.sleep(0.05)
        late_status, _, late_body = await server.handle(
            "POST", "/synthesize", {"duration": "1.0"}, dict(ctype), body)
        status, _, out = await inflight
        await drain
        return status, late_status, late_body

    status, late_status, late_body = run(scenario())
    assert status == 200, "in-flight request must complete through the drain"
    assert late_status == 503 and late_body == b"draining"


def test_multipart_preserves_trailing_crlf_bytes_in_binary_content():
    """A WAV whose final PCM bytes are 0x0D/0x0A must come through intact —
    only the single delimiting CRLF is framing (review r3: strip() ate
    trailing CR/LF content bytes, corrupting ~1/128 of uploads)."""
    from smalltts_tpu.serving.multipart import build_multipart, parse_multipart

    payload = b"\x00\x01RIFFdata\x00\x0d\x0a"  # ends in CR LF on purpose
    body, ctype = build_multipart({"audio": payload, "text": "hi"})
    fields = parse_multipart(body, ctype)
    assert fields["audio"] == payload
    assert fields["text"] == b"hi"

    # hand-framed body (the e2e shape used across the tests)
    raw = (b"--XB\r\n"
           b'Content-Disposition: form-data; name="audio"\r\n\r\n'
           + payload +
           b"\r\n--XB\r\n"
           b'Content-Disposition: form-data; name="text"\r\n\r\n'
           b"hello\r\n--XB--\r\n")
    fields = parse_multipart(raw, 'multipart/form-data; boundary=XB')
    assert fields["audio"] == payload
    assert fields["text"] == b"hello"


def test_static_serving_index_samples_and_traversal(tmp_path):
    """With static_dir set, GET / serves index.html same-origin (the web
    client then needs no SMALLTTS_API config); /samples/* serves assets;
    ../ and symlink escapes 404; without static_dir GET / stays 404."""
    (tmp_path / "index.html").write_text("<html>client</html>")
    (tmp_path / "samples").mkdir()
    (tmp_path / "samples" / "index.json").write_text('{"samples": []}')
    (tmp_path / ".." / "secret.txt").write_text("nope")

    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"),
                       static_dir=str(tmp_path))
    st, hdrs, body = run(server.handle("GET", "/", {}, {}, b""))
    assert st == 200 and body == b"<html>client</html>"
    assert ("content-type", "text/html; charset=utf-8") in hdrs

    st, hdrs, body = run(server.handle("GET", "/samples/index.json", {}, {}, b""))
    assert st == 200 and json.loads(body) == {"samples": []}
    assert ("content-type", "application/json") in hdrs

    for evil in ("/../secret.txt", "/samples/../../secret.txt", "/nope.html"):
        st, _, _ = run(server.handle("GET", evil, {}, {}, b""))
        assert st == 404, evil

    bare = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"))
    st, _, _ = run(bare.handle("GET", "/", {}, {}, b""))
    assert st == 404


def test_nonfinite_and_nonpositive_durations_rejected_400():
    """float('nan')/'inf' parse, then math.ceil(nan) would detonate on the
    batcher dispatch thread and strand every queued request — one
    unauthenticated request must never brick synthesis (review r3)."""
    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"))
    for bad in ("nan", "inf", "-inf", "-1", "0"):
        status, _, body = run(server.handle(
            "POST", "/synthesize", {"duration": bad},
            {"content-type": "multipart/form-data; boundary=X"}, b"--X--"))
        assert status == 400, (bad, status, body)


def test_batcher_grouping_error_fails_futures_keeps_thread_alive():
    """A poisoned request must fail ITS batch and leave the dispatch thread
    serving later requests (it used to kill the daemon thread and strand
    every queued future, review r3)."""
    import numpy as np

    from smalltts_tpu.serving.batcher import Batcher

    class _TTS:
        def synthesize_padded(self, ref, *a, **k):
            return np.zeros((ref.shape[0], 1, 3200), np.float32)

    b = Batcher(_TTS(), max_batch=2)
    try:
        ref = np.zeros((4, 64), np.float32)
        bad = b.submit(ref, [1, 2], float("nan"))  # t_bucket raises in _run
        try:
            bad.result(timeout=10)
            raise AssertionError("nan-duration future must fail")
        except (ValueError, OverflowError):
            pass
        good = b.submit(ref, [1, 2], 1.0)  # thread must still be alive
        assert good.result(timeout=10).shape[-1] >= 3200
    finally:
        b.close()


def test_multipart_name_after_filename_parses_correct_field():
    """RFC 7578 mandates no attribute order: filename before name must not
    capture 'clip.wav' as the field name (review r3)."""
    from smalltts_tpu.serving.multipart import parse_multipart

    raw = (b"--XB\r\n"
           b'Content-Disposition: form-data; filename="clip.wav"; name="audio"\r\n'
           b"Content-Type: audio/wav\r\n\r\n"
           b"RIFFdata\r\n--XB--\r\n")
    fields = parse_multipart(raw, "multipart/form-data; boundary=XB")
    assert fields == {"audio": b"RIFFdata"}


def test_duration_beyond_bucket_cap_rejected_before_payment():
    """pick_bucket clamps to the largest latent bucket, so a 60 s request
    would deliver 32 s while x402 charged for 60 (review r3) — reject at
    the edge, BEFORE the payment check, pointing at the streaming endpoint."""
    from smalltts_tpu.data.bucketing import HOP_SIZE, LATENT_BUCKETS

    max_sec = LATENT_BUCKETS[-1] * HOP_SIZE / 24_000
    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="local"))
    status, _, body = run(server.handle(
        "POST", "/synthesize", {"duration": str(max_sec * 2)},
        {"content-type": "multipart/form-data; boundary=X"}, b"--X--"))
    assert status == 400 and b"stream" in body
    # at the cap exactly: proceeds to the payment check (402 in local mode)
    status, hdrs, _ = run(server.handle(
        "POST", "/synthesize", {"duration": str(max_sec)},
        {"content-type": "multipart/form-data; boundary=X"}, b"--X--"))
    assert status == 402


def test_openai_speech_endpoint(tmp_path):
    """POST /v1/audio/speech: OpenAI TTS wire shape -> WAV with a named
    voice from --voices (npy latents and lazily-encoded wav clips);
    /v1/voices lists them; unknown voice/format/body 400."""
    import jax

    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec

    rng = np.random.RandomState(0)
    np.save(tmp_path / "alice.npy", rng.randn(8, 64).astype(np.float32))
    t = np.arange(12000) / 24000.0
    (tmp_path / "bob.wav").write_bytes(
        encode_wav(0.3 * np.sin(2 * np.pi * 200 * t).astype(np.float32), 24000))

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="disabled"),
                       tokenizer=lambda text: [1, 2, 3],
                       voices_dir=str(tmp_path))

    st, hdrs, body = run(server.handle("GET", "/v1/voices", {}, {}, b""))
    assert st == 200 and json.loads(body)["voices"] == ["alice", "bob"]

    def speech(payload):
        return run(server.handle("POST", "/v1/audio/speech", {}, {},
                                 json.dumps(payload).encode()))

    for voice in ("alice", "bob"):
        st, hdrs, wav = speech({"model": "anything", "input": "hello world",
                                "voice": voice})
        assert st == 200, (voice, wav[:100])
        assert ("content-type", "audio/wav") in hdrs
        assert wav[:4] == b"RIFF" and len(wav) > 1000

    st, _, body = speech({"input": "x", "voice": "nobody"})
    assert st == 400 and b"available" in body
    st, _, body = speech({"input": "x", "voice": "alice",
                          "response_format": "mp3"})
    assert st == 400 and b"response_format" in body
    st, _, _ = run(server.handle("POST", "/v1/audio/speech", {}, {},
                                 b"not json"))
    assert st == 400
    st, _, _ = speech({"voice": "alice"})  # missing input
    assert st == 400


def test_openai_speech_payment_gated(tmp_path):
    """The OpenAI endpoint prices on estimated duration, names ITSELF in
    the challenge resource, settles after serving, and denies replays."""
    import base64

    rng = np.random.RandomState(1)
    np.save(tmp_path / "v.npy", rng.randn(8, 64).astype(np.float32))

    class _Fast:
        def synthesize_padded(self, ref, *a, **k):
            return np.zeros((ref.shape[0], 1, 8 * 3200), np.float32)

    server = TTSServer(tts=_Fast(), x402_cfg=X402Config(mode="local"),
                       tokenizer=lambda text: [1, 2],
                       voices_dir=str(tmp_path))
    payload = json.dumps({"input": "pay me", "voice": "v"}).encode()

    st, hdrs, _ = run(server.handle("POST", "/v1/audio/speech", {}, {},
                                    payload))
    assert st == 402
    challenge = dict(hdrs)["payment-required"]
    accept = json.loads(base64.b64decode(challenge))["accepts"][0]
    assert accept["resource"].endswith("/v1/audio/speech")

    payment = server.gate.sign_payment(0xF00D, accept)
    st, hdrs, wav = run(server.handle("POST", "/v1/audio/speech", {},
                                      {"x-payment": payment}, payload))
    assert st == 200 and wav[:4] == b"RIFF"
    assert "x-payment-response" in dict(hdrs)
    st, _, _ = run(server.handle("POST", "/v1/audio/speech", {},
                                 {"x-payment": payment}, payload))
    assert st == 402  # nonce burned at settle


def test_failed_request_releases_payment_reservation():
    """A paid request that fails between check and settle (bad multipart)
    must leave the payment retryable — the server releases the check-time
    nonce reservation on every non-success path (review r3)."""
    import base64

    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="local"))
    status, hdrs, _ = run(server.handle(
        "POST", "/synthesize", {"duration": "2.0"},
        {"content-type": "multipart/form-data; boundary=X"}, b"--X--"))
    assert status == 402
    accept = json.loads(base64.b64decode(dict(hdrs)["payment-required"]))[
        "accepts"][0]
    payment = server.gate.sign_payment(0xBEEF, accept)

    # paid but the body is broken multipart -> 400; reservation must free
    headers = {"content-type": "multipart/form-data; boundary=X",
               "x-payment": payment}
    status, _, _ = run(server.handle(
        "POST", "/synthesize", {"duration": "2.0"}, headers, b"--X--"))
    assert status == 400
    ok, _ = server.gate.check(headers, 2.0, "/synthesize")
    assert ok, "failed request must not hold the nonce reservation"
    server.gate.release(payment)  # tidy: undo the probe's own reservation


def test_denied_duplicate_keeps_original_reservation():
    """Only the request that PASSED check owns (and may release) the nonce
    reservation. The first cut released in _synthesize's finally for every
    request, so a concurrent duplicate's 402 freed the in-flight holder's
    reservation — interleaving duplicate/fresh copies of ONE payment
    re-enabled unbounded concurrent synthesis (review r3 continuation)."""
    import base64

    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="local"))
    status, hdrs, _ = run(server.handle(
        "POST", "/synthesize", {"duration": "2.0"},
        {"content-type": "multipart/form-data; boundary=X"}, b"--X--"))
    assert status == 402
    accept = json.loads(base64.b64decode(dict(hdrs)["payment-required"]))[
        "accepts"][0]
    payment = server.gate.sign_payment(0xBEEF, accept)
    headers = {"content-type": "multipart/form-data; boundary=X",
               "x-payment": payment}

    # request A is "in flight": it passed check and holds the reservation
    ok, _ = server.gate.check(headers, 2.0, "/synthesize")
    assert ok

    # duplicate B arrives while A synthesizes: denied, AND its (full server
    # path) completion must not free A's reservation
    status, _, _ = run(server.handle(
        "POST", "/synthesize", {"duration": "2.0"}, headers, b"--X--"))
    assert status == 402
    ok, _ = server.gate.check(headers, 2.0, "/synthesize")
    assert not ok, "denied duplicate must not release the holder's reservation"

    # A finishes (releases): the payment becomes retryable again
    server.gate.release(payment)
    ok, _ = server.gate.check(headers, 2.0, "/synthesize")
    assert ok
    server.gate.release(payment)
