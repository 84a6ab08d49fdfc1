"""Seeded fuzz over the request surface: random bytes must map to clean
HTTP statuses, never exceptions or hangs.

Every parser bug this round fixed (multipart framing, negative
content-length, nan durations, attribute-order confusion) was reachable
from attacker-controlled bytes; this keeps a regression net over the whole
input space. Deterministic (fixed seed) so failures reproduce.
"""

import json
import string

import numpy as np

from smalltts_tpu.serving.multipart import build_multipart, parse_multipart
from smalltts_tpu.serving.server import TTSServer
from smalltts_tpu.serving.x402 import X402Config

OK_STATUSES = {200, 400, 402, 404, 413, 431, 503}


def run(coro):
    import asyncio

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_handle_survives_random_bodies_and_queries():
    rng = np.random.RandomState(0xF0220)
    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="local"))
    paths = ["/synthesize", "/synthesize/stream", "/v1/audio/speech",
             "/health", "/stats", "/.well-known/x402", "/nope"]
    ctypes_ = ["multipart/form-data; boundary=XB", "multipart/form-data",
               "application/json", "", "multipart/form-data; boundary="]
    for i in range(300):
        path = paths[rng.randint(len(paths))]
        method = "POST" if rng.rand() < 0.7 else "GET"
        body = rng.bytes(rng.randint(0, 400))
        q = {}
        if rng.rand() < 0.7:
            q["duration"] = "".join(
                rng.choice(list("0123456789.naife-+eE"))
                for _ in range(rng.randint(1, 8)))
        headers = {"content-type": ctypes_[rng.randint(len(ctypes_))]}
        if rng.rand() < 0.3:
            headers["x-payment"] = "".join(
                rng.choice(list(string.ascii_letters + "=+/"))
                for _ in range(rng.randint(0, 64)))
        status, hdrs, payload = run(
            server.handle(method, path, q, headers, body))
        assert status in OK_STATUSES, (i, method, path, q, status)
        # non-streaming handlers must return bytes, not generators
        if not hasattr(payload, "__anext__"):
            assert isinstance(payload, (bytes, bytearray)), (i, path)


def test_multipart_parser_fuzz_never_crashes_and_roundtrips():
    rng = np.random.RandomState(0xB0D7)
    for i in range(300):
        blob = rng.bytes(rng.randint(0, 600))
        ctype = ("multipart/form-data; boundary=" +
                 "".join(rng.choice(list("ABCdef0-_")) for _ in
                         range(rng.randint(1, 12))))
        try:
            fields = parse_multipart(blob, ctype)
            assert isinstance(fields, dict)
        except ValueError:
            pass  # clean rejection is fine; anything else is a bug

    # and structured round-trips with adversarial contents survive exactly
    for i in range(100):
        audio = rng.bytes(rng.randint(0, 300))
        text = "".join(rng.choice(list(string.printable)) for _ in
                       range(rng.randint(0, 60)))
        body, ctype = build_multipart({"audio": audio, "text": text},
                                      boundary=f"B{i:03d}x")
        fields = parse_multipart(body, ctype)
        assert fields["audio"] == audio
        assert fields["text"].decode("utf-8", "replace") == text


def test_openai_endpoint_fuzz_json_shapes():
    rng = np.random.RandomState(0x0A1)
    server = TTSServer(tts=object(), x402_cfg=X402Config(mode="disabled"))
    shapes = [
        {}, {"input": ""}, {"input": 1}, {"input": None},
        {"input": "x", "voice": 3}, {"input": "x", "response_format": 9},
        {"input": "x", "voice": "../../etc/passwd"},
        {"input": "x" * 10_000}, [], "str", 42, {"voice": "v"},
    ]
    for i, shape in enumerate(shapes):
        status, _, body = run(server.handle(
            "POST", "/v1/audio/speech", {}, {}, json.dumps(shape).encode()))
        assert status in (400, 500, 503), (i, shape, status, body[:80])
    for i in range(100):
        status, _, _ = run(server.handle(
            "POST", "/v1/audio/speech", {}, {},
            rng.bytes(rng.randint(0, 200))))
        assert status == 400, i
