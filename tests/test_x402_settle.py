"""x402 settlement: verify -> serve -> settle ordering and payload shapes.

The reference's x402-axum middleware verifies AND settles payment around the
handler (reference: src/server/src/main.rs:60-79); round 1 only verified —
funds were never captured (VERDICT item 6). These tests pin the facilitator
wire format (x402 v1: {x402Version, paymentPayload, paymentRequirements})
and the capture-after-serve ordering with a recording fake facilitator.
"""

import base64
import io
import json

import numpy as np
import pytest

from smalltts_tpu.serving.x402 import X402Config, X402Gate


def _payment_header() -> str:
    return base64.b64encode(
        json.dumps(
            {
                "x402Version": 1,
                "scheme": "exact",
                "network": "eip155:8453",
                "payload": {"signature": "0x" + "ab" * 65, "authorization": {}},
            }
        ).encode()
    ).decode()


class RecordingFacilitator:
    """Fake urllib.urlopen capturing every facilitator call."""

    def __init__(self, verify_ok=True, settle_ok=True):
        self.calls = []  # (endpoint, parsed_body)
        self.verify_ok = verify_ok
        self.settle_ok = settle_ok

    def __call__(self, req, timeout=0):
        endpoint = req.full_url.rsplit("/", 1)[-1]
        body = json.loads(req.data)
        self.calls.append((endpoint, body))
        if endpoint == "verify":
            resp = {"isValid": self.verify_ok, "invalidReason": None}
        else:
            resp = {
                "success": self.settle_ok,
                "transaction": "0x" + "11" * 32,
                "network": "eip155:8453",
                "payer": "0x" + "22" * 20,
            }

        out = io.BytesIO(json.dumps(resp).encode())
        out.__enter__ = lambda *a: out
        out.__exit__ = lambda *a: False
        return out


@pytest.fixture
def facilitator(monkeypatch):
    fake = RecordingFacilitator()
    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake)
    return fake


def test_verify_body_wire_format(facilitator):
    gate = X402Gate(X402Config(mode="facilitator"))
    assert gate.check({"x-payment": _payment_header()}, 5.0, "/synthesize")[0]
    endpoint, body = facilitator.calls[0]
    assert endpoint == "verify"
    assert body["x402Version"] == 1
    assert body["paymentPayload"]["scheme"] == "exact"
    req = body["paymentRequirements"]
    # the requirements the facilitator checks the signature against
    assert req["scheme"] == "exact"
    assert req["network"] == "eip155:8453"
    assert req["maxAmountRequired"] == str(5 * 167)
    assert req["payTo"].startswith("0x")
    assert req["asset"] == "0x833589fCD6eDb6E08f4c7C32D4f71b54bdA02913"
    assert req["maxTimeoutSeconds"] == 300


def test_settle_body_matches_verify_body(facilitator):
    gate = X402Gate(X402Config(mode="facilitator"))
    hdr = _payment_header()
    gate.check({"x-payment": hdr}, 2.0, "/synthesize")
    receipt = gate.settle(hdr, 2.0)
    assert receipt is not None
    assert [e for e, _ in facilitator.calls] == ["verify", "settle"]
    verify_body, settle_body = facilitator.calls[0][1], facilitator.calls[1][1]
    assert settle_body == verify_body  # same payload + requirements per spec
    decoded = json.loads(base64.b64decode(receipt))
    assert decoded["success"] is True
    assert decoded["transaction"].startswith("0x")


def test_settle_fails_closed(monkeypatch):
    fake = RecordingFacilitator(settle_ok=False)
    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake)
    gate = X402Gate(X402Config(mode="facilitator"))
    assert gate.settle(_payment_header(), 1.0) is None


def test_settle_network_error_fails_closed(monkeypatch):
    import urllib.request

    def broken(req, timeout=0):
        raise OSError("no route to facilitator")

    monkeypatch.setattr(urllib.request, "urlopen", broken)
    gate = X402Gate(X402Config(mode="facilitator"))
    assert gate.settle(_payment_header(), 1.0) is None


def test_trust_mode_returns_stub_receipt():
    gate = X402Gate(X402Config(mode="trust"))
    receipt = gate.settle(_payment_header(), 1.0)
    assert json.loads(base64.b64decode(receipt))["success"] is True
    assert not gate.settles


def test_server_end_to_end_verify_serve_settle(monkeypatch):
    """Full handler: verified payment -> synthesis -> settlement -> 200 with
    X-PAYMENT-RESPONSE; failed settlement -> 402 after serving."""
    import asyncio

    import jax

    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from smalltts_tpu.serving.server import TTSServer
    from tests.tiny import TINY_BACKBONE, TINY_CODEC

    fake = RecordingFacilitator()
    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake)

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts, x402_cfg=X402Config(mode="facilitator"),
                       tokenizer=lambda t: [1, 2, 3])

    # minimal 16-bit wav
    import struct

    sr = 24_000
    pcm = (np.sin(np.linspace(0, 50, sr)) * 20000).astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    boundary = "XB"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"\r\n\r\n'
    ).encode() + wav + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="text"\r\n\r\nhi\r\n'
        f"--{boundary}--\r\n"
    ).encode()
    headers = {
        "content-type": f"multipart/form-data; boundary={boundary}",
        "x-payment": _payment_header(),
    }

    loop = asyncio.new_event_loop()
    try:
        status, hdrs, out = loop.run_until_complete(
            server.handle("POST", "/synthesize", {"duration": "1.0"}, headers, body)
        )
        assert status == 200, out
        assert [e for e, _ in fake.calls] == ["verify", "settle"]
        assert "x-payment-response" in dict(hdrs)
        receipt = json.loads(base64.b64decode(dict(hdrs)["x-payment-response"]))
        assert receipt["success"] is True

        # settlement failure after serving -> 402, no receipt
        fake.settle_ok = False
        fake.calls.clear()
        status, hdrs, out = loop.run_until_complete(
            server.handle("POST", "/synthesize", {"duration": "1.0"}, headers, body)
        )
        assert status == 402
        assert b"settlement failed" in out
        assert [e for e, _ in fake.calls] == ["verify", "settle"]
    finally:
        if server._batcher:
            server._batcher.close()
        loop.close()
