"""x402 "local" verification mode: facilitator-free, in-process EIP-3009.

Beyond the reference (its server can only delegate verification to an
external facilitator, src/server/src/main.rs:60-79): `X402Gate(mode=
"local")` recovers the EIP-712 signer with serving/eth.py and enforces
recipient / value / validity window / nonce uniqueness itself — payment
gating works in zero-egress deployments. The client side of the same
contract is `X402Gate.sign_payment` (mirrors website/index.html's
signPayment, burner-wallet path included).
"""

import asyncio
import base64
import json

import pytest

from smalltts_tpu.serving import eth
from smalltts_tpu.serving.x402 import X402Config, X402Gate, price_for_duration

PRIV = 0xD15C0

PAY_TO = "0xBAc675C310721717Cd4A37F6cbeA1F081b1C2a07"


def make_gate(**kw):
    return X402Gate(X402Config(mode="local", pay_to=PAY_TO, **kw))


def challenge_accept(gate, duration=5.0):
    hdr = gate.payment_required_header(duration, "/synthesize")
    return json.loads(base64.b64decode(hdr))["accepts"][0]


def test_signed_payment_reserved_at_check_burned_at_settle():
    """check() RESERVES the nonce (a concurrent duplicate of an in-flight
    payment denies immediately — one payment must not authorize unbounded
    parallel synthesis, review r3); release() frees it after a failed
    request so sequential retry works; settle() burns it for good."""
    gate = make_gate()
    payment = gate.sign_payment(PRIV, challenge_accept(gate))
    ok, challenge = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert ok and challenge is None
    # concurrent duplicate while in flight: denied BEFORE any work
    ok_dup, _ = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert not ok_dup
    # the request failed (e.g. 503): release frees the reservation, and the
    # same signed payment retries cleanly
    gate.release(payment)
    ok_retry, _ = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert ok_retry
    # settle-after-serve consumes the nonce
    assert gate.settles
    receipt = gate.settle(payment, 5.0)
    assert json.loads(base64.b64decode(receipt))["success"] is True
    # release after settle is a harmless no-op; replay stays denied
    gate.release(payment)
    ok2, challenge2 = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert not ok2 and challenge2
    assert gate.settle(payment, 5.0) is None


def test_replay_under_reencoded_nonce_denied():
    """The replay set must key on the canonical 32-byte nonce, not its hex
    spelling: '0x01..', '01..' (no prefix), and whitespace-embedded forms
    all hash to the same EIP-712 digest (eth._hexbytes tolerates them), so
    a string-keyed set would let one payment replay (review r3, confirmed
    exploitable before the fix)."""
    gate = make_gate()
    payment = gate.sign_payment(PRIV, challenge_accept(gate))
    assert gate.settle(payment, 5.0) is not None  # burns the nonce

    env = json.loads(base64.b64decode(payment))
    nonce_hex = env["payload"]["authorization"]["nonce"]
    for respelled in (
        nonce_hex[2:],                      # strip 0x
        nonce_hex.upper(),                  # case change
        "0x" + " ".join(nonce_hex[2:][i:i + 2]
                        for i in range(0, 64, 2)),  # fromhex skips whitespace
    ):
        env["payload"]["authorization"]["nonce"] = respelled
        replay = base64.b64encode(json.dumps(env).encode()).decode()
        ok, _ = gate.check({"x-payment": replay}, 5.0, "/synthesize")
        assert not ok, f"replay accepted under nonce spelling {respelled!r}"


def test_no_payment_emits_challenge_with_domain_extra():
    gate = make_gate()
    ok, challenge = gate.check({}, 5.0, "/synthesize")
    assert not ok
    accept = json.loads(base64.b64decode(challenge))["accepts"][0]
    assert accept["extra"] == {"name": "USD Coin", "version": "2"}


def test_underpayment_denied():
    gate = make_gate()
    accept = challenge_accept(gate, duration=2.0)  # priced for 2 s
    payment = gate.sign_payment(PRIV, accept)
    ok, _ = gate.check({"x-payment": payment}, 30.0, "/synthesize")
    assert not ok  # value < price(30 s)
    assert int(accept["maxAmountRequired"]) < price_for_duration(30.0)


def test_wrong_recipient_denied():
    gate = make_gate()
    accept = challenge_accept(gate)
    accept["payTo"] = eth.address_from_priv(0xEE)  # attacker redirects
    payment = gate.sign_payment(PRIV, accept)
    ok, _ = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert not ok


def test_expired_and_not_yet_valid_denied():
    gate = make_gate()
    accept = challenge_accept(gate)
    expired = gate.sign_payment(PRIV, accept, now=0)  # validBefore = 300
    ok, _ = gate.check({"x-payment": expired}, 5.0, "/synthesize")
    assert not ok

    payment = gate.sign_payment(PRIV, accept)
    env = json.loads(base64.b64decode(payment))
    env["payload"]["authorization"]["validAfter"] = str(2 ** 40)  # far future
    tampered = base64.b64encode(json.dumps(env).encode()).decode()
    ok, _ = gate.check({"x-payment": tampered}, 5.0, "/synthesize")
    assert not ok  # also: edit broke the signature anyway


def test_tampered_value_denied():
    """Signature covers the authorization: raising value after signing (to
    satisfy a higher price) must fail recovery."""
    gate = make_gate()
    payment = gate.sign_payment(PRIV, challenge_accept(gate, duration=2.0))
    env = json.loads(base64.b64decode(payment))
    env["payload"]["authorization"]["value"] = str(10 ** 9)
    tampered = base64.b64encode(json.dumps(env).encode()).decode()
    ok, _ = gate.check({"x-payment": tampered}, 30.0, "/synthesize")
    assert not ok


def test_malleated_signature_denied():
    """ECDSA malleability: (r, N-s, v^1) recovers the SAME signer, but
    USDC's on-chain ECRecover rejects high-s (EIP-2) and v outside {27,28}
    — accepting it locally would serve compute against an authorization the
    chain won't capture. Local verify must enforce the on-chain shape."""
    from smalltts_tpu.serving import eth

    gate = make_gate()
    accept = challenge_accept(gate, duration=2.0)
    payment = gate.sign_payment(PRIV, accept)
    env = json.loads(base64.b64decode(payment))
    sig = bytes.fromhex(env["payload"]["signature"][2:])
    r, s, v = sig[:32], int.from_bytes(sig[32:64], "big"), sig[64]
    mall = r + (eth.N - s).to_bytes(32, "big") + bytes([55 - v])  # 27<->28

    # the malleated signature IS cryptographically valid for the same signer
    typed = gate.build_typed_data(env["payload"]["authorization"])
    assert eth.recover_typed_data(typed, "0x" + mall.hex()) == \
        eth.address_from_priv(PRIV)

    env["payload"]["signature"] = "0x" + mall.hex()
    malleated = base64.b64encode(json.dumps(env).encode()).decode()
    ok, _ = gate.check({"x-payment": malleated}, 2.0, "/synthesize")
    assert not ok, "high-s/flipped-v signature must be denied (uncapturable)"

    # the original, low-s spelling still verifies (and wasn't burned by the
    # denied attempt)
    ok, _ = gate.check({"x-payment": payment}, 2.0, "/synthesize")
    assert ok
    gate.release(payment)


def test_unsigned_trust_envelope_denied_in_local_mode():
    unsigned = base64.b64encode(json.dumps({
        "x402Version": 1, "scheme": "exact", "network": "eip155:8453",
        "payload": {},
    }).encode()).decode()
    ok, _ = make_gate().check({"x-payment": unsigned}, 1.0, "/synthesize")
    assert not ok


def test_wrong_network_denied():
    gate = make_gate()
    accept = challenge_accept(gate)
    accept["network"] = "eip155:1"  # signed for mainnet-ethereum instead
    payment = gate.sign_payment(PRIV, accept)
    ok, _ = gate.check({"x-payment": payment}, 5.0, "/synthesize")
    assert not ok


def test_garbage_payloads_fail_closed():
    gate = make_gate()
    for bad in ["", "!!!", base64.b64encode(b"not json").decode(),
                base64.b64encode(b"{}").decode()]:
        ok, _ = gate.check({"x-payment": bad}, 1.0, "/synthesize")
        assert not ok


def test_capture_file_archives_settled_authorizations(tmp_path):
    cap = tmp_path / "auths.jsonl"
    gate = make_gate(capture_path=str(cap))
    for i in range(2):
        payment = gate.sign_payment(PRIV, challenge_accept(gate))
        ok, _ = gate.check({"x-payment": payment}, 5.0, "/synthesize")
        assert ok
        # check() never archives — only settle() does
        assert not cap.exists() or len(cap.read_text().splitlines()) == i
        assert gate.settle(payment, 5.0) is not None
    lines = [json.loads(l) for l in cap.read_text().splitlines()]
    assert len(lines) == 2
    for rec in lines:
        assert rec["authorization"]["to"] == PAY_TO
        assert rec["signature"].startswith("0x")
        # archived record is sufficient to re-verify (operator can submit
        # transferWithAuthorization on-chain later)
        typed = gate.build_typed_data(rec["authorization"])
        assert eth.recover_typed_data(typed, rec["signature"]) == (
            eth.address_from_priv(PRIV))


def test_nonce_set_is_bounded():
    from smalltts_tpu.serving import x402 as x402_mod

    gate = make_gate()
    accept = challenge_accept(gate)
    old_cap = x402_mod._NONCE_CAP
    x402_mod._NONCE_CAP = 4
    try:
        for i in range(8):
            payment = gate.sign_payment(PRIV, accept,
                                        nonce=i.to_bytes(32, "big"))
            assert gate.settle(payment, 5.0) is not None
        assert len(gate._seen_nonces) == 4
    finally:
        x402_mod._NONCE_CAP = old_cap


def test_local_mode_settle_verifies_and_fails_closed():
    """Local mode settles (burn + archive happen there), and settle is a
    full re-verification: garbage or tampered payments return None so the
    caller 402s even after synthesis."""
    gate = make_gate()
    assert gate.settles
    assert gate.settle("x", 1.0) is None  # not a valid envelope
    payment = gate.sign_payment(PRIV, challenge_accept(gate))
    receipt = json.loads(base64.b64decode(gate.settle(payment, 5.0)))
    assert receipt["success"] is True


def test_server_e2e_local_payment(monkeypatch):
    """Full socket round trip in local mode: 402 challenge -> sign with the
    in-repo signer (same contract as the website burner wallet) -> audio."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import urllib.error
    import urllib.request

    import jax

    from tiny import TINY_BACKBONE, TINY_CODEC
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import init_codec
    from smalltts_tpu.serving.server import TTSServer
    from test_serving import make_sine_wav

    tts = SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    server = TTSServer(tts=tts,
                       x402_cfg=X402Config(mode="local", pay_to=PAY_TO),
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

    async def scenario():
        srv = await asyncio.start_server(server._serve_conn, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]

        def requests():
            url = f"http://127.0.0.1:{port}/synthesize?duration=1"
            req = urllib.request.Request(
                url, data=body, method="POST",
                headers={"content-type":
                         f"multipart/form-data; boundary={boundary}"})
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected 402")
            except urllib.error.HTTPError as e:
                assert e.code == 402
                accept = json.loads(
                    base64.b64decode(e.headers["payment-required"]))["accepts"][0]
            payment = server.gate.sign_payment(PRIV, accept)
            req = urllib.request.Request(
                url, data=body, method="POST",
                headers={"content-type":
                         f"multipart/form-data; boundary={boundary}",
                         "x-payment": payment})
            with urllib.request.urlopen(req) as r:
                assert r.status == 200
                assert r.headers["content-type"] == "audio/wav"
                assert r.headers["x-payment-response"]
                audio = r.read()
                assert audio[:4] == b"RIFF"
            # replaying the same payment is denied
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected 402 on replay")
            except urllib.error.HTTPError as e:
                assert e.code == 402

        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, requests)
        srv.close()
        await srv.wait_closed()

    asyncio.run(scenario())
