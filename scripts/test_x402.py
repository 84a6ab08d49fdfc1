"""x402 client smoke test: pay a deployed server and save output.wav.

Capability parity with the reference client (reference:
src/server/src/bin/test_x402.rs:8-122): reads SERVER_URL / TEXT / DURATION /
REF_WAV / PRIVATE_KEY from env, POSTs multipart audio+text, handles the 402
challenge, and writes the returned wav. With PRIVATE_KEY set (hex, like the
reference's wallet key, test_x402.rs:59) the client signs a real EIP-3009
TransferWithAuthorization — accepted by `--payments local` servers in-process
and by facilitator deployments on-chain. Without it, an unsigned echo
envelope is sent, which only `--payments trust` servers accept.
"""

from __future__ import annotations

import base64
import json
import os
import sys
import urllib.error
import urllib.request
import uuid

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from smalltts_tpu.serving.audio_io import encode_wav  # noqa: E402


def make_ref_wav() -> bytes:
    t = np.arange(2 * 24_000) / 24_000
    return encode_wav(0.4 * np.sin(2 * np.pi * 220 * t), 24_000)


def main() -> None:
    if sys.argv[1:2] in (["-h"], ["--help"]):
        # env-driven client (reference test_x402.rs parity) — help must not
        # POST anywhere (review r3: --help dialed SERVER_URL)
        print(__doc__.strip())
        print("\nusage: SERVER_URL=... [PRIVATE_KEY=...] [TEXT=...] "
              "[DURATION=...] [REF_WAV=...] python scripts/test_x402.py")
        return
    from smalltts_tpu.serving.multipart import build_multipart

    server = os.environ.get("SERVER_URL", "http://localhost:3000")
    text = os.environ.get("TEXT", "Hello from the x402 smoke test.")
    duration = os.environ.get("DURATION", "3.0")
    ref_path = os.environ.get("REF_WAV")

    audio = open(ref_path, "rb").read() if ref_path else make_ref_wav()
    body, ctype = build_multipart({"audio": audio, "text": text},
                                  boundary=uuid.uuid4().hex)
    url = f"{server}/synthesize?duration={duration}"
    headers = {"content-type": ctype}

    req = urllib.request.Request(url, data=body, headers=headers)
    try:
        resp = urllib.request.urlopen(req, timeout=120)
    except urllib.error.HTTPError as e:
        if e.code != 402:
            raise
        challenge = json.loads(base64.b64decode(e.headers["payment-required"]))
        accept = challenge["accepts"][0]
        print(
            f"402: {accept['maxAmountRequired']} units to {accept['payTo']} "
            f"on {accept['network']}"
        )
        priv = os.environ.get("PRIVATE_KEY")
        if priv:
            # sign a real EIP-3009 authorization with the wallet key, the
            # same flow as the reference client (test_x402.rs:59-89)
            from smalltts_tpu.serving.x402 import X402Config, X402Gate

            signer = X402Gate(X402Config(mode="local"))
            payment = signer.sign_payment(int(priv, 16), accept)
            print(f"signed EIP-3009 payment from key in PRIVATE_KEY")
        else:
            # echo a payment envelope (accepted by trust-mode servers; real
            # deployments verify an EIP-712 signature via the facilitator)
            payment = base64.b64encode(
                json.dumps({"x402Version": 1, "scheme": accept["scheme"],
                            "network": accept["network"], "payload": {}}).encode()
            ).decode()
        req = urllib.request.Request(
            url, data=body, headers={**headers, "x-payment": payment}
        )
        resp = urllib.request.urlopen(req, timeout=120)

    wav = resp.read()
    assert resp.headers.get("content-type") == "audio/wav", resp.headers
    with open("output.wav", "wb") as f:
        f.write(wav)
    print(f"wrote output.wav ({len(wav)} bytes)")


if __name__ == "__main__":
    main()
