"""x402 payment gating: duration-priced 402 challenges.

Behavioral parity with the reference server's payment layer
(reference: src/server/src/main.rs:26-89,158-165 and the e2e contract tests
src/server/tests/e2e.rs:87-315):

* price = ceil(duration_sec * 167) USDC smallest units (6 decimals) on Base —
  $0.01/min; duration defaults to 1.0 and clamps to >= 0.1 (main.rs:60-79).
  NB main.rs comments say $0.01/min while README claims $0.05/min — code wins
  (SURVEY.md "known quirks").
* unpaid requests -> 402 with a base64 `payment-required` header carrying the
  accepts list (scheme/network/payTo/maxAmountRequired), empty body;
* `/health` and discovery are never gated.

Verification modes: "disabled" (no gating), "trust" (any X-PAYMENT header
accepted — for offline deployments/tests), "facilitator" (POST the payment
to FACILITATOR_URL /verify; requires network egress).
"""

from __future__ import annotations

import base64
import json
import math
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

RATE_PER_SECOND = 167  # ceil(10000 / 60): $0.01/min in USDC 6dp (main.rs:27)


def price_for_duration(duration_sec: float) -> int:
    """ceil(max(duration, 0.1) * 167) (main.rs:60-79)."""
    return math.ceil(max(duration_sec, 0.1) * RATE_PER_SECOND)


@dataclass
class X402Config:
    mode: str = "disabled"  # disabled | trust | facilitator
    pay_to: str = field(
        default_factory=lambda: os.environ.get(
            "PAYMENT_ADDRESS", "0xBAc675C310721717Cd4A37F6cbeA1F081b1C2a07"
        )
    )
    facilitator_url: str = field(
        default_factory=lambda: os.environ.get(
            "FACILITATOR_URL", "https://pay.openfacilitator.io"
        )
    )
    network: str = "eip155:8453"  # Base mainnet
    asset: str = "0x833589fCD6eDb6E08f4c7C32D4f71b54bdA02913"  # USDC on Base
    base_url: str = field(
        default_factory=lambda: os.environ.get("BASE_URL", "http://localhost:3000")
    )


class X402Gate:
    def __init__(self, cfg: X402Config = None) -> None:
        self.cfg = cfg or X402Config()

    def payment_required_header(self, duration_sec: float, resource: str) -> str:
        amount = price_for_duration(duration_sec)
        payload = {
            "x402Version": 1,
            "error": "payment required",
            "accepts": [
                {
                    "scheme": "exact",
                    "network": self.cfg.network,
                    "maxAmountRequired": str(amount),
                    "resource": f"{self.cfg.base_url}{resource}",
                    "description": "smalltts speech synthesis",
                    "mimeType": "audio/wav",
                    "payTo": self.cfg.pay_to,
                    "maxTimeoutSeconds": 300,
                    "asset": self.cfg.asset,
                }
            ],
        }
        return base64.b64encode(json.dumps(payload).encode()).decode()

    def check(self, headers: dict, duration_sec: float, resource: str) -> Tuple[bool, Optional[str]]:
        """-> (allowed, payment_required_header_if_denied)."""
        if self.cfg.mode == "disabled":
            return True, None
        payment = headers.get("x-payment")
        if not payment:
            return False, self.payment_required_header(duration_sec, resource)
        if self.cfg.mode == "trust":
            return True, None
        ok = self._verify_with_facilitator(payment, duration_sec)
        if ok:
            return True, None
        return False, self.payment_required_header(duration_sec, resource)

    def _facilitator_body(self, payment_b64: str, duration_sec: float) -> bytes:
        """The /verify and /settle request body (x402 v1 facilitator API):
        {x402Version, paymentPayload, paymentRequirements}."""
        payload = json.loads(base64.b64decode(payment_b64))
        return json.dumps(
            {
                "x402Version": 1,
                "paymentPayload": payload,
                "paymentRequirements": json.loads(
                    base64.b64decode(
                        self.payment_required_header(duration_sec, "/synthesize")
                    )
                )["accepts"][0],
            }
        ).encode()

    def _facilitator_post(self, endpoint: str, payment_b64: str,
                          duration_sec: float) -> Optional[dict]:
        import urllib.request

        try:
            req = urllib.request.Request(
                f"{self.cfg.facilitator_url}{endpoint}",
                data=self._facilitator_body(payment_b64, duration_sec),
                headers={"content-type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                return json.loads(resp.read())
        except Exception:
            return None  # fail closed: callers treat None as denial

    def _verify_with_facilitator(self, payment_b64: str, duration_sec: float) -> bool:
        resp = self._facilitator_post("/verify", payment_b64, duration_sec)
        return bool(resp and resp.get("isValid", False))

    def settle(self, payment_b64: str, duration_sec: float) -> Optional[str]:
        """Capture the verified payment AFTER successful synthesis
        (settle-after-serve, like the reference's x402-axum middleware,
        main.rs:60-79). Returns the base64 X-PAYMENT-RESPONSE header value,
        or None if settlement failed (caller should 402). Trust mode settles
        nothing and returns a stub receipt."""
        if self.cfg.mode != "facilitator":
            return base64.b64encode(
                json.dumps({"success": True, "network": self.cfg.network}).encode()
            ).decode()
        resp = self._facilitator_post("/settle", payment_b64, duration_sec)
        if not resp or not resp.get("success", False):
            return None
        return base64.b64encode(json.dumps(resp).encode()).decode()

    @property
    def settles(self) -> bool:
        """Whether successful requests must settle before the response."""
        return self.cfg.mode == "facilitator"

    def discovery(self) -> dict:
        """GET /.well-known/x402 payload (main.rs:158-165)."""
        return {
            "version": 1,
            "resources": [f"{self.cfg.base_url}/synthesize"],
            "instructions": (
                "# smalltts\n\nText-to-speech API. POST /synthesize?duration=N "
                "with multipart audio + text.\n\nPricing: $0.01/min of "
                "generated audio."
            ),
        }
