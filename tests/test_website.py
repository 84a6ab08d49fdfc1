"""Static contract checks on the web client (no JS runtime in this image —
browser-level verification must happen in a deployment environment).

Pins the x402 "exact"-scheme signing contract the page implements
(reference: src/website/src/App.tsx:26-73 via Privy/useX402Fetch; ours uses
the injected EIP-1193 wallet directly): EIP-3009 TransferWithAuthorization
typed data with the USDC-on-Base domain, signed with eth_signTypedData_v4,
retried with the X-PAYMENT header."""

import json
import os
import re

HTML = open(os.path.join(os.path.dirname(__file__), "..", "website", "index.html")).read()


def test_uses_injected_wallet_apis():
    for method in ("eth_requestAccounts", "wallet_switchEthereumChain",
                   "eth_signTypedData_v4"):
        assert method in HTML, method


def test_eip3009_type_field_order():
    """EIP-712 struct hashing is order-sensitive: the TransferWithAuthorization
    fields must appear exactly in the EIP-3009 order."""
    block = HTML[HTML.index("TransferWithAuthorization: ["):]
    names = re.findall(r'name:\s*"(\w+)",\s*type:\s*"(\w+\d*)"', block)[:6]
    assert names == [
        ("from", "address"), ("to", "address"), ("value", "uint256"),
        ("validAfter", "uint256"), ("validBefore", "uint256"),
        ("nonce", "bytes32"),
    ], names


def test_usdc_domain_defaults():
    assert '"USD Coin"' in HTML
    assert "verifyingContract: accept.asset" in HTML
    assert "accept.network.split" in HTML  # chainId from eip155:<id>


def test_payment_envelope_shape():
    # the envelope the server-side gate/settle tests expect
    assert "x402Version: 1" in HTML
    assert "payload: { signature, authorization }" in HTML
    assert '"x-payment": payment' in HTML


def test_unsigned_fallback_only_without_wallet():
    assert "no wallet detected" in HTML


def test_price_display_matches_server_rate():
    m = re.search(r"RATE_PER_SECOND = (\d+)", HTML)
    from smalltts_tpu.serving.x402 import RATE_PER_SECOND

    assert int(m.group(1)) == RATE_PER_SECOND


def test_sample_player_section_present():
    assert "samples/index.json" in HTML
    assert 'id="samples"' in HTML
