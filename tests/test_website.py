"""Static contract checks on the web client (no JS runtime in this image —
the page carries an in-browser self-test for deployment-env verification).

Two layers of cross-checking without executing JS:
1. contract pins — the x402 "exact"-scheme signing flow (EIP-3009
   TransferWithAuthorization typed data, USDC-on-Base domain, X-PAYMENT
   retry) matches the server gate (reference: src/website/src/App.tsx:26-73
   via Privy/useX402Fetch; ours prefers an injected EIP-1193 wallet and
   falls back to the page's EMBEDDED BURNER WALLET — the Privy-equivalent
   onboarding of reference main.tsx:13-27, implemented as in-page
   keccak/secp256k1/RFC-6979 crypto instead of a hosted wallet service);
2. golden equivalence — the SELF_TEST constants embedded in the page are
   REGENERATED here from smalltts_tpu/serving/eth.py and must match
   byte-for-byte. The page re-derives them in the browser at load, so a
   green run of this file + a loaded page proves the JS and Python crypto
   agree on keccak-256, address derivation, EIP-712 hashing, and the full
   deterministic ECDSA signature.
"""

import json
import os
import re

from smalltts_tpu.serving import eth
from smalltts_tpu.serving.x402 import EIP3009_TYPES, RATE_PER_SECOND

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
        (f["name"], f["type"]) for f in EIP3009_TYPES["TransferWithAuthorization"]
    ], names


def test_usdc_domain_defaults():
    assert '"USD Coin"' in HTML
    assert "verifyingContract: accept.asset" in HTML
    assert "accept.network.split" in HTML  # chainId from eip155:<id>
    # the server's challenge-provided domain overrides are honored
    assert "accept.extra && accept.extra.name" in HTML


def test_payment_envelope_shape():
    # the envelope the server-side gate/settle tests expect
    assert "x402Version: 1" in HTML
    assert "envelope({ signature, authorization })" in HTML
    assert '"x-payment": payment' in HTML


def test_unsigned_fallback_only_without_any_wallet():
    assert "no wallet detected" in HTML


def test_price_display_matches_server_rate():
    m = re.search(r"RATE_PER_SECOND = (\d+)", HTML)
    assert int(m.group(1)) == RATE_PER_SECOND


def test_sample_player_section_present():
    assert "samples/index.json" in HTML
    assert 'id="samples"' in HTML


# --------------------------- embedded burner wallet ---------------------------


def test_burner_wallet_onboarding_present():
    assert "localStorage" in HTML and "smalltts.burner.privkey" in HTML
    assert "addressFromPriv" in HTML
    assert "crypto.getRandomValues(new Uint8Array(32))" in HTML
    # injected wallet preferred, burner second, unsigned last — scoped to
    # signPayment (initWallet has its own burnerOk branch for the banner)
    sign = HTML[HTML.index("async function signPayment"):]
    assert sign.index("if (eth) {") < sign.index("} else if (burnerOk) {") \
        < sign.index("no wallet detected")


def test_js_curve_constants_match_python():
    for name, val in (("SECP_P", eth.P), ("SECP_N", eth.N)):
        m = re.search(rf'{name} = BigInt\("0x([0-9A-Fa-f]+)"\)', HTML)
        assert m and int(m.group(1), 16) == val, name
    gx = re.search(r'SECP_G = \[\s*BigInt\("0x([0-9A-Fa-f]+)"\),\s*'
                   r'BigInt\("0x([0-9A-Fa-f]+)"\)', HTML)
    px, py = eth.pubkey(1)
    assert (int(gx.group(1), 16), int(gx.group(2), 16)) == (px, py)


def test_js_keccak_tables_match_python():
    block = HTML[HTML.index("KECCAK_RC = ["):HTML.index("].map(BigInt);")]
    rc = [int(x, 16) for x in re.findall(r'"0x([0-9A-Fa-f]{16})"', block)]
    assert rc == eth._KECCAK_RC
    rot_block = HTML[HTML.index("KECCAK_ROT = ["):]
    rot_block = rot_block[:rot_block.index("].map(BigInt)")]
    rot = [int(x) for x in re.findall(r"\d+", rot_block)]
    flat = [eth._KECCAK_ROT[x][y] for x in range(5) for y in range(5)]
    assert rot == flat


def _self_test_constants():
    block = HTML[HTML.index("const SELF_TEST = {"):]
    block = block[:block.index("};")]
    out = {}
    for key in ("keccakEmpty", "priv", "address", "signHash"):
        out[key] = re.search(rf'{key}: "([^"]+)"', block).group(1)
    sig = re.search(r'signature: "([^"]+)"\s*\+\s*"([^"]+)"', block)
    out["signature"] = sig.group(1) + sig.group(2)
    return out


def _self_test_typed(from_addr):
    return {
        "types": EIP3009_TYPES,
        "primaryType": "TransferWithAuthorization",
        "domain": {"name": "USD Coin", "version": "2", "chainId": 8453,
                   "verifyingContract":
                       "0x833589fCD6eDb6E08f4c7C32D4f71b54bdA02913"},
        "message": {"from": from_addr,
                    "to": "0xBAc675C310721717Cd4A37F6cbeA1F081b1C2a07",
                    "value": "167", "validAfter": "0",
                    "validBefore": "1800000000",
                    "nonce": "0x" + "00" * 31 + "01"},
    }


def test_self_test_goldens_regenerate_from_eth_py():
    """The page's embedded goldens must be exactly what eth.py computes —
    the browser-side self-test then proves the JS agrees with eth.py."""
    got = _self_test_constants()
    assert got["keccakEmpty"] == eth.keccak256(b"").hex()
    priv = int(got["priv"], 16)
    addr = eth.address_from_priv(priv)
    assert got["address"] == addr
    typed = _self_test_typed(addr)
    assert got["signHash"] == eth.typed_data_hash(typed).hex()
    assert got["signature"] == eth.sign_typed_data(priv, typed)


def test_self_test_signature_verifies_against_gate_contract():
    """The golden signature must satisfy the server's local-mode verifier
    contract: recover via the SAME build_typed_data path X402Gate uses."""
    from smalltts_tpu.serving.x402 import X402Config, X402Gate

    got = _self_test_constants()
    gate = X402Gate(X402Config(mode="local"))
    typed = gate.build_typed_data(_self_test_typed(got["address"])["message"])
    assert eth.recover_typed_data(typed, got["signature"]) == got["address"]
