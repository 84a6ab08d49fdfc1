"""serving/eth.py — from-scratch keccak / secp256k1 / EIP-712 primitives.

Pinned against published vectors: keccak-256 known answers, the canonical
private-key→address pairs, and the EIP-712 spec's "Mail" example (domain
separator > one keccak rate block, so multi-block absorption is covered;
the deterministic RFC-6979 signature must match the spec's own bytes,
proving nonce generation is bit-compatible with ethereum tooling).
"""

import pytest

from smalltts_tpu.serving import eth

# the EIP-712 spec's example typed data (same values the reference's wallet
# stack would hash via eth_signTypedData_v4)
MAIL_TYPED = {
    "types": {
        "EIP712Domain": [
            {"name": "name", "type": "string"},
            {"name": "version", "type": "string"},
            {"name": "chainId", "type": "uint256"},
            {"name": "verifyingContract", "type": "address"},
        ],
        "Person": [
            {"name": "name", "type": "string"},
            {"name": "wallet", "type": "address"},
        ],
        "Mail": [
            {"name": "from", "type": "Person"},
            {"name": "to", "type": "Person"},
            {"name": "contents", "type": "string"},
        ],
    },
    "primaryType": "Mail",
    "domain": {
        "name": "Ether Mail",
        "version": "1",
        "chainId": 1,
        "verifyingContract": "0xCcCCccccCCCCcCCCCCCcCcCccCcCCCcCcccccccC",
    },
    "message": {
        "from": {"name": "Cow", "wallet": "0xCD2a3d9F938E13CD947Ec05AbC7FE734Df8DD826"},
        "to": {"name": "Bob", "wallet": "0xbBbBBBBbbBBBbbbBbbBbbbbBBbBbbbbBbBbbBBbB"},
        "contents": "Hello, Bob!",
    },
}


def test_keccak256_known_answers():
    assert eth.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert eth.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")


def test_keccak256_is_not_sha3():
    """keccak-256 uses the 0x01 pad; NIST SHA3-256 (hashlib) uses 0x06 —
    they must differ or ethereum hashes would be silently wrong."""
    import hashlib

    assert eth.keccak256(b"abc") != hashlib.sha3_256(b"abc").digest()


def test_private_key_address_vectors():
    # canonical first-private-keys addresses
    assert eth.address_from_priv(1) == "0x7E5F4552091A69125d5DfCb7b8C2659029395Bdf"
    assert eth.address_from_priv(2) == "0x2B5AD5c4795c026514f8317c7a215E218DcCD6cF"


def test_checksum_address_is_idempotent_and_case_fixing():
    lower = "0xcd2a3d9f938e13cd947ec05abc7fe734df8dd826"
    want = "0xCD2a3d9F938E13CD947Ec05AbC7FE734Df8DD826"
    assert eth.checksum_address(lower) == want
    assert eth.checksum_address(want) == want


def test_eip712_mail_sign_hash_matches_spec():
    # exercises nested structs, the sorted type closure, AND a >136-byte
    # (multi-block) keccak absorb via the 160-byte domain struct encoding
    assert eth.typed_data_hash(MAIL_TYPED).hex() == (
        "be609aee343fb3c4b28e1df9e632fca64fcfaede20f02e86244efddf30957bd2")


def test_eip712_mail_signature_matches_spec_exactly():
    """RFC-6979 determinism: the signature bytes must equal the EIP-712
    spec example's published signature for privkey keccak256('cow')."""
    cow = int.from_bytes(eth.keccak256(b"cow"), "big")
    assert eth.address_from_priv(cow) == (
        "0xCD2a3d9F938E13CD947Ec05AbC7FE734Df8DD826")
    sig = eth.sign_typed_data(cow, MAIL_TYPED)
    assert sig == (
        "0x4355c47d63924e8a72e509b65029052eb6c299d53a04e167c5775fd466751c9d"
        "07299936d304c153f6443dfa05f40ff007d72911b6f72307f996231605b91562"
        "1c")


def test_recover_typed_data_round_trip():
    priv = 0xA11CE
    sig = eth.sign_typed_data(priv, MAIL_TYPED)
    assert eth.recover_typed_data(MAIL_TYPED, sig) == eth.address_from_priv(priv)


def test_sign_hash_low_s_and_determinism():
    priv = 7
    h = eth.keccak256(b"determinism")
    sig1 = eth.sign_hash(priv, h)
    sig2 = eth.sign_hash(priv, h)
    assert sig1 == sig2
    s = int.from_bytes(sig1[32:64], "big")
    assert 1 <= s <= eth.N // 2  # EIP-2 low-s
    assert sig1[64] in (27, 28)
    assert eth.ecrecover(h, sig1) == eth.address_from_priv(priv)


def test_tampered_message_recovers_different_signer():
    priv = 0xBEEF
    h = eth.keccak256(b"pay me 1 USDC")
    sig = eth.sign_hash(priv, h)
    other = eth.ecrecover(eth.keccak256(b"pay me 9 USDC"), sig)
    assert other != eth.address_from_priv(priv)


@pytest.mark.parametrize("mutate", [
    lambda s: s[:64] + bytes([99]),            # invalid v
    lambda s: b"\x00" * 32 + s[32:],           # r = 0
    lambda s: s[:32] + b"\xff" * 32 + s[64:],  # s >= N
    lambda s: s[:10],                          # truncated
])
def test_ecrecover_rejects_malformed(mutate):
    sig = eth.sign_hash(3, eth.keccak256(b"x"))
    with pytest.raises(ValueError):
        eth.ecrecover(eth.keccak256(b"x"), mutate(sig))


def test_raw_recid_v_accepted():
    """Some wallets emit v in {0,1} instead of {27,28}; both must recover."""
    priv = 11
    h = eth.keccak256(b"raw recid")
    sig = eth.sign_hash(priv, h)
    raw = sig[:64] + bytes([sig[64] - 27])
    assert eth.ecrecover(h, raw) == eth.address_from_priv(priv)


def test_bytes32_and_bool_and_bytes_encoding():
    typed = {
        "types": {
            "EIP712Domain": [{"name": "name", "type": "string"}],
            "Blob": [
                {"name": "tag", "type": "bytes32"},
                {"name": "ok", "type": "bool"},
                {"name": "blob", "type": "bytes"},
            ],
        },
        "primaryType": "Blob",
        "domain": {"name": "t"},
        "message": {"tag": "0x" + "11" * 32, "ok": True, "blob": "0xdeadbeef"},
    }
    priv = 5
    sig = eth.sign_typed_data(priv, typed)
    assert eth.recover_typed_data(typed, sig) == eth.address_from_priv(priv)


def test_uint_encoding_accepts_leading_zero_decimal_strings():
    """Typed-data integers are decimal unless 0x-prefixed: '0100' is a
    spec-valid spelling of 100 (int(s, 0) raised on it, so a correctly
    signed payment carrying it was denied — review r3)."""
    from smalltts_tpu.serving.eth import _encode_value

    assert _encode_value("uint256", "0100", {}) == (100).to_bytes(32, "big")
    assert _encode_value("uint256", "0x100", {}) == (256).to_bytes(32, "big")
    assert _encode_value("uint256", 7, {}) == (7).to_bytes(32, "big")
    # "0b1"/"0o7" are not integer spellings in EIP-712 — decimal parse fails
    import pytest

    with pytest.raises(ValueError):
        _encode_value("uint256", "0b1", {})
