"""Text frontend: vocab parity vs reference data, normalizer, tokenizer."""

import ast

import numpy as np
import pytest

from smalltts_tpu.text import (
    NV_REPEAT,
    decode_token_ids,
    get_sed_event_id,
    get_token_ids,
    merge_transcript,
    p2idx,
    phoneme_len,
)
from smalltts_tpu.text.normalizer import EnglishTextNormalizer
from smalltts_tpu.text.numbers import (
    number_to_ordinal_words,
    number_to_words,
    number_to_words_grouped,
)

REF_PHONEMES = "/root/reference/src/smalltts/data/phonemization/phonemes.py"


def _reference_vocab():
    """Extract the reference's symbol data (read as data, never imported)."""
    tree = ast.parse(open(REF_PHONEMES).read())
    vals = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            name = node.targets[0].id
            if name in ("_punct", "_letters", "_letters_ipa", "_sed_labels", "NV_REPEAT"):
                vals[name] = ast.literal_eval(node.value)
    syms, seen = [], set()
    for ch in vals["_punct"] + vals["_letters"] + vals["_letters_ipa"]:
        if ch not in seen:
            seen.add(ch)
            syms.append(ch)
    for label in vals["_sed_labels"]:
        s = f"[{label}]"
        if s not in seen:
            seen.add(s)
            syms.append(s)
    return {ch: i + 1 for i, ch in enumerate(syms)}, vals["NV_REPEAT"]


def test_vocab_exact_parity_with_reference():
    expected, nv = _reference_vocab()
    assert phoneme_len == len(expected) + 1 == 198
    assert p2idx == expected
    assert NV_REPEAT == nv


def test_event_tokens_repeat():
    ids = get_token_ids("[laughter]")
    assert len(ids) == NV_REPEAT
    assert len(set(ids)) == 1
    assert ids[0] == get_sed_event_id("laughter") == get_sed_event_id("LAUGHTER")
    assert get_sed_event_id("notanevent") is None


def test_tokenizer_interleaves_events_and_text():
    ids = get_token_ids("hi [sigh] there")
    sigh = get_sed_event_id("sigh")
    assert ids.count(sigh) == NV_REPEAT
    # event ids are contiguous
    first = ids.index(sigh)
    assert ids[first : first + NV_REPEAT] == [sigh] * NV_REPEAT
    assert decode_token_ids([sigh]) == "[sigh]"


def test_pad_id_zero_never_produced():
    ids = get_token_ids("The quick brown fox! 123 $4.50 [cough]")
    assert all(i > 0 for i in ids)
    assert max(ids) < phoneme_len


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1_000_000) == "one million"
    assert number_to_words_grouped(1975) == "nineteen seventy-five"
    assert number_to_ordinal_words(21) == "twenty-first"
    assert number_to_ordinal_words(12) == "twelfth"
    assert number_to_ordinal_words(30) == "thirtieth"


def test_normalizer_rules():
    n = EnglishTextNormalizer()
    assert n.normalize("Dr. Smith") == "doctor. Smith"
    assert "by the way" in n.normalize("BTW, hello")
    assert "percent" in n.normalize("75%")
    assert "one half" in n.normalize("1/2 cup")
    assert "pounds" in n.normalize("£500")
    out = n.normalize("$1.50")
    assert "dollar" in out and "cents" in out
    assert "two thousand five" in n.normalize("year 2005")
    assert "nineteen hundred" in n.normalize("in 1900")
    # ordinals
    assert "twenty-first" in n.normalize("21st")


def test_ensure_assets_skips_existing(tmp_path, monkeypatch):
    """Present folders are skipped without importing huggingface_hub
    (reference: assets/ensure.py:29-40)."""
    from smalltts_tpu.assets.ensure import ensure_assets

    (tmp_path / "codec").mkdir()
    ensure_assets(["codec"], root=str(tmp_path))  # must not raise / download


def test_ensure_assets_raises_cleanly_without_hub(tmp_path, monkeypatch):
    import builtins

    from smalltts_tpu.assets import ensure

    real_import = builtins.__import__

    def no_hub(name, *a, **k):
        if name.startswith("huggingface_hub"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_hub)
    with pytest.raises(RuntimeError, match="huggingface_hub"):
        ensure.ensure_assets(["missing_folder"], root=str(tmp_path))


def test_merge_transcript_orders_by_time():
    words = [{"start": 0.0, "word": "hello"}, {"start": 2.0, "word": "world"}]
    events = [
        {"start": 1.0, "label": "laughter", "prob": 0.9},
        {"start": 0.5, "label": "notreal", "prob": 0.9},    # unknown label dropped
        {"start": 1.5, "label": "sigh", "prob": 0.05},       # low prob dropped
    ]
    assert merge_transcript(words, events) == "hello [laughter] world"


def test_number_to_words_beyond_named_scales():
    """1e18+ has named scales through decillion; past that every digit is
    read aloud (silent truncation spelled 1e18 as '' — review r3)."""
    assert number_to_words(10**18) == "one quintillion"
    assert number_to_words(10**33) == "one decillion"
    big = 10**36 + 5
    spelled = number_to_words(big)
    assert spelled.startswith("one zero") and spelled.endswith("five")
    assert len(spelled.split()) == 37
