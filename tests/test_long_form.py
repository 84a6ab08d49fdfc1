"""Long-form chunked synthesis + batcher concurrency stress."""

import concurrent.futures

import numpy as np
import pytest

import jax

from tiny import TINY_BACKBONE, TINY_CODEC
from smalltts_tpu.infer.long_form import crossfade_concat, split_sentences, synthesize_long
from smalltts_tpu.infer.pipeline import SmallTTS
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.models.codec import init_codec


def test_split_sentences_respects_limits():
    text = "One. Two! Three? " + "word " * 200 + ". Done."
    chunks = split_sentences(text, max_chars=100)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks).count("One") == 1


def test_split_sentences_preserves_order():
    text = "Short lead-in. " + "gigantic " * 40 + ". Tail."
    chunks = split_sentences(text, max_chars=80)
    joined = " ".join(chunks)
    assert joined.index("Short lead-in") < joined.index("gigantic")
    assert joined.rstrip().endswith("Tail.")


def test_split_keeps_bracketed_events():
    chunks = split_sentences("Hello [laughter]. Bye [sigh].", max_chars=50)
    joined = " ".join(chunks)
    assert "[laughter]" in joined and "[sigh]" in joined


def test_crossfade_concat_length():
    a = np.ones((1, 2400), np.float32)
    b = -np.ones((1, 2400), np.float32)
    out = crossfade_concat([a, b], fade_ms=20.0)
    f = int(24_000 * 0.02)
    assert out.shape == (1, 2400 * 2 - f)
    assert np.isfinite(out).all()


@pytest.fixture(scope="module")
def tts():
    return SmallTTS(
        init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE),
        init_codec(jax.random.PRNGKey(1), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )


def test_synthesize_long(tts, monkeypatch):
    import smalltts_tpu.infer.long_form as lf

    monkeypatch.setattr(
        "smalltts_tpu.text.get_token_ids", lambda text: [1, 2, 3], raising=True
    )
    ref = np.random.RandomState(0).randn(8, 64).astype(np.float32)
    audio = synthesize_long(tts, ref, "Short one. Another short one!")
    assert audio.shape[0] == 1 and audio.shape[1] > 24_000
    assert np.isfinite(audio).all()


def test_batcher_concurrent_stress(tts):
    """Many threads submitting simultaneously: all futures resolve, correct
    per-request lengths, no cross-request corruption."""
    from smalltts_tpu.serving.batcher import Batcher

    batcher = Batcher(tts, max_batch=4, window_ms=10.0)
    rng = np.random.RandomState(0)
    durations = [0.5, 1.0, 1.5, 2.0, 5.0, 1.0, 0.7, 2.2, 5.5, 1.1]

    def submit(d):
        ref = rng.randn(6, 64).astype(np.float32)
        return batcher.submit(ref, [1, 2, 3], d)

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        futures = list(pool.map(submit, durations))
    for d, fut in zip(durations, futures):
        audio = fut.result(timeout=120)
        expected = max(1, int(np.ceil(d * 24_000 / 3200))) * 3200
        assert audio.shape == (1, expected), (d, audio.shape)
        assert np.isfinite(audio).all()
    batcher.close()


def test_stream_step_never_emits_empty_with_zero_fade():
    """fade <= 0 must never yield a zero-length emit: consumers map emits
    to chunked-transfer frames, where an empty chunk is the stream
    terminator (review r3 — the first-chunk fast path returned cur[:-0])."""
    import numpy as np

    from smalltts_tpu.infer.long_form import crossfade_stream_step

    a = np.ones(100, np.float32)
    b = 2 * np.ones(80, np.float32)
    pending = None
    emitted = []
    for cur in (a, b):
        emit, pending = crossfade_stream_step(pending, cur, fade=0)
        if emit is not None:
            assert len(emit) > 0
            emitted.append(emit)
    if pending is not None and len(pending):
        emitted.append(pending)
    np.testing.assert_array_equal(np.concatenate(emitted),
                                  np.concatenate([a, b]))


def test_stream_step_emits_each_chunk_body_immediately():
    """Every chunk's body must be delivered at ITS boundary, holding back
    only the fade tail (review r3: the old steady state held the whole
    remainder of each chunk, delaying all audio after sentence 1 by a full
    synthesis interval)."""
    import numpy as np

    from smalltts_tpu.infer.long_form import crossfade_stream_step

    fade = 480
    c1 = np.ones(1000, np.float32)
    c2 = 2 * np.ones(1000, np.float32)
    emit1, pending = crossfade_stream_step(None, c1, fade)
    assert len(emit1) == 1000 - fade
    emit2, pending = crossfade_stream_step(pending, c2, fade)
    # chunk 2's body (1000 - 480 blend consumed - 480 held) arrives NOW;
    # the old code emitted only the 480-sample blend here and held 520
    assert len(emit2) == 1000 - fade
    assert len(pending) == fade

    # short-chunk corner: a chunk shorter than the fade must still leave
    # the held tail equal to min(fade, unemitted stream), matching
    # crossfade_concat's f = min(fade, len(out), len(next)); here the
    # 300-sample chunk blends fully into the tail and nothing can emit
    tiny = 0.5 * np.ones(300, np.float32)
    emit3, pending = crossfade_stream_step(pending, tiny, fade)
    assert emit3 is None
    assert len(pending) == fade  # tail refilled from the merged stream


def test_stream_equals_batch_concat():
    """Streamed pieces concatenate to exactly synthesize_long's waveform
    when the per-chunk synthesis is deterministic."""
    import numpy as np

    from smalltts_tpu.infer.long_form import (
        crossfade_concat,
        split_sentences,
        stream_synthesize_long,
    )

    rng = np.random.RandomState(0)
    text = "First sentence here. Second one follows! A third, even."
    chunks = split_sentences(text, max_chars=25)
    assert len(chunks) >= 2
    parts = {c: rng.randn(1, 2000 + 500 * i).astype(np.float32)
             for i, c in enumerate(chunks)}

    want = crossfade_concat([parts[c] for c in chunks]).reshape(-1)
    pieces = list(stream_synthesize_long(None, None, text,
                                         synth=lambda c: parts[c],
                                         max_chars=25))
    np.testing.assert_allclose(np.concatenate(pieces), want, atol=1e-6)
    assert len(pieces) >= 2


def test_split_sentences_slices_unbroken_giant_tokens():
    """A 500-char token (URL/base64) must not become one chunk whose 30 s
    duration clamp truncates mid-utterance (review r3)."""
    from smalltts_tpu.infer.long_form import split_sentences

    token = "x" * 500
    chunks = split_sentences(f"short one. {token} tail words.", max_chars=100)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks).count("x") == 500  # nothing dropped


def test_synthesize_long_respects_chars_per_second():
    """The rate used to be accepted and silently ignored (review r3)."""
    import numpy as np

    from smalltts_tpu.infer.long_form import synthesize_long

    calls = []

    class _TTS:
        def synthesize(self, ref, tokens, duration):
            calls.append(duration)
            return np.zeros((1, 2400), np.float32)

    text = "a" * 80  # 80 chars: 11.5 c/s -> ~6.96 s; 8 c/s -> 10 s
    synthesize_long(_TTS(), np.zeros((4, 64), np.float32), text,
                    chars_per_second=8.0)
    assert calls and abs(calls[0] - 10.0) < 1e-6


def test_stream_final_tail_never_empty():
    """fade_ms=0 left an empty final yield — consumers treat an empty chunk
    as the chunked-transfer terminator (review r3)."""
    import numpy as np

    from smalltts_tpu.infer.long_form import stream_synthesize_long

    def synth(chunk):
        return np.ones((1, 240), np.float32)

    pieces = list(stream_synthesize_long(None, None, "one. two.", fade_ms=0.0,
                                         synth=synth, max_chars=6))
    assert len(pieces) == 2 and all(len(p) > 0 for p in pieces)
    assert sum(len(p) for p in pieces) == 480


def test_head_split_basic():
    """First-chunk fast path (VERDICT r3 weak #2): the head must fit the
    char budget, cut at a word boundary, and rejoin to the original."""
    from smalltts_tpu.infer.long_form import head_split

    s = "The quick brown fox jumps over the lazy dog near the river bank."
    head, rest = head_split(s, head_chars=24)
    assert head and rest
    assert len(head) <= 24
    assert not head.endswith(" ") and not rest.startswith(" ")
    assert f"{head} {rest}" == s

    # short sentence: no split
    assert head_split("Hello there.", head_chars=24) == ("Hello there.", "")

    # unbroken token: no safe cut -> no split
    assert head_split("x" * 100, head_chars=24) == ("x" * 100, "")


def test_head_split_prefers_clause_boundary():
    from smalltts_tpu.infer.long_form import head_split

    s = "Well yes, that is exactly what happened there yesterday evening."
    head, rest = head_split(s, head_chars=24)
    assert head == "Well yes,"  # clause cut beats the later word cut


def test_head_split_never_cuts_inside_event_brackets():
    from smalltts_tpu.infer.long_form import head_split

    s = "Hi [laughter and more words] everyone who is listening today."
    head, rest = head_split(s, head_chars=24)
    # the only in-window spaces outside brackets are at 2 ("Hi ") — the
    # bracketed span's spaces must not be cut points
    assert "[" not in head or "]" in head, f"cut inside brackets: {head!r}"
    assert f"{head} {rest}".replace("  ", " ") == s or rest == ""
