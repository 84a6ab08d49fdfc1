"""Batch inference over a transcriptions manifest — but actually batched.

Capability parity with the reference (reference: src/scripts/infer/batch.py:
10-46, which loops sequentially despite the name): reads
`assets/test_audio/transcriptions.json` ({wav_name: transcript}), encodes each
reference, synthesizes the fixed texts — HERE through the continuous batcher
in true batched TPU execution.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello! This voice was cloned on a TPU.",
    "Speech synthesis with four diffusion steps is fast.",
    "How does this sound to you?",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default="assets/test_audio/transcriptions.json")
    ap.add_argument("--out", default="out")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from smalltts_tpu.infer.pipeline import SmallTTS, estimate_duration
    from smalltts_tpu.serving.audio_io import encode_wav
    from smalltts_tpu.serving.batcher import Batcher
    from smalltts_tpu.text import get_token_ids

    with open(args.manifest) as f:
        manifest = json.load(f)

    from smalltts_tpu.serving.audio_io import backend as audio_backend

    backend = audio_backend()

    tts = SmallTTS(checkpoint=args.checkpoint)
    batcher = Batcher(tts)
    os.makedirs(args.out, exist_ok=True)

    futures = []
    base = os.path.dirname(args.manifest)
    for wav_name, transcript in manifest.items():
        with open(os.path.join(base, wav_name), "rb") as f:
            samples = backend.decode_and_resample(f.read(), 24_000)
        ref_latents = tts.encode_reference(samples)
        for i, text in enumerate(TEXTS):
            tokens = get_token_ids(transcript) + get_token_ids(text)
            fut = batcher.submit(ref_latents, tokens, estimate_duration(text))
            futures.append((f"{os.path.splitext(wav_name)[0]}_{i}_gen.wav", fut))

    for name, fut in futures:
        audio = fut.result()
        with open(os.path.join(args.out, name), "wb") as f:
            f.write(encode_wav(audio.reshape(-1), 24_000))
        print(f"wrote {args.out}/{name}")
    batcher.close()


if __name__ == "__main__":
    main()
