"""Voice cloning CLI: --wav --text [--transcription] [--duration] [--out].

Capability parity with the reference (reference: src/scripts/infer/clone.py:
13-45) PLUS the `--transcription` flag the reference README documents but its
script never implements (README.md:55-58 vs clone.py:16-25; the prepend path
exists only in SmallTTS.forward, infer/onnx.py:143-156) — supported properly
here.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", required=True, help="reference audio (wav)")
    ap.add_argument("--text", required=True, help="text to speak")
    ap.add_argument("--transcription", default=None,
                    help="transcript of the reference audio (prepended tokens)")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--out", default="out/clone.wav")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from smalltts_tpu.infer.pipeline import SmallTTS, estimate_duration
    from smalltts_tpu.serving.audio_io import encode_wav
    from smalltts_tpu.text import get_token_ids

    def load_audio(path):
        from smalltts_tpu.serving.audio_io import backend as audio_backend

        backend = audio_backend()
        with open(path, "rb") as f:
            return backend.decode_and_resample(f.read(), 24_000)

    tts = SmallTTS(checkpoint=args.checkpoint)
    ref_latents = tts.encode_reference(load_audio(args.wav))

    tokens = get_token_ids(args.text)
    if args.transcription:
        tokens = get_token_ids(args.transcription) + tokens
    duration = args.duration or estimate_duration(args.text)
    audio = tts.synthesize(ref_latents, tokens, duration)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(encode_wav(audio.reshape(-1), 24_000))
    print(f"wrote {args.out} ({duration:.1f}s)")


if __name__ == "__main__":
    main()
