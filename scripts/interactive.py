"""Interactive REPL synthesis with wall-clock + RTF reporting.

Capability parity with the reference (reference:
src/scripts/infer/interactive.py:19-60): optional --wav reference (decode ->
mono -> HQ resample -> codec encode) else built-in latents; prints generation
time and RTF per utterance; writes wavs (audio playback replaced by file
output — no sound device in server environments).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out-dir", default="out")
    args = ap.parse_args()

    from smalltts_tpu.infer.pipeline import SmallTTS, estimate_duration
    from smalltts_tpu.serving.audio_io import encode_wav
    from smalltts_tpu.text import get_token_ids

    tts = SmallTTS(checkpoint=args.checkpoint)
    if args.wav:
        from smalltts_tpu.serving.audio_io import backend as audio_backend

        backend = audio_backend()
        with open(args.wav, "rb") as f:
            ref_latents = tts.encode_reference(
                backend.decode_and_resample(f.read(), 24_000)
            )
    else:
        latents_path = "assets/tryme/latents.npy"
        ref_latents = (
            np.load(latents_path)
            if os.path.exists(latents_path)
            else np.random.RandomState(0).randn(16, 64).astype(np.float32)
        )

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    print("enter text (ctrl-d to exit):")
    for line in sys.stdin:
        text = line.strip()
        if not text:
            continue
        tokens = get_token_ids(text)
        duration = estimate_duration(text)
        t0 = time.perf_counter()
        audio = tts.synthesize(ref_latents, tokens, duration)
        dt = time.perf_counter() - t0
        rtf = dt / duration
        path = os.path.join(args.out_dir, f"interactive_{n}.wav")
        with open(path, "wb") as f:
            f.write(encode_wav(audio.reshape(-1), 24_000))
        print(f"{path}: {dt*1e3:.0f} ms for {duration:.1f}s audio (rtf {rtf:.3f})")
        n += 1


if __name__ == "__main__":
    main()
