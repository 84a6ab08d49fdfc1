"""One-shot demo synthesis: text -> out/tryme.wav with the built-in voice.

Capability parity with the reference (reference: src/scripts/tryme.py:11-30):
ensure assets, load built-in reference latents, tokenize, estimate duration,
synthesize, write 16-bit PCM wav @ 24 kHz. Falls back to random reference
latents + random-init weights when assets are absent (hermetic demo).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    if sys.argv[1:2] in (["-h"], ["--help"]):
        # bare-argv CLI (reference tryme parity) — but help must never
        # fetch assets or touch the backend (review r3: --help downloaded)
        print(__doc__.strip())
        print("\nusage: python scripts/tryme.py [TEXT]   (-> out/tryme.wav)")
        return
    text = sys.argv[1] if len(sys.argv) > 1 else "Hello from smalltts on TPU!"

    from smalltts_tpu.assets.ensure import ASSETS_ROOT, ensure_assets
    from smalltts_tpu.infer.pipeline import SmallTTS, estimate_duration
    from smalltts_tpu.serving.audio_io import encode_wav
    from smalltts_tpu.text import get_token_ids

    try:
        ensure_assets(["tryme", "codec", "dmd"])
    except RuntimeError as exc:
        print(f"warn: {exc}; continuing with random weights", file=sys.stderr)

    latents_path = os.path.join(ASSETS_ROOT, "tryme", "latents.npy")
    ckpt_path = os.path.join(ASSETS_ROOT, "dmd", "student_latest.npz")
    ref_latents = (
        np.load(latents_path)
        if os.path.exists(latents_path)
        else np.random.RandomState(0).randn(16, 64).astype(np.float32)
    )

    from smalltts_tpu.onnxjax.pipeline import assets_present as onnx_assets

    tokens = get_token_ids(text)
    duration = estimate_duration(text)
    if os.path.exists(ckpt_path):
        # converted native checkpoint: the fast bucketed pipeline
        tts = SmallTTS(checkpoint=ckpt_path)
        audio = tts.synthesize(ref_latents, tokens, duration)
    elif onnx_assets(ASSETS_ROOT):
        # the reference's PUBLISHED graphs, imported verbatim — guaranteed
        # reference voices with zero weight mapping
        from smalltts_tpu.onnxjax.pipeline import ImportedSmallTTS

        print("using imported reference ONNX graphs (assets/dmd)", file=sys.stderr)
        tts = ImportedSmallTTS(
            os.path.join(ASSETS_ROOT, "dmd", "condition_encoder.onnx"),
            os.path.join(ASSETS_ROOT, "dmd", "denoiser.onnx"),
            os.path.join(ASSETS_ROOT, "codec", "decoder.onnx"),
        )
        audio = tts.synthesize(ref_latents, tokens, duration)
    else:
        tts = SmallTTS()  # hermetic demo: random weights
        audio = tts.synthesize(ref_latents, tokens, duration)

    os.makedirs("out", exist_ok=True)
    with open("out/tryme.wav", "wb") as f:
        f.write(encode_wav(audio.reshape(-1), 24_000))
    print(f"wrote out/tryme.wav ({duration:.1f}s, {len(tokens)} tokens)")


if __name__ == "__main__":
    main()
