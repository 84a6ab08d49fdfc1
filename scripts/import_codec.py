"""Import/inspect the reference VibeVoice codec ONNX assets.

Usage:
  python scripts/import_codec.py [--assets assets/codec] [--save out/codec_import]
                                 [--roundtrip-seconds 1.0]

Parses assets/codec/{encoder,decoder}.onnx with the in-repo ONNX importer
(no `onnx`/`onnxruntime` needed), prints graph summaries, runs an
encode->decode round trip on a synthetic waveform, and optionally saves the
initializers as .npz for offline analysis.

Reference: src/smalltts/codec/onnx.py:34-85 (the ONNX sessions this replaces).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="assets/codec")
    ap.add_argument("--save", default=None, help="save initializers to <save>_{enc,dec}.npz")
    ap.add_argument("--roundtrip-seconds", type=float, default=1.0)
    args = ap.parse_args()

    enc_path = os.path.join(args.assets, "encoder.onnx")
    dec_path = os.path.join(args.assets, "decoder.onnx")
    for p in (enc_path, dec_path):
        if not os.path.isfile(p):
            print(
                f"missing {p} — fetch with "
                "`python -m smalltts_tpu.assets.ensure codec` first",
                file=sys.stderr,
            )
            return 1

    from smalltts_tpu.onnxjax.codec import OnnxCodec

    codec = OnnxCodec(enc_path, dec_path)
    print(codec.describe())

    if args.save:
        for side in ("encoder", "decoder"):
            out = f"{args.save}_{side[:3]}.npz"
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            np.savez(out, **codec.params[side])
            print(f"saved {side} initializers -> {out}")

    import jax

    sr = 24_000
    t = int(args.roundtrip_seconds * sr)
    rng = np.random.RandomState(0)
    audio = (0.5 * np.sin(2 * np.pi * 220 * np.arange(t) / sr)
             + 0.05 * rng.randn(t)).astype(np.float32)[None, None, :]
    latents = jax.jit(codec.encode_fn)(codec.params, audio)
    print(f"encode: {audio.shape} -> {latents.shape}")
    recon = jax.jit(codec.decode_fn)(codec.params, latents)
    print(f"decode: {latents.shape} -> {recon.shape}")
    a = np.asarray(recon)[0, 0, : audio.shape[-1]]
    b = audio[0, 0, : a.shape[0]]
    snr = 10 * np.log10(np.mean(b**2) / (np.mean((a - b) ** 2) + 1e-12))
    print(f"round-trip SNR vs input: {snr:.1f} dB (codec is lossy; sanity only)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
