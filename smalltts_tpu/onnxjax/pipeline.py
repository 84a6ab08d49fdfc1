"""ImportedSmallTTS: run the reference's PUBLISHED inference graphs on TPU.

The reference distributes its trained model as ONNX graphs —
assets/dmd/{condition_encoder,denoiser}.onnx + assets/codec/decoder.onnx
(reference: src/smalltts/infer/onnx.py:52-66) — not as torch checkpoints.
This class imports those exact files through onnxjax and fuses the whole
reference pipeline (cond encode -> 4-step DMD loop with fresh noise per
step -> codec decode) into ONE jitted XLA program, reproducing
src/smalltts/infer/onnx.py:68-129 semantics:

* seq_len = max(1, int(dur * SR / HOP))  — the Python client truncates;
  this class is the drop-in for that client, so it truncates too (the
  native pipeline follows the Rust server's ceil, a documented divergence);
* RoPE freqs computed at trace time (host-side in the reference, 40-47);
* x_pred starts at zeros; x_t = alpha*x_pred + sigma*fresh_noise; no CFG.

Positional I/O contract (infer/onnx.py:88-126):
  cond_encoder(ref[1,T,64] f32, ref_len[1] i64, phonemes[1,P] i64,
               phonemes_mask[1,P] bool)
      -> (k_ref, v_ref, ref_mask, k_text, v_text)   # rank-5 KV stacks
  denoiser(x_t, mask, t[1] f32, k_ref, v_ref, ref_mask, k_text, v_text,
           phonemes_mask, rope[1,S,64] f32) -> velocity
  codec_decoder(latents) -> audio

This is the guaranteed-voice path (zero weight mapping); the native
backbone + converted torch checkpoints is the fast path. Shapes compile per
(ref_T, P, seq_len) signature like any jit — wrap with the bucketing
pipeline for serving.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from smalltts_tpu.onnxjax.interp import OnnxFunction
from smalltts_tpu.onnxjax.proto import load_model
from smalltts_tpu.ops.schedule import get_alpha_sigma

SAMPLE_RATE = 24_000
HOP_SIZE = 3_200
NUM_STEPS = 4


def _rope_freqs(seq_len: int, dim: int = 64) -> np.ndarray:
    """Host-side RoPE table (reference: infer/onnx.py:40-47)."""
    inv_freq = 1.0 / (1e4 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32).reshape(1, -1)
    freqs = np.einsum("bi,j->bij", t, inv_freq)
    return np.stack([freqs, freqs], axis=-1).reshape(1, seq_len, dim)


class ImportedSmallTTS:
    """The reference's four ONNX graphs as one fused jitted synthesizer."""

    def __init__(
        self,
        cond_encoder_path: Optional[str] = None,
        denoiser_path: Optional[str] = None,
        codec_decoder_path: Optional[str] = None,
        codec_encoder_path: Optional[str] = None,
        num_steps: int = NUM_STEPS,
        seed: int = 0,
    ) -> None:
        import os as _os

        # None -> the published layout under SMALLTTS_ASSETS, resolved at
        # CALL time (an import-time "assets/..." constant ignored
        # certify --assets-root and probed the cwd, review r3)
        root = _os.environ.get("SMALLTTS_ASSETS", "assets")
        cond_encoder_path = cond_encoder_path or _os.path.join(
            root, "dmd", "condition_encoder.onnx")
        denoiser_path = denoiser_path or _os.path.join(
            root, "dmd", "denoiser.onnx")
        codec_decoder_path = codec_decoder_path or _os.path.join(
            root, "codec", "decoder.onnx")

        def load(path):
            # base_dir anchors external-data initializers to the MODEL's
            # directory (large exports split weights into sidecar files);
            # resolving them against the cwd silently loads the wrong bytes
            return OnnxFunction(load_model(path),
                                base_dir=_os.path.dirname(path) or ".")

        self.cond_enc = load(cond_encoder_path)
        self.denoiser = load(denoiser_path)
        self.codec_dec = load(codec_decoder_path)
        self.codec_enc = load(codec_encoder_path) if codec_encoder_path else None
        self.params = {
            "cond": self.cond_enc.params,
            "den": self.denoiser.params,
            "dec": self.codec_dec.params,
        }
        if self.codec_enc is not None:
            self.params["enc"] = self.codec_enc.params
        self.num_steps = num_steps
        self._key = jax.random.PRNGKey(seed)
        self._jit = jax.jit(
            self._synthesize_impl, static_argnames=("seq_len", "n_steps")
        )

    # -------------------------------------------------------------- core

    def _synthesize_impl(self, params, ref, ref_len, phonemes, phonemes_mask,
                         key, noises, seq_len: int, n_steps: int):
        with jax.default_matmul_precision("highest"):
            k_ref, v_ref, ref_mask, k_text, v_text = self.cond_enc(
                params["cond"], ref, ref_len, phonemes, phonemes_mask
            )
            rope = jnp.asarray(_rope_freqs(seq_len))
            mask = jnp.ones((1, seq_len), bool)
            ts = jnp.linspace(1.0, 0.0, n_steps, dtype=jnp.float32)

            def body(i, carry):
                x_pred, k = carry
                t_val = ts[i]
                alpha, sigma = get_alpha_sigma(t_val)
                if noises is None:
                    k, sub = jax.random.split(k)
                    noise = jax.random.normal(sub, x_pred.shape, jnp.float32)
                else:
                    noise = lax.dynamic_index_in_dim(noises, i, keepdims=False)
                x_t = alpha * x_pred + sigma * noise
                velocity = self.denoiser(
                    params["den"], x_t, mask, t_val[None], k_ref, v_ref,
                    ref_mask, k_text, v_text, phonemes_mask, rope,
                )
                if isinstance(velocity, tuple):
                    velocity = velocity[0]
                return (alpha * x_t - sigma * velocity, k)

            x_pred, _ = lax.fori_loop(0, n_steps, body, (
                jnp.zeros((1, seq_len, ref.shape[-1]), jnp.float32), key
            ))
            audio = self.codec_dec(params["dec"], x_pred)
            if isinstance(audio, tuple):
                audio = audio[0]
            return audio

    # ---------------------------------------------------------- public API

    def synthesize(
        self,
        ref_latents: np.ndarray,        # (T, 64)
        phoneme_ids: Sequence[int],
        duration_sec: float,
        key=None,
        noises: Optional[np.ndarray] = None,  # (steps, 1, S, 64) parity injection
    ) -> np.ndarray:
        """-> (1, samples) float32 @ 24 kHz (reference: infer/onnx.py:68-129)."""
        seq_len = max(1, int(duration_sec * SAMPLE_RATE / HOP_SIZE))
        ref = np.asarray(ref_latents, np.float32)[None]
        ref_len = np.array([ref.shape[1]], np.int64)
        phonemes = np.array([list(phoneme_ids)], np.int64)
        phonemes_mask = np.ones_like(phonemes, bool)
        if noises is not None and np.shape(noises)[0] != self.num_steps:
            # dynamic_index_in_dim CLAMPS: a mismatched injection silently
            # reused the last noise slice and corrupted parity comparisons
            # (same bug class fixed in infer/sampler.py, review r3)
            raise ValueError(
                f"noises has {np.shape(noises)[0]} steps, "
                f"num_steps={self.num_steps}")
        if key is None:
            self._key, key = jax.random.split(self._key)
        audio = self._jit(
            self.params, jnp.asarray(ref), jnp.asarray(ref_len),
            jnp.asarray(phonemes), jnp.asarray(phonemes_mask), key,
            None if noises is None else jnp.asarray(noises, jnp.float32),
            seq_len=seq_len, n_steps=self.num_steps,
        )
        return np.asarray(audio)[0]

    def encode_reference(self, audio_24k: np.ndarray) -> np.ndarray:
        """(T,) waveform -> (T', 64) latents via the imported encoder."""
        if self.codec_enc is None:
            raise ValueError("built without codec_encoder_path")
        t = len(audio_24k)
        pad = (-t) % HOP_SIZE
        wav = np.pad(np.asarray(audio_24k, np.float32), (0, pad))[None, None]
        with jax.default_matmul_precision("highest"):
            out = self.codec_enc(self.params["enc"], jnp.asarray(wav))
        return np.asarray(out)[0]


def assets_present(root: str = None) -> bool:
    import os

    if root is None:
        root = os.environ.get("SMALLTTS_ASSETS", "assets")
    return all(
        os.path.isfile(os.path.join(root, p))
        for p in ("dmd/condition_encoder.onnx", "dmd/denoiser.onnx",
                  "codec/decoder.onnx")
    )
