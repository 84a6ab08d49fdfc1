"""The reference VibeVoice codec, imported from its ONNX assets into JAX.

This is the bridge that lets converted reference checkpoints produce the
reference's actual voices: the published `assets/codec/{encoder,decoder}.onnx`
graphs (reference: src/smalltts/codec/onnx.py:34-85) are parsed and lowered
to jitted JAX functions with the same I/O contract —
`encode(audio[B,1,T]) -> latents[B,T',64]`, `decode(latents) -> audio[B,1,T]`.

Role split: this imported codec is the *parity/quality reference* (and the
distillation target for the fast codec); the sub-pixel native codec
(models/codec.py) remains the serving default. All compute runs at fp32 with
`jax.default_matmul_precision("highest")` — on TPU the default bf16 matmul
passes cost ~5e-4 waveform error, which matters for a parity reference.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from smalltts_tpu.onnxjax.interp import OnnxFunction
from smalltts_tpu.onnxjax.proto import load_model

# sentinel: resolve against SMALLTTS_ASSETS at CALL time — a module-import
# constant baked in whatever cwd/env held when onnxjax.codec was first
# imported, so certify --assets-root silently probed ./assets (review r3)
DEFAULT_ENCODER = "<assets>/codec/encoder.onnx"
DEFAULT_DECODER = "<assets>/codec/decoder.onnx"


def _resolve(p: Optional[str]) -> Optional[str]:
    if p is None:
        return None
    root = os.environ.get("SMALLTTS_ASSETS", "assets")
    return p.replace("<assets>", root, 1) if p.startswith("<assets>") else p


def assets_present(
    encoder_path: str = DEFAULT_ENCODER, decoder_path: str = DEFAULT_DECODER
) -> bool:
    return (os.path.isfile(_resolve(encoder_path))
            and os.path.isfile(_resolve(decoder_path)))


class OnnxCodec:
    """VibeVoice codec as two jittable JAX functions + a params pytree.

    `params` is `{"encoder": {...}, "decoder": {...}}` so it slots into the
    same checkpoint/donation/sharding machinery as any other model. Either
    side may be omitted (decode-only serving needs no encoder).
    """

    def __init__(
        self,
        encoder_path: Optional[str] = DEFAULT_ENCODER,
        decoder_path: Optional[str] = DEFAULT_DECODER,
    ) -> None:
        encoder_path = _resolve(encoder_path)
        decoder_path = _resolve(decoder_path)
        self._enc = self._dec = None
        params = {}
        if encoder_path is not None:
            model = load_model(encoder_path)
            self._enc = OnnxFunction(model, base_dir=os.path.dirname(encoder_path) or ".")
            params["encoder"] = self._enc.params
        if decoder_path is not None:
            model = load_model(decoder_path)
            self._dec = OnnxFunction(model, base_dir=os.path.dirname(decoder_path) or ".")
            params["decoder"] = self._dec.params
        if not params:
            raise ValueError("OnnxCodec needs at least one of encoder/decoder")
        self.params = params

    @property
    def encoder(self):
        """Imported encoder OnnxFunction, or None (decode-only build)."""
        return self._enc

    @property
    def decoder(self):
        return self._dec

    # Pure functions over (params, x) so they compose into fused jitted
    # graphs (the whole-synthesis graph calls decode_fn inline).

    def encode_fn(self, params, audio: jax.Array) -> jax.Array:
        """(B, 1, T) fp32 24 kHz -> (B, T', 64)."""
        if self._enc is None:
            raise ValueError("OnnxCodec was built without an encoder")
        with jax.default_matmul_precision("highest"):
            return self._enc(params["encoder"], audio.astype(jnp.float32))

    def decode_fn(self, params, latents: jax.Array) -> jax.Array:
        """(B, T', 64) -> (B, 1, T) fp32 waveform."""
        if self._dec is None:
            raise ValueError("OnnxCodec was built without a decoder")
        with jax.default_matmul_precision("highest"):
            return self._dec(params["decoder"], latents.astype(jnp.float32))

    def describe(self) -> str:
        lines = []
        for name, fn in (("encoder", self._enc), ("decoder", self._dec)):
            if fn is None:
                continue
            n_params = sum(int(v.size) for v in fn.params.values())
            lines.append(
                f"{name}: {len(fn.model.graph.nodes)} nodes, "
                f"{n_params / 1e6:.1f}M params, ops={','.join(fn.ops_used())}"
            )
        return "\n".join(lines)
