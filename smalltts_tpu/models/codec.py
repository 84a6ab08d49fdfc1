"""Neural audio codec: 24 kHz waveform <-> 64-dim latents at hop 3200.

Capability parity with the reference codec interface
(reference: src/smalltts/codec/onnx.py:34-85 — VibeVoice ONNX wrappers:
`Encoder.encode(audio[B,1,T]) -> latents[B,T',64]`,
`Decoder.decode(latents) -> audio[B,1,T]`), rebuilt as a native JAX model so
codec decode fuses into the same jitted graph as the denoiser instead of a
separate ONNX session with host round-trips.

Architecture: DAC/EnCodec-family fully-convolutional codec — snake
activations, dilated residual units, strided downsampling 4*4*5*5*8 = 3200.
The VibeVoice ONNX graphs ship weights only (no source); when those assets
are present, `smalltts_tpu.codec.onnx_import` can map them instead — this
module is the from-scratch TPU-native codec with the identical contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smalltts_tpu.ops import nn


@dataclass(frozen=True)
class CodecConfig:
    latent_dim: int = 64
    strides: Tuple[int, ...] = (4, 4, 5, 5, 8)  # product == hop 3200
    channels: Tuple[int, ...] = (48, 96, 192, 384, 768)
    res_dilations: Tuple[int, ...] = (1, 3)
    kernel: int = 7

    @property
    def hop(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out


def snake(x: jax.Array, log_alpha: jax.Array) -> jax.Array:
    """Snake activation x + sin^2(a x)/a (periodic inductive bias for audio)."""
    a = jnp.exp(log_alpha).astype(x.dtype)
    return x + jnp.sin(a * x) ** 2 / a


def _init_res_unit(key, ch: int, kernel: int, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "log_alpha1": jnp.zeros((ch,), dtype),
        "conv1": nn.init_conv1d(k1, ch, ch, kernel, dtype=dtype),
        "log_alpha2": jnp.zeros((ch,), dtype),
        "conv2": nn.init_conv1d(k2, ch, ch, 1, dtype=dtype),
    }


def _res_unit(p, x, d: int):
    """Dilated residual unit; dilation `d` is static (from CodecConfig)."""
    h = snake(x, p["log_alpha1"])
    k = p["conv1"]["w"].shape[0]
    pad = (k - 1) * d // 2
    h = lax.conv_general_dilated(
        h, p["conv1"]["w"].astype(x.dtype), (1,), [(pad, pad)],
        rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    h = (h + p["conv1"]["b"].astype(jnp.float32)).astype(x.dtype)
    h = snake(h, p["log_alpha2"])
    h = nn.conv1d(p["conv2"], h, padding=0)
    return x + h


def _strided_conv(p, x, stride: int):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _transposed_conv(p, x, stride: int):
    y = lax.conv_transpose(
        x, p["w"].astype(x.dtype), (stride,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def init_codec(key, cfg: CodecConfig = CodecConfig(), dtype=jnp.float32):
    n = len(cfg.strides)
    keys = jax.random.split(key, 2 * n * (len(cfg.res_dilations) + 1) + 6)
    ki = iter(range(len(keys)))

    enc_stages = []
    ch_prev = cfg.channels[0]
    for i, s in enumerate(cfg.strides):
        ch = cfg.channels[i]
        enc_stages.append({
            "res": [
                _init_res_unit(keys[next(ki)], ch_prev, cfg.kernel, dtype)
                for _ in cfg.res_dilations
            ],
            "log_alpha": jnp.zeros((ch_prev,), dtype),
            "down": nn.init_conv1d(keys[next(ki)], ch_prev, ch, 2 * s, dtype=dtype),
        })
        ch_prev = ch

    dec_stages = []
    for i, s in reversed(list(enumerate(cfg.strides))):
        ch_in = cfg.channels[i]
        ch_out = cfg.channels[i - 1] if i > 0 else cfg.channels[0]
        dec_stages.append({
            "log_alpha": jnp.zeros((ch_in,), dtype),
            "up": nn.init_conv1d(keys[next(ki)], ch_in, ch_out, 2 * s, dtype=dtype),
            "res": [
                _init_res_unit(keys[next(ki)], ch_out, cfg.kernel, dtype)
                for _ in cfg.res_dilations
            ],
        })

    return {
        "enc_in": nn.init_conv1d(keys[next(ki)], 1, cfg.channels[0], cfg.kernel, dtype=dtype),
        "enc_stages": enc_stages,
        "enc_out": nn.init_conv1d(keys[next(ki)], cfg.channels[-1], cfg.latent_dim, 3, dtype=dtype),
        "dec_in": nn.init_conv1d(keys[next(ki)], cfg.latent_dim, cfg.channels[-1], 3, dtype=dtype),
        "dec_stages": dec_stages,
        "dec_log_alpha": jnp.zeros((cfg.channels[0],), dtype),
        "dec_out": nn.init_conv1d(keys[next(ki)], cfg.channels[0], 1, cfg.kernel, dtype=dtype),
    }


def codec_encode(p, audio: jax.Array, cfg: CodecConfig = CodecConfig()) -> jax.Array:
    """(B, 1, T) 24 kHz waveform -> (B, T//3200, latent_dim). T must be a
    multiple of hop (pad host-side; see infer.pipeline)."""
    x = audio.transpose(0, 2, 1)  # channel-last (B, T, 1)
    x = nn.conv1d(p["enc_in"], x)
    for stage, s in zip(p["enc_stages"], cfg.strides):
        for r, d in zip(stage["res"], cfg.res_dilations):
            x = _res_unit(r, x, d)
        x = snake(x, stage["log_alpha"])
        x = _strided_conv(stage["down"], x, s)
    return nn.conv1d(p["enc_out"], x)


def codec_decode(p, latents: jax.Array, cfg: CodecConfig = CodecConfig()) -> jax.Array:
    """(B, T', latent_dim) -> (B, 1, T'*3200) waveform in [-1, 1]."""
    x = nn.conv1d(p["dec_in"], latents)
    for stage, s in zip(p["dec_stages"], reversed(cfg.strides)):
        x = snake(x, stage["log_alpha"])
        x = _transposed_conv(stage["up"], x, s)
        for r, d in zip(stage["res"], cfg.res_dilations):
            x = _res_unit(r, x, d)
    x = snake(x, p["dec_log_alpha"])
    x = jnp.tanh(nn.conv1d(p["dec_out"], x))
    return x.transpose(0, 2, 1)
