"""Pretrained waveform speaker-verification teacher (speechbrain-equivalent).

The reference distills its latent-domain SV student from the pretrained
`speechbrain/spkrec-ecapa-voxceleb` EncoderClassifier operating on 16 kHz
audio (reference: src/smalltts/models/sv/true.py:7-33, consumed by
src/scripts/train/dmd2/sv.py:45-66). Round 1 only had an injection point +
random fallback; this module provides the real path:

* `fbank`            — 80-dim log-mel features matching speechbrain's Fbank
                       (25 ms hamming window / 10 ms hop / n_fft 400, power
                       spectrum, 10*log10 with top_db 80) in pure jnp;
* `mean_norm`        — per-utterance ("sentence") mean normalization,
                       speechbrain InputNormalization(std_norm=False);
* `resample_24k_to_16k` — in-graph polyphase sinc resampler so the whole
                       decode->resample->teacher chain stays one XLA program
                       (the reference round-trips via torchaudio on host);
* the voxceleb ECAPA configuration over models/sv.py machinery (input 80,
  channels 1024x4+3072, kernels 5/3/3/3/1, dilations 1/2/3/4/1, attention
  128, res2net scale 8, SE 128, emb 192);
* `convert_speechbrain_teacher` — maps the published EncoderClassifier
  state_dict (with or without the `embedding_model.` prefix) onto our pytree.

Numerics note: feature parity with speechbrain is reproduced from its
published implementation; an asset-gated test validates against real
checkpoints/goldens where available. Boundary frames can deviate slightly
(our ECAPA is padding-invariant; speechbrain's convs leak across padding).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from smalltts_tpu.models.sv import SVConfig, init_sv, sv_forward
from smalltts_tpu.utils.torch_convert import convert_sv_state_dict

VOXCELEB_ECAPA = SVConfig(
    input_dim=80,
    emb_dim=192,
    channels=(1024, 1024, 1024, 1024, 3072),
    kernel_sizes=(5, 3, 3, 3, 1),
    dilations=(1, 2, 3, 4, 1),
    attention_channels=128,
    res2net_scale=8,
    se_channels=128,
)


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16_000
    n_fft: int = 400
    win_length: int = 400   # 25 ms
    hop_length: int = 160   # 10 ms
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8_000.0
    top_db: float = 80.0
    amin: float = 1e-10


def _mel_filters(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank, speechbrain/torchaudio HTK-style (no
    slaney normalization): (n_fft//2+1, n_mels)."""
    n_freqs = cfg.n_fft // 2 + 1
    all_freqs = np.linspace(0, cfg.sample_rate / 2, n_freqs)
    mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)  # noqa: E731
    inv_mel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    pts = inv_mel(np.linspace(mel(cfg.f_min), mel(cfg.f_max), cfg.n_mels + 2))
    f_diff = pts[1:] - pts[:-1]                      # (n_mels+1,)
    slopes = pts[None, :] - all_freqs[:, None]       # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def fbank(audio: jax.Array, cfg: FbankConfig = FbankConfig()) -> jax.Array:
    """(B, T) 16 kHz waveform -> (B, frames, n_mels) log-mel features.

    Matches speechbrain Fbank: centered constant-pad STFT with a (periodic)
    hamming window, power spectrum, HTK mel triangles, 10*log10 with amin
    1e-10 and per-utterance top_db 80 floor."""
    b, t = audio.shape
    pad = cfg.n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)))
    n_frames = 1 + (t + 2 * pad - cfg.n_fft) // cfg.hop_length
    idx = (
        np.arange(cfg.n_fft)[None, :]
        + cfg.hop_length * np.arange(n_frames)[:, None]
    )
    frames = x[:, idx]                                    # (B, F, n_fft)
    window = np.hamming(cfg.win_length + 1)[:-1].astype(np.float32)  # periodic
    spec = jnp.fft.rfft(frames * window, n=cfg.n_fft)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2     # (B, F, n_fft/2+1)
    mel = power @ jnp.asarray(_mel_filters(cfg))
    db = 10.0 * jnp.log10(jnp.maximum(mel, cfg.amin))
    floor = db.max(axis=(1, 2), keepdims=True) - cfg.top_db
    return jnp.maximum(db, floor)


def mean_norm(feats: jax.Array, lengths: jax.Array = None) -> jax.Array:
    """Per-utterance mean subtraction over time (speechbrain
    InputNormalization norm_type='sentence', std_norm=False)."""
    if lengths is None:
        return feats - feats.mean(axis=1, keepdims=True)
    mask = (
        jnp.arange(feats.shape[1])[None, :] < lengths[:, None]
    )[..., None].astype(feats.dtype)
    mean = (feats * mask).sum(1, keepdims=True) / jnp.maximum(
        mask.sum(1, keepdims=True), 1.0
    )
    return feats - mean


def _polyphase_kernel(up: int, down: int, width: int = 32, beta: float = 14.769656):
    """Kaiser-windowed sinc lowpass for rational resampling (gain `up`)."""
    cutoff = 1.0 / max(up, down)
    half = width * max(up, down)
    n = np.arange(-half, half + 1)
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(2 * half + 1, beta) * up
    return h.astype(np.float32)


def resample_24k_to_16k(audio: jax.Array) -> jax.Array:
    """(B, 1, T) 24 kHz -> (B, 1, 2T/3) 16 kHz, in-graph polyphase sinc
    (up 2 / down 3). Same role as the reference's torchaudio resample before
    the teacher (src/scripts/train/dmd2/sv.py:58-66)."""
    h = _polyphase_kernel(2, 3)
    k = h.shape[0]
    x = audio.transpose(0, 2, 1)  # (B, T, 1)
    y = lax.conv_general_dilated(
        x,
        jnp.asarray(h)[:, None, None],
        window_strides=(3,),
        padding=[(k // 2, k // 2)],
        lhs_dilation=(2,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y.transpose(0, 2, 1)


def init_sv_teacher(key, cfg: SVConfig = VOXCELEB_ECAPA, dtype=jnp.float32):
    return init_sv(key, cfg, dtype)


def sv_teacher_embed(
    params,
    audio_16k: jax.Array,   # (B, 1, T) in [-1, 1]
    lengths: jax.Array = None,  # (B,) samples
    cfg: SVConfig = VOXCELEB_ECAPA,
    fbank_cfg: FbankConfig = FbankConfig(),
) -> jax.Array:
    """16 kHz waveform -> (B, 192) speaker embedding (unnormalized, like
    encode_batch(normalize=False), true.py:27-33)."""
    wav = audio_16k[:, 0, :]
    feats = fbank(wav, fbank_cfg)
    if lengths is None:
        frame_lengths = jnp.full((wav.shape[0],), feats.shape[1], jnp.int32)
    else:
        frame_lengths = jnp.minimum(
            lengths // fbank_cfg.hop_length + 1, feats.shape[1]
        ).astype(jnp.int32)
    feats = mean_norm(feats, frame_lengths)
    emb, _ = sv_forward(params, cfg, feats, frame_lengths, train=False)
    return emb


def convert_speechbrain_teacher(sd) -> dict:
    """speechbrain EncoderClassifier / embedding_model.ckpt state_dict ->
    our pytree (strips the `embedding_model.` prefix when present)."""
    if any(k.startswith("embedding_model.") for k in sd):
        sd = {
            k[len("embedding_model."):]: v
            for k, v in sd.items()
            if k.startswith("embedding_model.")
        }
    return convert_sv_state_dict(sd, res2net_scale=VOXCELEB_ECAPA.res2net_scale)


def make_teacher_fn(params, cfg: SVConfig = VOXCELEB_ECAPA):
    """Waveform teacher for train/sv_train.py: takes the codec's 24 kHz
    (B, 1, T) audio, resamples in-graph, returns (B, 192) embeddings.

    -> (teacher_fn(teacher_params, audio), teacher_params): the step passes
    the frozen weights as arguments (a closure would bake ~80 MB of ECAPA
    literals into the jitted step's HLO)."""

    def teacher_fn(tp, audio_24k: jax.Array, lengths=None) -> jax.Array:
        # lengths: (B,) valid samples at 24 kHz; scaled to 16 kHz so the
        # fbank/pooling mask matches the resampled waveform (the reference
        # passes audio_lengths to get_true_embeddings, sv.py:58-66)
        lengths_16k = None if lengths is None else (lengths * 2) // 3
        return sv_teacher_embed(tp, resample_24k_to_16k(audio_24k),
                                lengths_16k, cfg=cfg)

    return teacher_fn, params


def load_teacher(path: str):
    """Load a speechbrain embedding_model.ckpt (torch) or our .npz."""
    if path.endswith(".npz"):
        from smalltts_tpu.utils.checkpoint import load_pytree

        return load_pytree(path)
    import torch

    from smalltts_tpu.utils.torch_convert import state_dict_to_numpy

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_speechbrain_teacher(state_dict_to_numpy(sd))
