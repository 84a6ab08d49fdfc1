"""SV distillation trainer: teach the latent-domain ECAPA to match a
pretrained waveform speaker encoder via cosine loss.

Capability parity with the reference
(reference: src/scripts/train/dmd2/sv.py:13-106: decode latents -> audio ->
resample to 16 kHz -> frozen speechbrain ECAPA teacher embedding -> cosine
loss vs latent-domain student; NaN guard on teacher embeddings; grad-clip 5;
AdamW 1e-4, 200k steps, save every 1000).

The waveform teacher is pluggable (`teacher_fn`): in production, a converted
pretrained speaker encoder; in hermetic runs, a deterministic random-projection
embedder standing in for it (no speechbrain in this environment).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.codec import CodecConfig, codec_decode
from smalltts_tpu.models.sv import SVConfig, init_sv, sv_forward
from smalltts_tpu.ops.losses import cosine_loss


@dataclass(frozen=True)
class SVTrainConfig:
    num_steps: int = 200_000
    batch_size: int = 2
    save_every: int = 1_000
    grad_clip: float = 5.0


def make_fallback_teacher(emb_dim: int = 192, seed: int = 1234):
    """Deterministic stand-in waveform embedder (fixed random conv features +
    stats pooling). Used when no pretrained speaker encoder is available.

    -> (teacher_fn(teacher_params, audio), teacher_params) — params travel
    as step arguments everywhere (closures would bake them into the HLO)."""
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (256, 1, emb_dim)) / 16.0

    def teacher_fn(tp, audio: jax.Array, lengths=None) -> jax.Array:
        # audio (B, 1, T); lengths (B,) valid samples. Masked mean pooling:
        # an unmasked pool let decoded zero-latent padding (an arbitrary
        # waveform, NOT silence) dominate short utterances' targets
        # (review r3). The former mean+std concat sliced back to exactly
        # the mean ([:, :emb_dim] with emb_dim conv channels), so std was
        # dead compute — mean pooling IS the fallback's definition now.
        x = audio.transpose(0, 2, 1)
        feats = jax.lax.conv_general_dilated(
            x, tp["w"], (128,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
        )
        feats = jnp.tanh(feats)
        if lengths is None:
            return feats.mean(1)
        n_frames = jnp.clip((lengths - 256) // 128 + 1, 1, feats.shape[1])
        m = (jnp.arange(feats.shape[1])[None, :] < n_frames[:, None])
        m = m[..., None].astype(feats.dtype)
        return (feats * m).sum(1) / jnp.maximum(m.sum(1), 1.0)

    return teacher_fn, {"w": w}


def make_sv_step(cfg: SVConfig, codec_cfg: CodecConfig, tx, teacher_fn: Callable):
    """`teacher_fn(teacher_params, audio)` — the frozen teacher's weights are
    a step argument, never a closure (a closed-over voxceleb ECAPA would bake
    ~80 MB of literals into the HLO)."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, codec_params, teacher_params, batch):
        latents = batch["latents"]
        lengths = batch["latents_lengths"]
        # in-graph codec decode (the reference round-trips through an ONNX
        # session here, sv.py:56)
        audio = codec_decode(codec_params, latents, codec_cfg)
        # mask the teacher to true lengths like the reference does
        # (sv.py:58-66 passes audio_lengths to get_true_embeddings); the
        # student already masks, so an unmasked teacher made the target
        # depend on the batch's padding fraction (review r3)
        true_emb = jax.lax.stop_gradient(
            teacher_fn(teacher_params, audio, lengths * codec_cfg.hop))
        # NaN guard on teacher embeddings (sv.py:67-71)
        bad = jnp.any(~jnp.isfinite(true_emb), axis=-1)
        true_emb = jnp.nan_to_num(true_emb)

        def loss_fn(p):
            emb, new_p = sv_forward(p, cfg, latents, lengths, train=True)
            per = cosine_loss(emb, true_emb)
            per = jnp.where(bad, 0.0, per)
            return per.sum() / jnp.maximum((~bad).sum(), 1), new_p

        (loss, new_params), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(new_params, updates)
        return params, opt_state, loss

    return step


def train_sv(
    train_cfg: SVTrainConfig = SVTrainConfig(),
    model_cfg: SVConfig = SVConfig(),
    codec_cfg: CodecConfig = CodecConfig(),
    codec_params=None,
    teacher_fn: Optional[Callable] = None,  # (tp, audio, lengths=None) -> emb
    teacher_params=None,
    data_iter=None,
    seed: int = 0,
    checkpoint_dir: str = "assets/sv_checkpoints",
    log_every: int = 100,
):
    from smalltts_tpu.data.dummy import get_dummy_dataloader
    from smalltts_tpu.models.codec import init_codec
    from smalltts_tpu.train.optim import aux_optimizer
    from smalltts_tpu.utils import checkpoint as ckpt

    key = jax.random.PRNGKey(seed)
    params = init_sv(key, model_cfg)
    if codec_params is None:
        codec_params = init_codec(jax.random.PRNGKey(seed + 1), codec_cfg)
    if teacher_fn is None:
        teacher_fn, teacher_params = make_fallback_teacher(model_cfg.emb_dim)
    tx, _ = aux_optimizer(
        params, train_cfg.num_steps, 4_000, clip_norm=train_cfg.grad_clip
    )
    opt_state = tx.init(params)
    step_fn = make_sv_step(model_cfg, codec_cfg, tx, teacher_fn)
    data_iter = data_iter or get_dummy_dataloader(train_cfg.batch_size, seed)

    for step in range(train_cfg.num_steps):
        batch = next(data_iter)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
        params, opt_state, loss = step_fn(
            params, opt_state, codec_params, teacher_params, batch
        )
        if step % log_every == 0:
            print(f"step {step}: sv_cosine={float(loss):.4f}")
        if step % train_cfg.save_every == 0 and step > 1:
            ckpt.save_pytree(f"{checkpoint_dir}/checkpoint_latest.npz", params)
    return params
