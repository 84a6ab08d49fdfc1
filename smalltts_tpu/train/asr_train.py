"""ASR (CTC) trainer — capability parity with the reference
(reference: src/scripts/train/dmd2/asr.py:10-92: BATCH 2, 200k steps, AdamW
1e-4, warmup 4000 -> cosine 1e-5, save every 2000)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.asr import ASRConfig, asr_forward, init_asr
from smalltts_tpu.ops.masking import length_mask


@dataclass(frozen=True)
class ASRTrainConfig:
    num_steps: int = 200_000
    batch_size: int = 2
    save_every: int = 2_000
    warmup: int = 4_000


def asr_ctc_loss(params, cfg: ASRConfig, batch, train: bool = True):
    latents = batch["latents"]
    log_probs, out_lens, new_params = asr_forward(
        params, cfg, latents, batch["latents_lengths"], train=train
    )
    logit_pad = 1.0 - length_mask(out_lens, log_probs.shape[1]).astype(jnp.float32)
    ph = batch["phonemes"]
    ph_len = batch["phonemes_lengths"]
    label_pad = 1.0 - length_mask(ph_len, ph.shape[1]).astype(jnp.float32)
    per = optax.ctc_loss(log_probs, logit_pad, ph, label_pad)
    loss = (per / jnp.maximum(ph_len.astype(jnp.float32), 1.0)).mean()
    return loss, new_params


def make_asr_step(cfg: ASRConfig, tx):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (loss, new_params), grads = jax.value_and_grad(asr_ctc_loss, has_aux=True)(
            params, cfg, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(new_params, updates)
        return params, opt_state, loss

    return step


def train_asr(
    train_cfg: ASRTrainConfig = ASRTrainConfig(),
    model_cfg: ASRConfig = ASRConfig(),
    data_iter=None,
    seed: int = 0,
    checkpoint_dir: str = "assets/asr_checkpoints",
    log_every: int = 100,
):
    from smalltts_tpu.data.dummy import get_dummy_dataloader
    from smalltts_tpu.train.optim import aux_optimizer
    from smalltts_tpu.utils import checkpoint as ckpt

    key = jax.random.PRNGKey(seed)
    params = init_asr(key, model_cfg)
    tx, sched = aux_optimizer(params, train_cfg.num_steps, train_cfg.warmup)
    opt_state = tx.init(params)
    step_fn = make_asr_step(model_cfg, tx)
    data_iter = data_iter or get_dummy_dataloader(train_cfg.batch_size, seed)

    for step in range(train_cfg.num_steps):
        batch = next(data_iter)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if step % log_every == 0:
            print(f"step {step}: asr_ctc={float(loss):.4f}")
        if step % train_cfg.save_every == 0 and step > 1:
            ckpt.save_pytree(f"{checkpoint_dir}/checkpoint_latest.npz", params)
    return params
