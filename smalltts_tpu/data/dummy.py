"""Dummy data: random padded batches, the universal training fixture.

Capability parity with the reference dummy loader
(reference: src/smalltts/data/dummy.py:9-52 — phoneme len 5..198, latent len
20..256, ref latent len 8..64, padded + length tensors; the only in-repo data
backend, "bring your own data").

TPU-first difference: batches have FIXED maximal shapes (pad-to-max rather
than pad-to-longest) so every training step reuses one compiled graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator

import numpy as np

from smalltts_tpu.text.vocab import phoneme_len


@dataclass(frozen=True)
class DummyDataConfig:
    batch_size: int = 2
    latent_dim: int = 64
    max_phonemes: int = 198
    min_phonemes: int = 5
    max_latents: int = 256
    min_latents: int = 20
    max_ref: int = 64
    min_ref: int = 8
    vocab: int = phoneme_len


def dummy_batch(rng: np.random.Generator, cfg: DummyDataConfig = DummyDataConfig()) -> Dict[str, np.ndarray]:
    b = cfg.batch_size
    ph_lens = rng.integers(cfg.min_phonemes, cfg.max_phonemes + 1, size=b)
    phonemes = np.zeros((b, cfg.max_phonemes), np.int32)
    for i, n in enumerate(ph_lens):
        phonemes[i, :n] = rng.integers(1, cfg.vocab, size=n)

    lat_lens = rng.integers(cfg.min_latents, cfg.max_latents + 1, size=b)
    latents = rng.standard_normal((b, cfg.max_latents, cfg.latent_dim), dtype=np.float32)
    for i, n in enumerate(lat_lens):
        latents[i, n:] = 0.0

    ref_lens = rng.integers(cfg.min_ref, cfg.max_ref + 1, size=b)
    ref = rng.standard_normal((b, cfg.max_ref, cfg.latent_dim), dtype=np.float32)
    for i, n in enumerate(ref_lens):
        ref[i, n:] = 0.0

    return {
        "texts": [f"dummy text {i}" for i in range(b)],
        "phonemes": phonemes,
        "phonemes_lengths": ph_lens.astype(np.int32),
        "latents": latents,
        "latents_lengths": lat_lens.astype(np.int32),
        "ref_latents": ref,
        "ref_latents_lengths": ref_lens.astype(np.int32),
    }


def get_dummy_dataloader(
    batch_size: int, seed: int = 0, cfg: DummyDataConfig = None
) -> Iterator[Dict[str, np.ndarray]]:
    print("warn: using dummy data, you probably want to use real data")
    cfg = cfg or DummyDataConfig(batch_size=batch_size)
    # per-process decorrelation for multi-host dp (see data/local.py)
    import jax

    rng = np.random.default_rng(seed + 100_003 * jax.process_index())
    while True:
        yield dummy_batch(rng, cfg)
