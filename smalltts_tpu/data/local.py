"""Local-corpus data pipeline: (wav, text) pairs -> fixed-shape train batches.

The reference ships NO real data backend — its only loader emits random
tensors ("bring your own data", reference: src/smalltts/data/dummy.py and
README.md:130). This module is the bridge users actually need: a directory
of audio + transcripts becomes training batches with the exact key/shape
contract of data/dummy.py (fixed maximal shapes, one compiled step graph):

  {texts, phonemes(+lengths), latents(+lengths), ref_latents(+lengths)}

Corpus layout (either):
  * metadata.csv with `wav_path|transcript` lines (LJSpeech-style), or
  * {name}.wav next to {name}.txt files.

Pipeline, TPU-first:
  * host threads decode/resample wavs and phonemize text (espeak is a C
    library call — keep it off the training thread);
  * codec encoding (waveform -> 64-dim latents) runs BATCHED on device via
    the provided `encode_fn`, amortizing dispatch;
  * `ref_latents` are a random crop of the SAME utterance, disjoint from the
    target crop when the clip is long enough (self-reference voice cloning —
    the standard zero-shot TTS recipe; the reference's dummy loader has no
    notion of this pairing at all);
  * a background prefetch thread keeps `prefetch` batches ready so the
    accelerator never waits on IO.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from smalltts_tpu.data.dummy import DummyDataConfig


@dataclass(frozen=True)
class LocalDataConfig:
    batch_size: int = 2
    latent_dim: int = 64
    max_phonemes: int = 198
    max_latents: int = 256
    max_ref: int = 64
    min_latents: int = 8
    sample_rate: int = 24_000
    hop: int = 3_200
    prefetch: int = 2


def scan_corpus(root: str) -> List[Tuple[str, str]]:
    """-> [(wav_path, transcript)] from metadata.csv or sidecar .txt files."""
    meta = os.path.join(root, "metadata.csv")
    pairs: List[Tuple[str, str]] = []
    if os.path.isfile(meta):
        for line in open(meta, encoding="utf-8"):
            line = line.strip()
            if not line:
                continue
            # LJSpeech metadata is id|raw_text|normalized_text — take the
            # LAST non-empty field (normalized preferred; plain id|text
            # files have just the one). partition() kept everything after
            # the first '|', feeding 'raw|normalized' into the phonemizer
            # (review r3).
            fields = line.split("|")
            wav = fields[0]
            text = next((f for f in reversed(fields[1:]) if f.strip()), "")
            wav = wav if os.path.isabs(wav) else os.path.join(root, wav)
            if not wav.endswith(".wav"):
                wav += ".wav"
            pairs.append((wav, text))
    else:
        for name in sorted(os.listdir(root)):
            if not name.endswith(".wav"):
                continue
            txt = os.path.join(root, name[:-4] + ".txt")
            if os.path.isfile(txt):
                pairs.append((
                    os.path.join(root, name),
                    open(txt, encoding="utf-8").read().strip(),
                ))
    if not pairs:
        raise ValueError(f"no (wav, text) pairs found under {root!r}")
    return pairs


class LocalDataset:
    """Decoded + phonemized + codec-encoded corpus, served as train batches."""

    def __init__(
        self,
        root: str,
        encode_fn,  # (audio (B,1,T) f32) -> latents (B,T',D); device-batched
        cfg: LocalDataConfig = LocalDataConfig(),
        tokenizer=None,
        encode_batch: int = 8,
    ) -> None:
        from smalltts_tpu.serving import audio_io

        if tokenizer is None:
            from smalltts_tpu.text import get_token_ids

            tokenizer = get_token_ids
        self.cfg = cfg
        pairs = scan_corpus(root)

        # corpus prep is decode+resample bound; the C++/numpy audio backend
        # releases the GIL, so a thread pool scales with cores
        def prep(pair):
            wav_path, text = pair
            try:
                audio = audio_io.decode_and_resample(
                    open(wav_path, "rb").read(), cfg.sample_rate
                )
            except Exception as exc:  # noqa: BLE001
                # one corrupt/unsupported file must not kill corpus prep
                # (pool.map re-raises at collection time otherwise); skip
                # with a visible reason — mirrors min-length skips below
                import sys

                print(f"warn: skipping {wav_path}: {exc}", file=sys.stderr)
                return None
            n = (len(audio) // cfg.hop) * cfg.hop
            if n < cfg.min_latents * cfg.hop:
                return None
            ids = np.asarray(tokenizer(text), np.int32)[: cfg.max_phonemes]
            if len(ids) == 0:
                return None
            return audio[:n].astype(np.float32), ids, text

        from concurrent.futures import ThreadPoolExecutor

        tokenizer("a")  # construct the (espeak) backend once, serially
        workers = min(len(pairs), max(2, (os.cpu_count() or 2)))
        with ThreadPoolExecutor(workers) as pool:
            prepped = [p for p in pool.map(prep, pairs) if p is not None]
        clips: List[np.ndarray] = [c for c, _, _ in prepped]
        tokens: List[np.ndarray] = [t for _, t, _ in prepped]
        self.texts: List[str] = [x for _, _, x in prepped]
        if not clips:
            raise ValueError(
                f"all clips under {root!r} shorter than "
                f"{cfg.min_latents * cfg.hop / cfg.sample_rate:.1f} s or untokenizable"
            )
        self.tokens = tokens
        # device-batched codec encoding, bucketed by frame count so XLA
        # compiles a handful of encode shapes, not one per clip
        self.latents: List[np.ndarray] = [None] * len(clips)
        order = np.argsort([len(c) for c in clips])
        # pad target rounds UP to a coarse ladder (64-frame multiples): the
        # raw per-group max is sample-dependent and compiled a fresh XLA
        # encode executable for nearly every group of clips (review r3)
        quantum = cfg.hop * 64
        for i in range(0, len(order), encode_batch):
            idx = order[i : i + encode_batch]
            t_max = max(len(clips[j]) for j in idx)
            t_max = -(-t_max // quantum) * quantum
            batch = np.zeros((len(idx), 1, t_max), np.float32)
            for row, j in enumerate(idx):
                batch[row, 0, : len(clips[j])] = clips[j]
            lat = np.asarray(encode_fn(batch))
            for row, j in enumerate(idx):
                self.latents[j] = lat[row, : len(clips[j]) // cfg.hop].astype(
                    np.float32
                )

    def __len__(self) -> int:
        return len(self.tokens)

    def sample_batch(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        b = cfg.batch_size
        ph = np.zeros((b, cfg.max_phonemes), np.int32)
        ph_lens = np.zeros((b,), np.int32)
        lat = np.zeros((b, cfg.max_latents, cfg.latent_dim), np.float32)
        lat_lens = np.zeros((b,), np.int32)
        ref = np.zeros((b, cfg.max_ref, cfg.latent_dim), np.float32)
        ref_lens = np.zeros((b,), np.int32)
        texts = []
        for i in range(b):
            j = int(rng.integers(len(self.tokens)))
            ids = self.tokens[j]
            full = self.latents[j]
            texts.append(self.texts[j])  # dummy.py contract: strings
            ph_lens[i] = len(ids)
            ph[i, : len(ids)] = ids
            n = len(full)
            # target crop (up to max_latents) + ref crop from the remainder
            # of the same utterance when possible (disjoint self-reference)
            t_len = min(n, cfg.max_latents)
            t0 = int(rng.integers(0, n - t_len + 1))
            lat_lens[i] = t_len
            lat[i, :t_len] = full[t0 : t0 + t_len]
            rest_spans = [(0, t0), (t0 + t_len, n)]
            spans = [(a, z) for a, z in rest_spans if z - a >= 2]
            if spans:
                a, z = spans[int(rng.integers(len(spans)))]
            else:
                a, z = 0, n  # short clip: ref overlaps target
            r_len = min(z - a, cfg.max_ref)
            r0 = int(rng.integers(a, z - r_len + 1))
            ref_lens[i] = r_len
            ref[i, :r_len] = full[r0 : r0 + r_len]
        return {
            "texts": texts,
            "phonemes": ph,
            "phonemes_lengths": ph_lens,
            "latents": lat,
            "latents_lengths": lat_lens,
            "ref_latents": ref,
            "ref_latents_lengths": ref_lens,
        }


def get_local_dataloader(
    root: str,
    encode_fn,
    cfg: Optional[LocalDataConfig] = None,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite prefetching iterator over a local corpus (drop-in for
    data/dummy.get_dummy_dataloader)."""
    cfg = cfg or LocalDataConfig()
    ds = LocalDataset(root, encode_fn, cfg)
    # fold the process index into the seed: in a multi-host job every
    # process must sample a DIFFERENT local slice of the data stream —
    # identical seeds made the dp-global batch N duplicated copies,
    # silently wasting (N-1)/N of the data parallelism (review r3)
    import jax

    rng = np.random.default_rng(seed + 100_003 * jax.process_index())
    q: "queue.Queue" = queue.Queue(maxsize=cfg.prefetch)

    def producer():
        # a producer crash must surface in the training loop, not leave it
        # blocked forever on q.get() while the job looks alive (review r3)
        try:
            while True:
                q.put(ds.sample_batch(rng))
        except BaseException as exc:  # noqa: BLE001
            q.put(exc)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        yield item


def default_encode_fn(codec_checkpoint: Optional[str] = None, codec_cfg=None):
    """Best codec encoder available: imported VibeVoice assets when present,
    else a native-codec checkpoint, else random-init native codec (smoke
    runs only — warns)."""
    import jax

    from smalltts_tpu.onnxjax.codec import OnnxCodec, assets_present

    if codec_checkpoint is None and assets_present():
        codec = OnnxCodec()
        return jax.jit(lambda a: codec.encode_fn(codec.params, a))

    from functools import partial

    from smalltts_tpu.models.codec import CodecConfig, codec_encode, init_codec

    codec_cfg = codec_cfg or CodecConfig()
    if codec_checkpoint:
        from smalltts_tpu.utils.checkpoint import load_pytree

        params = load_pytree(codec_checkpoint)
    else:
        import warnings

        warnings.warn(
            "no codec assets/checkpoint: encoding the corpus with a "
            "random-init codec (smoke runs only)", stacklevel=2
        )
        params = jax.jit(lambda k: init_codec(k, codec_cfg))(jax.random.PRNGKey(0))
    return jax.jit(partial(codec_encode, params, cfg=codec_cfg))


def cli_data_iter(data_dir: Optional[str], codec_checkpoint: Optional[str],
                  batch_size: int):
    """Shared trainer-CLI wiring: None when no --data-dir was given (the
    trainers then fall back to the dummy loader)."""
    if not data_dir:
        return None
    return get_local_dataloader(
        data_dir,
        default_encode_fn(codec_checkpoint),
        LocalDataConfig(batch_size=batch_size),
    )


def dataset_dummy_compat(cfg: LocalDataConfig) -> DummyDataConfig:
    """The DummyDataConfig describing the same batch shapes (for tests and
    shape assertions)."""
    return DummyDataConfig(
        batch_size=cfg.batch_size,
        latent_dim=cfg.latent_dim,
        max_phonemes=cfg.max_phonemes,
        max_latents=cfg.max_latents,
        max_ref=cfg.max_ref,
    )
