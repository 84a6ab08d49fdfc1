"""SmallTTS: the user-facing inference pipeline.

Capability parity with the reference Python runtime + Rust server pipeline
(reference: src/smalltts/infer/onnx.py:50-159, src/server/src/pipeline.rs:40-174):
`synthesize(ref_latents, phoneme_ids, duration_sec) -> audio`, duration
heuristic len(text)/11.5 clamped [0.5, 30] s, transcription-prepend batch API,
and per-stage timing (codec_enc / cond_enc / denoise / codec_dec).

TPU-native: everything the reference splits across 4 ONNX sessions plus
host-side glue (RoPE tables, noise, alpha/sigma, the step loop) is ONE jitted
graph per length bucket (see infer.sampler). Inputs snap to fixed-shape
buckets (data.bucketing) so XLA never recompiles per request.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from smalltts_tpu.data.bucketing import (
    HOP_SIZE,
    LATENT_BUCKETS,
    SERVING_PHONEME_BUCKETS,
    SERVING_REF_BUCKETS,
    frames_for_duration,
    pad_to,
    pick_bucket,
)
from smalltts_tpu.infer.sampler import NUM_STEPS, make_synthesize_fn, _sample_loop
from smalltts_tpu.models.backbone import BackboneConfig, encode_conditions, init_backbone
from smalltts_tpu.models.codec import CodecConfig, codec_decode, codec_encode, init_codec
from smalltts_tpu.ops.masking import length_mask

CHARS_PER_SECOND = 11.5


def estimate_duration(text: str, min_sec: float = 0.5, max_sec: float = 30.0) -> float:
    """Duration heuristic (reference: src/smalltts/infer/onnx.py:17-18)."""
    return max(min_sec, min(len(text) / CHARS_PER_SECOND, max_sec))


def enable_compilation_cache(cache_dir: str = "~/.cache/smalltts_tpu/xla") -> str:
    """Point XLA's persistent compilation cache at `cache_dir` so the warmup
    grid compiles once per (model, jaxlib, topology) and later server
    startups deserialize executables instead of recompiling (minutes each on
    TPU). Returns the resolved directory."""
    import os

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: startup cost is dominated by count, not size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


@dataclass
class Timing:
    """Per-stage wall-clock ms (reference: src/server/src/pipeline.rs:29-37)."""

    codec_enc_ms: float = 0.0
    cond_enc_ms: float = 0.0
    denoise_ms: float = 0.0
    codec_dec_ms: float = 0.0
    total_ms: float = 0.0


class SmallTTS:
    """DMD 4-step inference (no CFG), fused per-bucket XLA graphs.

    Weights: pass pytrees directly, or paths to our .npz checkpoints, or a
    reference torch checkpoint path — or nothing, for random-init (shape/perf
    work). Floating params are cast to `dtype` (bf16 on TPU by default).
    """

    def __init__(
        self,
        backbone_params=None,
        codec_params=None,
        *,
        checkpoint: Optional[str] = None,
        codec_checkpoint: Optional[str] = None,
        cfg: BackboneConfig = None,
        codec_cfg: CodecConfig = None,
        dtype=None,
        num_steps: Optional[int] = None,
        seed: int = 0,
        mesh=None,
        codec="auto",
        sampler: str = "auto",
        w8_modulation: bool = False,
        w8_stream: bool = False,
        fused_projections: bool = True,
        fused_block: bool = False,
        pcm16_out: bool = False,
    ) -> None:
        """`sampler` selects the few-step recurrence:
        - "dmd": the reference-parity 4-step fresh-noise loop;
        - "imf": the integral-velocity student (train/imf.py; defaults to
          2 steps — the corpus quality gate measured IMF-2 > IMF-1);
        - "auto": per checkpoint CLASS, each choice corpus-measured
          (tests/test_imf_quality.py). Plain checkpoints -> "dmd" (DMD-4
          sits at the codec mel floor; IMF few-step does not reach it, so
          few-step never silently replaces a DMD/teacher checkpoint). IMF
          checkpoints (params carry r_gate) -> "imf" 2-step: among the ways
          to serve THAT checkpoint, IMF-2 measures best (mel 6.97 vs 7.18
          for IMF-1 vs 7.91 for the gated DMD-4 recurrence on the same
          weights — interval training degrades the instantaneous velocity,
          so the 4-step loop is the WORST path for an IMF student).

        `codec` selects the codec backend:
        - "native": the fast sub-pixel JAX codec (models/codec.py) — serving
          default;
        - "onnx" or an `onnxjax.codec.OnnxCodec` instance: the reference
          VibeVoice codec imported from assets/codec/*.onnx — weight-exact
          with the reference's published voices;
        - "auto": "onnx" when the ONNX assets are present AND no native
          codec weights were passed, else "native".

        `pcm16_out`: synthesize/synthesize_padded return int16 PCM quantized
        IN the fused graph (exactly serving/audio_io.pcm16's convention) —
        halves device->host result bytes and drops the host quantization.
        Serving opt-in (`serve.py --pcm16`); float consumers (long-form
        crossfade, quality metrics) must divide by 32767 first.
        """
        # Autoconfigure from checkpoint-embedded metadata when the caller
        # passes no explicit config (utils/config_io): tiny experiment
        # checkpoints, resized students and the full 328M all load with zero
        # ceremony. An explicit cfg always wins; meta-free (old-format) npz
        # and reference .pt checkpoints keep the full-size default.
        if (cfg is None or codec_cfg is None) and (checkpoint or codec_checkpoint):
            from smalltts_tpu.utils import checkpoint as _ckpt_meta
            from smalltts_tpu.utils.config_io import (
                backbone_config_from_meta,
                codec_config_from_meta,
            )

            if cfg is None and checkpoint and checkpoint.endswith(".npz"):
                cfg = backbone_config_from_meta(_ckpt_meta.load_meta(checkpoint))
            if codec_cfg is None and codec_checkpoint and codec_checkpoint.endswith(".npz"):
                codec_cfg = codec_config_from_meta(
                    _ckpt_meta.load_meta(codec_checkpoint))
        self.cfg = cfg or BackboneConfig()
        self.codec_cfg = codec_cfg or CodecConfig()
        self.mesh = mesh  # optional jax.sharding.Mesh: batch shards over "dp"
        if dtype is None:
            dtype = (
                jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
            )
        self.dtype = dtype

        from smalltts_tpu.utils import checkpoint as ckpt

        if backbone_params is None:
            if checkpoint and checkpoint.endswith((".pt", ".pth", ".bin")):
                backbone_params = ckpt.load_reference_backbone_checkpoint(checkpoint)
            elif checkpoint:
                backbone_params = ckpt.load_pytree(checkpoint)
            else:
                # jitted init: ONE compiled program (remote-TPU dispatch is
                # latency-bound; eager init of 328M params takes minutes)
                backbone_params = jax.jit(
                    lambda k: init_backbone(k, self.cfg)
                )(jax.random.PRNGKey(seed))
        # ---- codec backend selection
        from smalltts_tpu.onnxjax.codec import OnnxCodec, assets_present

        self.onnx_codec = None
        if isinstance(codec, OnnxCodec):
            self.onnx_codec = codec
        elif codec == "onnx":
            self.onnx_codec = OnnxCodec()
        elif codec == "auto":
            if codec_params is None and codec_checkpoint is None and assets_present():
                self.onnx_codec = OnnxCodec()
        elif codec != "native":
            raise ValueError(f"codec must be 'native'/'onnx'/'auto'/OnnxCodec, got {codec!r}")

        if self.onnx_codec is not None:
            codec_params = self.onnx_codec.params
        elif codec_params is None:
            if codec_checkpoint:
                codec_params = ckpt.load_pytree(codec_checkpoint)
            else:
                codec_params = jax.jit(
                    lambda k: init_codec(k, self.codec_cfg)
                )(jax.random.PRNGKey(seed + 1))

        backbone_host = ckpt.cast_floating(backbone_params, dtype)
        if fused_projections:
            # Lossless serving layout, ON by default: [qkv|gate] and
            # [w1|w3] become single weight streams per block
            # (models/dit.fuse_serving_projections). Measured at full size,
            # 5 s/batch 8, interleaved A/B on v5e-1: 19.4 -> 16.1 and
            # 18.6 -> 15.0 ms/call (~18%) — fewer, wider HBM streams in the
            # weight-bandwidth-bound denoise loop.
            from smalltts_tpu.models.dit import fuse_serving_projections

            backbone_host = fuse_serving_projections(backbone_host)
        if w8_modulation:
            # int8 adaLN modulation weights + Pallas per-tile dequant: the
            # one w8 shape that wins (M=batch pure weight streaming, PERF.md
            # "w8 kernels"); quantize AFTER the dtype cast so the fp32
            # scales survive (cast_floating would downcast them)
            from smalltts_tpu.models.dit import quantize_modulations

            backbone_host = quantize_modulations(backbone_host)
        if w8_stream:
            # int8 denoise weight streams dequantized by plain XLA
            # convert+multiply (no Pallas barrier): halves the HBM bytes of
            # the stream-bound 4-step loop (models/dit.
            # quantize_stream_weights). Approximation (~0.4% per-channel
            # weight error) — opt-in; waveform tolerance pinned in
            # tests/test_pallas.py
            from smalltts_tpu.models.dit import quantize_stream_weights

            backbone_host = quantize_stream_weights(backbone_host)
        if fused_block or os.environ.get("SMALLTTS_PALLAS_BLOCK") == "1":
            # Whole-scan Pallas kernel layout (ops/pallas/block.py): the
            # entire 12-layer cached block scan runs as ONE kernel with
            # explicitly double-buffered weight DMA. Requires the fused
            # [qkv|gate]/[w1|w3] layout; buckets past the kernel's VMEM
            # budget fall back to the XLA scan per-compile (fits_vmem).
            if not fused_projections:
                raise ValueError("fused_block requires fused_projections")
            if w8_stream:
                raise ValueError("fused_block and w8_stream are exclusive "
                                 "(int8 streams keep XLA in charge)")
            from smalltts_tpu.models.dit import pack_fused_block

            backbone_host = pack_fused_block(backbone_host)
        if mesh is not None:
            from smalltts_tpu.parallel.mesh import shard_params

            self.params = shard_params(backbone_host, mesh)
            self.codec_params = shard_params(
                ckpt.cast_floating(codec_params, jnp.float32), mesh
            )
        else:
            self.params = jax.device_put(backbone_host)
            self.codec_params = jax.device_put(
                ckpt.cast_floating(codec_params, jnp.float32)
            )
        if sampler == "auto":
            # Quality-gated policy (tests/test_imf_quality.py). Two corpus
            # measurements set it:
            # (1) DMD-4 on a DMD/teacher checkpoint reaches the codec's own
            #     mel floor (excess 0.04) while IMF few-step measures
            #     0.34/0.55 — so few-step NEVER silently replaces a plain
            #     checkpoint (the round-2 auto->IMF-1 behavior was a trap).
            # (2) For an IMF checkpoint itself, IMF-2 is the best-measured
            #     serving path (mel 6.97) — ahead of IMF-1 (7.18) AND of
            #     the gated DMD-4 recurrence on the same weights (7.91;
            #     _sample_loop applies the (1 + r_gate) embedding so each
            #     step evaluates u(x,t,t) exactly as trained, and it is
            #     still the worst path: interval training trades away
            #     instantaneous-velocity accuracy).
            # So auto = the best-measured recurrence for the checkpoint
            # class that was actually loaded.
            sampler = "imf" if "r_gate" in self.params else "dmd"
        if num_steps is None:
            # per-sampler defaults, both corpus-gated: DMD keeps the
            # reference's 4; IMF defaults to 2 (IMF-2 measurably beats
            # IMF-1 in mel, 6.97 vs 7.18 against floor 6.63, at equal SV).
            # An EXPLICIT num_steps is always honored — the old
            # `== NUM_STEPS` check silently rewrote a requested 4 to 2.
            num_steps = 2 if sampler == "imf" else NUM_STEPS
        self.sampler = sampler
        self.num_steps = num_steps

        if self.onnx_codec is not None:
            decode_fn = self.onnx_codec.decode_fn
            self._encode_fn = jax.jit(self.onnx_codec.encode_fn)
            self._decode_fn = jax.jit(decode_fn)
        else:
            decode_fn = None
            self._encode_fn = jax.jit(partial(codec_encode, cfg=self.codec_cfg))
            self._decode_fn = jax.jit(partial(codec_decode, cfg=self.codec_cfg))
        self.pcm16_out = pcm16_out
        self._synthesize_fn = make_synthesize_fn(
            self.cfg, self.codec_cfg, num_steps, decode_fn=decode_fn,
            sampler=sampler, pcm16=pcm16_out,
        )
        import threading

        self._key = jax.random.PRNGKey(seed + 2)
        self._key_lock = threading.Lock()
        self._cond_fn = jax.jit(partial(self._cond_encode))
        self._denoise_fn = jax.jit(
            partial(self._denoise_loop), static_argnames=("t_bucket",)
        )

    # ------------------------------------------------------------- staged fns

    def _cond_encode(self, params, ref_latents, ref_lengths, phonemes, ph_lengths):
        ph_mask = length_mask(ph_lengths, phonemes.shape[1])
        return encode_conditions(params, self.cfg, ref_latents, ref_lengths, phonemes, ph_mask)

    def _denoise_loop(self, params, cond, seq_lengths, key, t_bucket: int):
        if self.sampler == "imf":
            from smalltts_tpu.train.imf import imf_sample

            return imf_sample(
                params, self.cfg, cond, seq_lengths, t_bucket, key, self.num_steps
            )
        return _sample_loop(
            params, self.cfg, cond, seq_lengths, t_bucket, key, self.num_steps, None
        )

    def _next_key(self):
        # concurrent callers (parallel warmup, threaded servers) must each
        # get a UNIQUE key — an unsynchronized read-split-write would hand
        # two requests identical noise
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
            return sub

    # ------------------------------------------------------------- public API

    def encode_reference(self, audio_24k: np.ndarray) -> np.ndarray:
        """Mono 24 kHz waveform (T,) -> reference latents (T', 64).

        The waveform pads to a SERVING_REF_BUCKET's worth of samples (not
        just a hop multiple): otherwise every distinct clip length would be
        a fresh XLA compile of the encoder in the request path. Truncates
        beyond the largest bucket (~34 s) like _bucketize."""
        t = len(audio_24k)
        frames = max(-(-t // HOP_SIZE), 1)
        bucket = pick_bucket(frames, SERVING_REF_BUCKETS)
        frames = min(frames, bucket)
        audio = np.zeros((1, 1, bucket * HOP_SIZE), np.float32)
        n = min(t, bucket * HOP_SIZE)
        audio[0, 0, :n] = audio_24k[:n]
        latents = np.asarray(self._encode_fn(self.codec_params, jnp.asarray(audio))[0])
        return latents[:frames]

    def synthesize_padded(
        self,
        ref_latents: np.ndarray,      # (B, R_bucket, 64)
        ref_lengths: np.ndarray,      # (B,)
        phonemes: np.ndarray,         # (B, P_bucket)
        phoneme_lengths: np.ndarray,  # (B,)
        seq_lengths: np.ndarray,      # (B,)
        t_bucket: int,
        key=None,
        fetch: bool = True,
    ):
        """Batched bucket-padded synthesis -> (B, 1, t_bucket*HOP) waveform
        (float32; int16 when the pipeline was built with pcm16_out=True).

        This is the server batcher's entry point. `fetch=False` returns the
        device array WITHOUT waiting for completion — dispatch is async, so
        back-to-back calls pipeline on the device. On a tunneled TPU a
        per-call sync costs a full ~30 ms round trip; measured at 5 s/batch 8
        the pipelined dispatch rate is 11.6 ms/call vs 41 ms/call when each
        call blocks (the device compute itself is ~11 ms). Callers force
        completion exactly once, when they consume the result (np.asarray /
        block_until_ready)."""
        inputs = (
            jnp.asarray(ref_latents, self.dtype),
            jnp.asarray(ref_lengths, jnp.int32),
            jnp.asarray(phonemes, jnp.int32),
            jnp.asarray(phoneme_lengths, jnp.int32),
            jnp.asarray(seq_lengths, jnp.int32),
        )
        if self.mesh is not None:
            from smalltts_tpu.parallel.mesh import data_sharding

            dp = self.mesh.shape["dp"]
            if inputs[0].shape[0] % dp == 0:
                inputs = tuple(
                    jax.device_put(x, data_sharding(self.mesh, x.ndim)) for x in inputs
                )
        audio = self._synthesize_fn(
            self.params,
            self.codec_params,
            *inputs,
            key if key is not None else self._next_key(),
            t_bucket=t_bucket,
        )
        if not fetch:
            return audio
        return np.asarray(jax.device_get(audio))

    def contract_shapes(
        self,
        batch_sizes: Sequence[int] = (1, 8),
        t_buckets: Sequence[int] = LATENT_BUCKETS,
        r_buckets: Sequence[int] = SERVING_REF_BUCKETS,
        p_buckets: Sequence[int] = SERVING_PHONEME_BUCKETS,
    ):
        """The serving shape contract: every (batch, r, p, t) tuple a request
        can reach after bucketing. warmup() compiles exactly this set."""
        return [
            (bs, rb, pb, tb)
            for bs in batch_sizes
            for rb in r_buckets
            for pb in p_buckets
            for tb in t_buckets
        ]

    def warmup(
        self,
        batch_sizes: Sequence[int] = (1, 8),
        t_buckets: Sequence[int] = LATENT_BUCKETS,
        r_buckets: Sequence[int] = SERVING_REF_BUCKETS,
        p_buckets: Sequence[int] = SERVING_PHONEME_BUCKETS,
        progress: bool = False,
        workers: int = 8,
    ) -> int:
        """Precompile the FULL serving cross-product so no in-contract
        request ever hits an XLA compile (minutes each on TPU) in the
        request path (VERDICT round-1 item 3; round 1 warmed only a corner
        of the grid). Returns the number of shape tuples visited. Pair with
        `enable_compilation_cache()` so repeated server startups hit the
        on-disk cache instead of recompiling.

        `workers` > 1 compiles shapes concurrently: XLA/PJRT compilation
        releases the GIL and the backend parallelizes independent compiles
        (measured 7x on 4 concurrent compiles vs serial on the remote-compile
        TPU backend), so cold startup shrinks by roughly min(workers, cores)."""
        # the reference-encoder graphs (one per ref bucket) are ALSO in the
        # request path (server: encode_reference per request)
        shapes = self.contract_shapes(batch_sizes, t_buckets, r_buckets, p_buckets)

        def warm_encoder(rb):
            self.encode_reference(np.zeros((rb * HOP_SIZE,), np.float32))

        def warm_shape(args):
            i, (bs, rb, pb, tb) = args
            if progress:
                print(f"warmup {i + 1}/{len(shapes)}: batch={bs} r={rb} p={pb} t={tb}")
            out = self.synthesize_padded(
                np.zeros((bs, rb, self.cfg.latent_dim), np.float32),
                np.full((bs,), rb, np.int32),
                np.zeros((bs, pb), np.int32),
                np.full((bs,), 1, np.int32),
                np.full((bs,), min(tb, 1), np.int32),
                tb,
                fetch=False,
            )
            # block per shape: fetch=False no longer syncs, and a warm
            # compile cache would otherwise let warmup() return (and /ready
            # flip) with the whole grid still queued on device — with
            # unbounded queued-output memory (a batch-64 output is ~196 MB)
            jax.block_until_ready(out)

        from concurrent.futures import ThreadPoolExecutor

        # ThreadPoolExecutor(1) IS the serial path — one driving loop
        with ThreadPoolExecutor(max(1, workers)) as pool:
            list(pool.map(warm_encoder, r_buckets))
            list(pool.map(warm_shape, enumerate(shapes)))
        return len(shapes)

    def compile_cache_size(self) -> int:
        """Number of compiled executables behind the fused synthesize fn
        (tests assert this stays flat across in-contract traffic)."""
        return self._synthesize_fn._cache_size()

    def _bucketize(self, ref_latents, phoneme_ids, duration_sec):
        seq_len = frames_for_duration(duration_sec)
        t_bucket = pick_bucket(seq_len, LATENT_BUCKETS)
        seq_len = min(seq_len, t_bucket)
        r_bucket = pick_bucket(len(ref_latents), SERVING_REF_BUCKETS)
        if len(ref_latents) > SERVING_REF_BUCKETS[-1]:
            import warnings

            warnings.warn(
                f"reference audio is {len(ref_latents)} latent frames "
                f"(~{len(ref_latents) / 7.5:.0f} s); truncating to the largest "
                f"serving bucket {SERVING_REF_BUCKETS[-1]} (~"
                f"{SERVING_REF_BUCKETS[-1] / 7.5:.0f} s) — pass a shorter clip",
                stacklevel=3,
            )
        ref_len = min(len(ref_latents), r_bucket)
        ref = pad_to(np.asarray(ref_latents, np.float32), r_bucket, axis=0)
        p_bucket = pick_bucket(max(len(phoneme_ids), 1), SERVING_PHONEME_BUCKETS)
        ph_len = min(len(phoneme_ids), p_bucket)
        ph = np.zeros((p_bucket,), np.int32)
        ph[:ph_len] = np.asarray(phoneme_ids[:ph_len], np.int32)
        return ref, ref_len, ph, ph_len, seq_len, t_bucket

    def synthesize(
        self,
        ref_latents: np.ndarray,
        phoneme_ids: Sequence[int],
        duration_sec: float,
        key=None,
    ) -> np.ndarray:
        """Single-utterance synthesis -> (1, samples) waveform at 24 kHz
        (float32; int16 PCM when built with pcm16_out=True)
        (reference: src/smalltts/infer/onnx.py:68-129)."""
        ref, ref_len, ph, ph_len, seq_len, t_bucket = self._bucketize(
            ref_latents, list(phoneme_ids), duration_sec
        )
        audio = self.synthesize_padded(
            ref[None], np.array([ref_len]), ph[None], np.array([ph_len]),
            np.array([seq_len]), t_bucket, key,
        )
        return audio[0, :, : seq_len * HOP_SIZE]

    def synthesize_timed(self, ref_audio_24k, phoneme_ids, duration_sec):
        """Staged synthesis with per-stage timing parity
        (reference: src/server/src/pipeline.rs:60-112)."""
        timing = Timing()
        t0 = time.perf_counter()

        ref_latents = self.encode_reference(np.asarray(ref_audio_24k))
        t1 = time.perf_counter()
        timing.codec_enc_ms = (t1 - t0) * 1e3

        ref, ref_len, ph, ph_len, seq_len, t_bucket = self._bucketize(
            ref_latents, list(phoneme_ids), duration_sec
        )
        cond = self._cond_fn(
            self.params,
            jnp.asarray(ref[None], self.dtype),
            jnp.asarray([ref_len], jnp.int32),
            jnp.asarray(ph[None], jnp.int32),
            jnp.asarray([ph_len], jnp.int32),
        )
        jax.block_until_ready(cond.cross_kv.k_ref)
        t2 = time.perf_counter()
        timing.cond_enc_ms = (t2 - t1) * 1e3

        latents = self._denoise_fn(
            self.params, cond, jnp.asarray([seq_len], jnp.int32),
            self._next_key(), t_bucket=t_bucket,
        )
        latents = jax.block_until_ready(latents)
        t3 = time.perf_counter()
        timing.denoise_ms = (t3 - t2) * 1e3

        audio = self._decode_fn(self.codec_params, latents.astype(jnp.float32))
        audio = np.asarray(jax.device_get(audio))[0, :, : seq_len * HOP_SIZE]
        t4 = time.perf_counter()
        timing.codec_dec_ms = (t4 - t3) * 1e3
        timing.total_ms = (t4 - t0) * 1e3
        return audio, timing

    def forward(
        self,
        conditionings: List[np.ndarray],
        transcriptions: list,
        texts: list,
        duration_sec: float = 3.0,
        max_batch: int = 8,
    ) -> List[np.ndarray]:
        """Batch API prepending transcription tokens to text tokens
        (reference: src/smalltts/infer/onnx.py:131-157).

        Unlike the reference (which loops synthesize per item), items are
        PACKED into fused `synthesize_padded` dispatches: everything shares
        one latent bucket (single duration arg), refs/phonemes pad to the
        group's serving buckets, and each chunk of `max_batch` items is ONE
        XLA call — measured 1.5x over the per-item loop at 8 tiny-model
        items on CPU; on TPU the gap is the full batch-8-vs-8x-batch-1
        compute ratio (~3.5x per PERF.md) plus 7 saved dispatch round
        trips."""
        from smalltts_tpu.text import get_token_ids

        def tok(x):
            return get_token_ids(x) if isinstance(x, str) else list(map(int, x))

        # exactly the serving batcher's grouping/padding (one source of
        # truth for the shape contract: batch lands on the 1/max_batch
        # classes warmup compiles — an exact-size tail batch would trigger
        # a minutes-long request-path compile on TPU)
        from smalltts_tpu.serving.batcher import (
            Request,
            group_requests,
            pad_group,
        )

        requests = [
            Request(np.asarray(cond, np.float32), tok(trans) + tok(text),
                    duration_sec)
            for cond, trans, text in zip(conditionings, transcriptions, texts)
        ]
        for r in requests:
            if len(r.ref_latents) > SERVING_REF_BUCKETS[-1]:
                import warnings

                warnings.warn(
                    f"reference audio is {len(r.ref_latents)} latent frames; "
                    f"truncating to the largest serving bucket "
                    f"{SERVING_REF_BUCKETS[-1]} — pass a shorter clip",
                    stacklevel=2,
                )
        index = {id(r): i for i, r in enumerate(requests)}
        results: List[np.ndarray] = [None] * len(requests)
        for group in group_requests(requests, max_batch):
            ref, ref_lens, ph, ph_lens, seq_lens, t_bucket, _ = pad_group(
                group, max_batch)
            audio = self.synthesize_padded(
                ref, ref_lens, ph, ph_lens, seq_lens, t_bucket)
            for i, r in enumerate(group):
                results[index[id(r)]] = audio[
                    i, :, : int(seq_lens[i]) * HOP_SIZE]
        return results

    __call__ = forward
