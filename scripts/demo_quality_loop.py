"""Train a tiny TTS stack from scratch and measure it — no assets, no GPUs.

One command exercises the ENTIRE framework loop on the in-repo synthetic
corpus (data/synthetic.py): codec training, latent encoding, flow-matching
teacher training, many-step sampling, codec decode, plus the ASR (CTC) and
SV (distillation) auxiliaries — each stage scored with the real quality
instruments (utils/metrics.py). The RUN_SLOW tests pin these outcomes with
assertions; this script is the human-readable version with adjustable
budgets (scale --codec-steps/--teacher-steps up for better numbers).

    python scripts/demo_quality_loop.py                 # ~6 min on CPU
    python scripts/demo_quality_loop.py --teacher-steps 2000

Prints one JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="blue moon light")
    ap.add_argument("--codec-steps", type=int, default=300)
    ap.add_argument("--teacher-steps", type=int, default=600)
    ap.add_argument("--asr-steps", type=int, default=400)
    ap.add_argument("--sv-steps", type=int, default=200)
    ap.add_argument("--sample-steps", type=int, default=32)
    ap.add_argument("--samples-out", default=None, metavar="DIR",
                    help="write reference/generated wav pairs + index.json "
                         "for the website sample player (server --static)")
    ap.add_argument("--device", default="cpu", choices=["cpu", "ambient"],
                    help="tiny models are DISPATCH-bound on remote accelerators "
                         "(measured 1.3 s/step over a tunneled TPU vs ~0.1 s on "
                         "CPU) — default forces CPU; 'ambient' keeps the "
                         "environment's device")
    args = ap.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import optax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # tiny-but-real configs (the shape contract of the full models)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_distill import TINY_ASR64, TINY_SV64
    from tiny import TINY_BACKBONE, TINY_CODEC

    from smalltts_tpu.data.synthetic import synth_speech
    from smalltts_tpu.infer.teacher_sampler import make_teacher_sampler
    from smalltts_tpu.models.asr import asr_forward, init_asr
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.models.codec import codec_decode, codec_encode, init_codec
    from smalltts_tpu.models.sv import SVConfig, init_sv, sv_forward
    from smalltts_tpu.models.sv_teacher import init_sv_teacher, make_teacher_fn
    from smalltts_tpu.train.asr_train import make_asr_step
    from smalltts_tpu.train.codec_train import CodecTrainConfig, make_codec_step
    from smalltts_tpu.train.ema import ema_init
    from smalltts_tpu.train.optim import adamw
    from smalltts_tpu.train.sv_train import make_sv_step
    from smalltts_tpu.train.teacher import make_teacher_step
    from smalltts_tpu.utils.metrics import mel_distance, snr_db

    t0 = time.time()
    summary = {}

    def stage(msg):
        print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)

    text = args.text
    gt = synth_speech(text, speaker=0, seed=0)
    hop = TINY_CODEC.hop
    gt = gt[: (len(gt) // hop) * hop]
    stage(f"synthetic utterance {len(gt) / 24000:.2f}s: {text!r}")

    # ---- 1) codec
    cp = init_codec(jax.random.PRNGKey(0), TINY_CODEC)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    oc = tx.init(cp)
    step_c = make_codec_step(TINY_CODEC, CodecTrainConfig(lr=3e-4), tx)
    aud = jnp.asarray(np.stack([gt, gt])[:, None, :])
    for _ in range(args.codec_steps):
        cp, oc, closs, _ = step_c(cp, oc, jnp.copy(aud))
    lat_gt = np.asarray(codec_encode(cp, jnp.asarray(gt[None, None, :]), TINY_CODEC))[0]
    rec = np.asarray(codec_decode(cp, jnp.asarray(lat_gt[None]), TINY_CODEC))[0, 0]
    floor = mel_distance(gt, rec)
    summary["codec"] = {"steps": args.codec_steps, "loss": round(float(closs), 4),
                        "roundtrip_mel": round(floor, 3),
                        "roundtrip_snr_db": round(snr_db(gt, rec), 2)}
    stage(f"codec: roundtrip mel {floor:.3f} (this is the synthesis floor)")

    # ---- 2) teacher
    T = lat_gt.shape[0]
    tokens = np.asarray([max(1, ord(c) % 150) for c in text], np.int32)
    r = min(8, T)

    def fresh_batch():
        return {
            "phonemes": jnp.asarray(np.tile(tokens[None], (2, 1))),
            "phonemes_lengths": jnp.full((2,), len(tokens), jnp.int32),
            "latents": jnp.asarray(np.tile(lat_gt[None], (2, 1, 1))),
            "latents_lengths": jnp.full((2,), T, jnp.int32),
            "ref_latents": jnp.asarray(np.tile(lat_gt[None, :r], (2, 1, 1))),
            "ref_latents_lengths": jnp.full((2,), r, jnp.int32),
        }

    p0 = init_backbone(jax.random.PRNGKey(1), TINY_BACKBONE)
    params = jax.tree.map(jnp.copy, p0)
    txt_ = adamw(params, 2e-3, clip_norm=1.0)
    ot = txt_.init(params)
    ema = ema_init(params)
    st = make_teacher_step(TINY_BACKBONE, txt_)
    key = jax.random.PRNGKey(2)
    for i in range(args.teacher_steps):
        key, sub = jax.random.split(key)
        params, ot, ema, tloss = st(params, ot, ema, fresh_batch(), sub)
    stage(f"teacher: {args.teacher_steps} steps, final loss {float(tloss):.4f}")

    sampler = make_teacher_sampler(TINY_BACKBONE, num_steps=args.sample_steps,
                                   cfg_scale_text=1.0, cfg_scale_speaker=1.0)

    def synth_stats(p):
        mels, lmse = [], []
        for s in (0, 1, 2):
            b = fresh_batch()
            lat = sampler(p, b["ref_latents"][:1], b["ref_latents_lengths"][:1],
                          b["phonemes"][:1], b["phonemes_lengths"][:1],
                          jnp.full((1,), T, jnp.int32), jax.random.PRNGKey(s), T)
            audio = np.asarray(
                codec_decode(cp, lat.astype(jnp.float32), TINY_CODEC))[0, 0]
            mels.append(mel_distance(gt, audio))
            lmse.append(float(np.mean((np.asarray(lat)[0] - lat_gt) ** 2)))
        return float(np.mean(mels)), float(np.mean(lmse))

    mel_rand, lmse_rand = synth_stats(p0)
    mel_tr, lmse_tr = synth_stats(params)
    summary["tts"] = {
        "steps": args.teacher_steps,
        "mel_trained": round(mel_tr, 3), "mel_random": round(mel_rand, 3),
        "mel_floor": round(floor, 3),
        "latent_mse_trained": round(lmse_tr, 4),
        "latent_mse_random": round(lmse_rand, 4),
    }
    stage(f"TTS: mel {mel_tr:.3f} (random {mel_rand:.3f}, floor {floor:.3f}); "
          f"latent mse {lmse_tr:.4f} vs {lmse_rand:.4f} random")

    if args.samples_out:
        # website sample-player artifacts (reference App.tsx:170+ renders
        # readme ref/gen pairs; our page reads samples/index.json)
        import json as _json

        from smalltts_tpu.serving.audio_io import encode_wav

        os.makedirs(args.samples_out, exist_ok=True)
        b = fresh_batch()
        lat = sampler(params, b["ref_latents"][:1],
                      b["ref_latents_lengths"][:1], b["phonemes"][:1],
                      b["phonemes_lengths"][:1],
                      jnp.full((1,), T, jnp.int32), jax.random.PRNGKey(0), T)
        gen = np.asarray(
            codec_decode(cp, lat.astype(jnp.float32), TINY_CODEC))[0, 0]
        with open(os.path.join(args.samples_out, "demo_ref.wav"), "wb") as f:
            f.write(encode_wav(gt, 24_000))
        with open(os.path.join(args.samples_out, "demo_gen.wav"), "wb") as f:
            f.write(encode_wav(gen, 24_000))
        with open(os.path.join(args.samples_out, "index.json"), "w") as f:
            _json.dump({"samples": [{
                "text": f"synthetic-corpus demo: {args.text!r} "
                        f"(tiny model trained from scratch in-repo; "
                        f"pseudo-speech, not a human voice)",
                "ref": "demo_ref.wav", "gen": "demo_gen.wav",
            }]}, f, indent=1)
        stage(f"samples written to {args.samples_out}")

    # ---- 3) ASR
    asr = init_asr(jax.random.PRNGKey(3), TINY_ASR64)
    txa = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(2e-3))
    oa = txa.init(asr)
    step_a = make_asr_step(TINY_ASR64, txa)
    for _ in range(args.asr_steps):
        asr, oa, aloss = step_a(asr, oa, fresh_batch())
    logp, out_lens, _ = asr_forward(asr, TINY_ASR64, jnp.asarray(lat_gt[None]),
                                    jnp.asarray([T], jnp.int32))
    pred = np.asarray(jnp.argmax(logp, -1))[0, : int(out_lens[0])]
    decoded = [int(k) for k, _ in itertools.groupby(pred) if k != 0]
    exact = decoded == list(tokens)
    summary["asr"] = {"steps": args.asr_steps, "ctc": round(float(aloss), 4),
                      "greedy_decode_exact": exact}
    stage(f"ASR: CTC {float(aloss):.4f}, greedy decode exact match: {exact}")

    # ---- 4) SV
    tcfg = SVConfig(input_dim=80, channels=(16, 16, 16, 16, 48), emb_dim=8,
                    attention_channels=8, res2net_scale=2, se_channels=8)
    teacher_fn, tp = make_teacher_fn(init_sv_teacher(jax.random.PRNGKey(5), tcfg), tcfg)
    sv = init_sv(jax.random.PRNGKey(6), TINY_SV64)
    txs = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    osv = txs.init(sv)
    step_s = make_sv_step(TINY_SV64, TINY_CODEC, txs, teacher_fn)

    def align(svp):
        emb, _ = sv_forward(svp, TINY_SV64, jnp.asarray(lat_gt[None]),
                            jnp.asarray([T], jnp.int32))
        temb = teacher_fn(tp, codec_decode(cp, jnp.asarray(lat_gt[None]), TINY_CODEC))
        e, te = np.asarray(emb)[0], np.asarray(temb)[0]
        return float(e @ te / (np.linalg.norm(e) * np.linalg.norm(te) + 1e-9))

    before = align(sv)
    for _ in range(args.sv_steps):
        sv, osv, sloss = step_s(sv, osv, cp, tp, {
            "latents": jnp.asarray(lat_gt[None]),
            "latents_lengths": jnp.asarray([T], jnp.int32),
        })
    after = align(sv)
    summary["sv"] = {"steps": args.sv_steps,
                     "teacher_cosine_before": round(before, 4),
                     "teacher_cosine_after": round(after, 4)}
    stage(f"SV: teacher cosine {before:.3f} -> {after:.3f}")

    summary["total_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
