"""MIGRATION.md doc-rot guard.

The migration guide promises a reference user specific import paths, CLI
scripts, and server flags/env vars. Each claim is cheap to verify and
painful to ship broken — this pins the promised surface so a rename breaks
the build, not a migrating user. (Behavioral parity is tested elsewhere;
this file only asserts the *surface* exists.)
"""

import importlib
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# import path -> attributes MIGRATION.md names
PROMISED_API = {
    "smalltts_tpu": ["SmallTTS", "ImportedSmallTTS", "OnnxCodec",
                     "estimate_duration"],
    "smalltts_tpu.text": ["get_token_ids", "phoneme_len", "decode_token_ids",
                          "get_sed_event_id", "merge_transcript"],
    "smalltts_tpu.text.normalizer": ["EnglishTextNormalizer"],
    "smalltts_tpu.ops.schedule": ["get_alpha_sigma", "apply_noise"],
    "smalltts_tpu.ops.masking": ["length_mask"],
    "smalltts_tpu.ops.precision": ["cast_floats"],
    "smalltts_tpu.train.utils": ["get_mask", "get_alpha_sigma",
                                 "apply_noise"],
    "smalltts_tpu.data.dummy": ["get_dummy_dataloader"],
    "smalltts_tpu.assets.ensure": ["ensure_assets"],
    "smalltts_tpu.infer.pipeline": ["estimate_duration"],
}

PROMISED_SCRIPTS = [
    "tryme.py", "clone.py", "interactive.py", "batch.py", "phonemize.py",
    "test_checkpoint.py", "train_teacher.py", "train_distill.py",
    "train_asr.py", "train_sv.py", "train_imf.py", "test_x402.py",
    "bench_serving.py",
]

# claimed in the serving/env tables
PROMISED_SERVER_FLAGS = ["--payments", "--voices", "--static", "--warmup",
                         "--growth-limit", "--pcm16"]
PROMISED_ENV_VARS = ["FACILITATOR_URL", "PAYMENT_ADDRESS", "BASE_URL",
                     "PORT", "PHONEMIZER_ESPEAK_LIBRARY", "SMALLTTS_ASSETS",
                     "SMALLTTS_ASSET_REPO", "SMALLTTS_COORDINATOR",
                     "SMALLTTS_NUM_PROCESSES", "SMALLTTS_PROCESS_ID"]


def test_migration_doc_exists():
    assert os.path.exists(os.path.join(REPO, "MIGRATION.md"))


@pytest.mark.parametrize("module,attrs", sorted(PROMISED_API.items()))
def test_promised_api_symbols_exist(module, attrs):
    mod = importlib.import_module(module)
    for attr in attrs:
        assert hasattr(mod, attr), f"{module}.{attr} promised by MIGRATION.md"


def test_promised_scripts_exist():
    missing = [s for s in PROMISED_SCRIPTS
               if not os.path.exists(os.path.join(REPO, "scripts", s))]
    assert not missing, f"MIGRATION.md promises scripts/{missing}"
    assert os.path.exists(os.path.join(REPO, "bench.py"))


def test_promised_server_flags_exist():
    src = open(os.path.join(
        REPO, "smalltts_tpu", "serving", "server.py")).read()
    missing = [f for f in PROMISED_SERVER_FLAGS if f'"{f}"' not in src]
    assert not missing, f"server.py lost promised flags {missing}"


def test_promised_cli_flags_exist():
    """Round-5 surfaces the docs promise: measured training defaults,
    out-of-process load generation, checkpoint conversion with metadata."""
    for script, flags in {
        "train_teacher.py": ['"--compute-dtype"', "default=16",
                             'default="bfloat16"'],
        "bench_serving.py": ['"--proc-clients"', '"--worker"'],
        "test_checkpoint.py": ['"--convert"'],
    }.items():
        src = open(os.path.join(REPO, "scripts", script)).read()
        missing = [f for f in flags if f not in src]
        assert not missing, f"scripts/{script} lost promised {missing}"
    # config knobs the docs reference
    from smalltts_tpu.train.distill import DistillConfig
    from smalltts_tpu.train.teacher import TeacherTrainConfig

    assert hasattr(TeacherTrainConfig(), "compute_dtype")
    assert hasattr(DistillConfig(), "compute_dtype")


def test_promised_env_vars_consumed():
    hits = {v: False for v in PROMISED_ENV_VARS}
    for root, _dirs, files in os.walk(os.path.join(REPO, "smalltts_tpu")):
        for f in files:
            if not f.endswith(".py"):
                continue
            src = open(os.path.join(root, f)).read()
            for v in hits:
                if v in src:
                    hits[v] = True
    missing = [v for v, seen in hits.items() if not seen]
    assert not missing, f"MIGRATION.md promises env vars {missing}"


def test_doc_file_references_resolve():
    """Every `smalltts_tpu/...` or `scripts/...` path MIGRATION.md cites as
    OUR side must exist (reference-side citations are exempt)."""
    text = open(os.path.join(REPO, "MIGRATION.md")).read()
    paths = set(re.findall(
        r"`((?:smalltts_tpu|scripts|tests|website)/[\w/.]+\.(?:py|md|html))`",
        text))
    missing = [p for p in sorted(paths)
               if not os.path.exists(os.path.join(REPO, p))]
    assert not missing, f"MIGRATION.md cites missing repo paths: {missing}"
