"""smalltts_tpu — a TPU-native (JAX/XLA/Pallas) expressive voice-cloning TTS framework.

Capability-parity rebuild of smallbraineng/smalltts, redesigned TPU-first:
the whole inference pipeline (condition encoding, 4-step DMD sampling, codec
decode) compiles to a handful of jitted XLA graphs over fixed length buckets,
training scales over a `jax.sharding.Mesh` (data / tensor parallel), and the
hot attention path has a fused Pallas kernel.

Public API (mirrors the reference package export, reference:
/root/reference/src/smalltts/__init__.py:1-6):

    from smalltts_tpu import SmallTTS
"""

__version__ = "0.1.0"

_LAZY = {
    "SmallTTS": ("smalltts_tpu.infer.pipeline", "SmallTTS"),
    # the reference's published ONNX graphs, imported and fused on TPU
    "ImportedSmallTTS": ("smalltts_tpu.onnxjax.pipeline", "ImportedSmallTTS"),
    "OnnxCodec": ("smalltts_tpu.onnxjax.codec", "OnnxCodec"),
    "estimate_duration": ("smalltts_tpu.infer.pipeline", "estimate_duration"),
}


def __getattr__(name):  # lazy import to keep `import smalltts_tpu` light
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'smalltts_tpu' has no attribute {name!r}")


__all__ = ["SmallTTS", "ImportedSmallTTS", "OnnxCodec", "estimate_duration", "__version__"]
