"""ONNX -> JAX import path (no `onnx`/`onnxruntime` dependency).

The reference consumes its codec as opaque ONNX graphs exported from
Microsoft's VibeVoice (reference: src/smalltts/codec/onnx.py:34-85,
assets/codec/{encoder,decoder}.onnx). This subpackage makes those graphs —
and ONNX graphs in general — runnable as jitted JAX functions on TPU:

* `proto`  — a pure-Python protobuf wire-format reader/writer for the ONNX
  schema subset (ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto),
  validated in tests against files produced by `torch.onnx.export`;
* `interp` — a graph-walking interpreter: topological node evaluation with
  numpy constant folding for shape math (static shapes under jit make
  `Shape` concrete, so Reshape/Slice/Pad targets fold to constants) and a
  registry of ONNX ops lowered to `jax.numpy` / `lax` primitives;
* the public API below: `load_model(path)` and `OnnxFunction(model)` whose
  `.params` is a pytree of initializers and whose `__call__(params, *xs)`
  is a pure jittable function.

This is the parity/quality path; the fast sub-pixel codec
(models/codec.py) remains the serving default.
"""

from smalltts_tpu.onnxjax.proto import load_model, parse_model
from smalltts_tpu.onnxjax.interp import OnnxFunction

__all__ = ["load_model", "parse_model", "OnnxFunction", "ImportedSmallTTS"]


def __getattr__(name):
    if name == "ImportedSmallTTS":  # lazy: pulls in the sampler stack
        from smalltts_tpu.onnxjax.pipeline import ImportedSmallTTS

        return ImportedSmallTTS
    raise AttributeError(name)
