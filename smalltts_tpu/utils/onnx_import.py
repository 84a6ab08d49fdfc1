"""ONNX weight/topology inspection helpers (thin wrappers over onnxjax).

The reference consumes the codec as opaque ONNX graphs downloaded from HF
(reference: src/smalltts/codec/onnx.py:34-85; assets/codec/*.onnx). Round 1
gated these helpers on the absent `onnx` package; they now run everywhere on
the in-repo pure-Python parser (smalltts_tpu.onnxjax.proto). For actually
*running* the graphs in JAX use `smalltts_tpu.onnxjax.codec.OnnxCodec`.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from smalltts_tpu.onnxjax.proto import load_model, tensor_to_numpy


def load_initializers(path: str) -> Dict[str, np.ndarray]:
    """ONNX graph -> {initializer name: numpy array}."""
    model = load_model(path)
    base = os.path.dirname(path) or "."
    return {
        init.name: tensor_to_numpy(init, base)
        for init in model.graph.initializers
    }


def describe_graph(path: str) -> str:
    """Human-readable op/shape summary (to reconstruct architectures)."""
    model = load_model(path)
    lines = []
    for node in model.graph.nodes:
        lines.append(f"{node.op_type}: {list(node.inputs)} -> {list(node.outputs)}")
    return "\n".join(lines)
