"""Gated ONNX weight importer (for the published VibeVoice codec assets).

The reference consumes the codec as opaque ONNX graphs downloaded from HF
(reference: src/smalltts/codec/onnx.py:34-85; assets/codec/*.onnx). Our codec
is a native JAX model (models/codec.py); when the ONNX assets are available
this module extracts their initializers so conversion tooling can map weights
into a matching pytree. Requires the `onnx` package (not in this image —
functions raise a clear error instead of failing at import time).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _require_onnx():
    try:
        import onnx  # noqa: F401

        return onnx
    except ImportError as exc:
        raise RuntimeError(
            "ONNX import requires the `onnx` package; install it or convert "
            "weights offline with scripts/test_checkpoint.py tooling"
        ) from exc


def load_initializers(path: str) -> Dict[str, np.ndarray]:
    """ONNX graph -> {initializer name: numpy array}."""
    onnx = _require_onnx()
    from onnx import numpy_helper

    model = onnx.load(path)
    return {
        init.name: numpy_helper.to_array(init)
        for init in model.graph.initializer
    }


def describe_graph(path: str) -> str:
    """Human-readable op/shape summary (to reconstruct architectures)."""
    onnx = _require_onnx()
    model = onnx.load(path)
    lines = []
    for node in model.graph.node:
        lines.append(f"{node.op_type}: {list(node.input)} -> {list(node.output)}")
    return "\n".join(lines)
