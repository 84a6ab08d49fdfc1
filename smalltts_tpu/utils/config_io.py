"""Model-config (de)serialization for checkpoint metadata.

The reference's torch checkpoints carry no architecture info — loading one
into the wrong-size model is a shape-mismatch scavenger hunt
(reference: src/scripts/test_checkpoint.py:44-73 exists precisely to debug
that). Our npz checkpoints can do better: trainers embed their config dict
under a reserved metadata key (utils/checkpoint.save_pytree(meta=...)), and
`SmallTTS(checkpoint=...)` reconstructs the exact architecture when the
caller passes no explicit config — tiny experiment checkpoints, resized
students, and the full 328M all load with zero ceremony. Reference torch
checkpoints (.pt) keep the full-size default, which is what they are.

JSON round-trip notes: dataclass tuples become lists (coerced back by field
type), and unknown keys from NEWER configs are dropped (forward compat) —
a checkpoint from a build that added a field still loads here with the
field at this build's default.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Optional


def config_to_dict(cfg) -> dict:
    """Nested frozen dataclass -> plain JSON-safe dict."""
    return dataclasses.asdict(cfg)


def _filtered_kwargs(cls, d: dict) -> dict:
    """Keep only `cls`'s fields; coerce lists back to tuples where the
    field's default (or type annotation) says tuple."""
    out = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        want_tuple = isinstance(f.default, tuple) or (
            typing.get_origin(f.type) is tuple if not isinstance(f.type, str)
            else "Tuple" in f.type or "tuple" in f.type
        )
        if want_tuple and isinstance(v, list):
            v = tuple(v)
        out[f.name] = v
    return out


def backbone_config_from_dict(d: dict):
    from smalltts_tpu.models.backbone import BackboneConfig
    from smalltts_tpu.models.dit import DiTConfig
    from smalltts_tpu.models.encoder import EncoderConfig

    d = dict(d)
    for key, sub in (("dit", DiTConfig), ("text", EncoderConfig),
                     ("style", EncoderConfig)):
        if isinstance(d.get(key), dict):
            d[key] = sub(**_filtered_kwargs(sub, d[key]))
    return BackboneConfig(**_filtered_kwargs(BackboneConfig, d))


def codec_config_from_dict(d: dict):
    from smalltts_tpu.models.codec import CodecConfig

    return CodecConfig(**_filtered_kwargs(CodecConfig, d))


def backbone_meta(cfg) -> dict:
    """The meta dict backbone-family trainers embed in their checkpoints."""
    return {"backbone_config": config_to_dict(cfg)}


def codec_meta(cfg) -> dict:
    return {"codec_config": config_to_dict(cfg)}


def backbone_config_from_meta(meta: Optional[dict]):
    """-> BackboneConfig or None (absent/old-format metadata)."""
    if meta and isinstance(meta.get("backbone_config"), dict):
        return backbone_config_from_dict(meta["backbone_config"])
    return None


def codec_config_from_meta(meta: Optional[dict]):
    if meta and isinstance(meta.get("codec_config"), dict):
        return codec_config_from_dict(meta["codec_config"])
    return None
