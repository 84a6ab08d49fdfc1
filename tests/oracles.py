"""Load the reference torch implementation as a numerical parity oracle.

The reference at /root/reference is imported read-only (never copied) to
verify that our JAX models are numerically equivalent after weight
conversion. Missing optional deps of the reference (beartype, phonemizer,
inflect) are stubbed: beartype becomes a no-op decorator, the espeak backend
is never exercised.
"""

from __future__ import annotations

import sys
import types

_REF = "/root/reference/src"


def _install_stubs() -> None:
    if "beartype" not in sys.modules:
        beartype_mod = types.ModuleType("beartype")
        beartype_mod.beartype = lambda fn=None, **kw: (fn if fn is not None else (lambda f: f))
        sys.modules["beartype"] = beartype_mod

    if "phonemizer" not in sys.modules:
        phonemizer = types.ModuleType("phonemizer")
        backend = types.ModuleType("phonemizer.backend")
        logger = types.ModuleType("phonemizer.logger")

        class _FakeEspeak:
            def __init__(self, *a, **k):
                pass

            def phonemize(self, texts):
                return ["" for _ in texts]

        backend.EspeakBackend = _FakeEspeak
        logger.get_logger = lambda **k: None
        phonemizer.backend = backend
        phonemizer.logger = logger
        sys.modules["phonemizer"] = phonemizer
        sys.modules["phonemizer.backend"] = backend
        sys.modules["phonemizer.logger"] = logger

    if "inflect" not in sys.modules:
        inflect = types.ModuleType("inflect")

        class _FakeEngine:
            def __getattr__(self, name):
                raise RuntimeError("inflect stub: not usable in oracle mode")

        inflect.engine = lambda: _FakeEngine()
        sys.modules["inflect"] = inflect


def import_reference(module: str):
    """Import a module from the reference package (e.g. 'smalltts.models.backbone.dit')."""
    _install_stubs()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import importlib

    return importlib.import_module(module)
