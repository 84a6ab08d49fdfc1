"""Phonemize bridge: argv text -> JSON token ids on stdout.

Capability parity with the reference bridge (reference:
src/scripts/phonemize.py:1-19). Kept for tooling compatibility, although our
server phonemizes IN-PROCESS (smalltts_tpu.text.phonemize) instead of
spawning this script per request like the reference Rust server
(src/server/src/phonemize.rs:8-14).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from smalltts_tpu.text import get_token_ids  # noqa: E402

if __name__ == "__main__":
    if sys.argv[1:2] in (["-h"], ["--help"]) and len(sys.argv) == 2:
        print(__doc__.strip())
        print("\nusage: phonemize.py <text ...>   # JSON token ids on stdout")
        sys.exit(0)
    text = " ".join(sys.argv[1:])
    print(json.dumps(get_token_ids(text)))
