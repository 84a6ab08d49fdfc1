"""Minimal multipart/form-data parser (stdlib-only) for the /synthesize
contract: fields `audio` (bytes) and `text` (str)
(reference: src/server/src/main.rs:111-120)."""

from __future__ import annotations

import re
from typing import Dict


def parse_multipart(body: bytes, content_type: str) -> Dict[str, bytes]:
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("missing multipart boundary")
    boundary = b"--" + m.group(1).encode()
    fields: Dict[str, bytes] = {}
    for part in body.split(boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, content = part.split(b"\r\n\r\n", 1)
        name = None
        for line in header_blob.split(b"\r\n"):
            lm = re.search(rb'content-disposition:.*?name="([^"]+)"', line, re.I)
            if lm:
                name = lm.group(1).decode()
        if name:
            fields[name] = content
    return fields
