"""Asset management: idempotent fetch of model weights from HF Hub.

Capability parity with the reference fetcher
(reference: src/smalltts/assets/ensure.py:7-47): skip if `assets/<folder>`
exists, else snapshot-download only that folder; probes model-vs-dataset repo
type; CLI-usable. Gated: in zero-egress environments the download raises a
clear error instead of hanging.
"""

from __future__ import annotations

import os
import sys
from typing import Iterable

REPO = os.environ.get("SMALLTTS_ASSET_REPO", "smallbraineng/smalltts")
ASSETS_ROOT = os.environ.get("SMALLTTS_ASSETS", "assets")


def _repo_type() -> str:
    from huggingface_hub import HfApi

    api = HfApi()
    try:
        api.model_info(REPO)
        return "model"
    except Exception:
        try:
            api.dataset_info(REPO)
            return "dataset"
        except Exception:
            return "model"


def ensure_assets(folders: Iterable[str], root: str = ASSETS_ROOT) -> None:
    """Download each `folder` from the asset repo unless already present."""
    missing = [f for f in folders if not os.path.isdir(os.path.join(root, f))]
    if not missing:
        return
    try:
        from huggingface_hub import snapshot_download
    except ImportError as exc:
        raise RuntimeError(
            f"assets {missing} not present under {root!r} and huggingface_hub "
            "is unavailable; place weights manually"
        ) from exc
    try:
        import shutil

        repo_type = _repo_type()
        for folder in missing:
            print(f"downloading assets/{folder} from {REPO} ({repo_type})")
            # download into a staging dir and move the folder into place in
            # ONE rename: downloading straight into root made an interrupted
            # fetch look complete forever (the skip check is isdir), so a
            # later load hit missing/truncated weights with no hint that
            # deleting the folder was the fix (review r3)
            staging = os.path.join(root, f".partial-{folder}")
            shutil.rmtree(staging, ignore_errors=True)
            snapshot_download(
                REPO,
                repo_type=repo_type,
                local_dir=staging,
                allow_patterns=[f"{folder}/*"],
            )
            got = os.path.join(staging, folder)
            if not os.path.isdir(got) or not os.listdir(got):
                raise RuntimeError(
                    f"{REPO} has no files under {folder}/ (wrong repo?)")
            os.makedirs(root, exist_ok=True)
            final = os.path.join(root, folder)
            shutil.rmtree(final, ignore_errors=True)
            os.replace(got, final)
            shutil.rmtree(staging, ignore_errors=True)
    except Exception as exc:  # zero-egress / offline environments
        raise RuntimeError(
            f"downloading assets {missing} from {REPO} failed ({exc}); "
            "place weights manually or run offline"
        ) from exc


if __name__ == "__main__":
    ensure_assets(sys.argv[1:] or ["tryme", "codec", "dmd"])
