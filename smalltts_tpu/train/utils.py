"""Training-math utilities (API-compatible surface with the reference's
src/smalltts/train/utils.py:12-67; implementations live in ops.schedule /
ops.masking)."""

from smalltts_tpu.ops.masking import length_mask, masked_mse
from smalltts_tpu.ops.schedule import (
    apply_noise,
    get_alpha_sigma,
    random_cond_mask,
    x_pred_from_velocity,
)


def get_mask(lengths, max_len: int):
    """(B,) lengths -> (B, max_len) bool (reference: utils.py:41-50)."""
    return length_mask(lengths, max_len)


get_random_cond = random_cond_mask

__all__ = [
    "apply_noise",
    "get_alpha_sigma",
    "get_mask",
    "get_random_cond",
    "length_mask",
    "masked_mse",
    "x_pred_from_velocity",
]
