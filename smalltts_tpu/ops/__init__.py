from smalltts_tpu.ops.schedule import apply_noise, get_alpha_sigma
from smalltts_tpu.ops.masking import length_mask

__all__ = ["apply_noise", "get_alpha_sigma", "length_mask"]
