"""Tiny model configs shared by fast tests (full-size parity runs under RUN_SLOW)."""

from smalltts_tpu.models.backbone import BackboneConfig
from smalltts_tpu.models.codec import CodecConfig
from smalltts_tpu.models.dit import DiTConfig
from smalltts_tpu.models.encoder import EncoderConfig

TINY_TEXT = EncoderConfig(
    model_size=32, num_layers=2, num_heads=2, intermediate_size=64, norm_eps=1e-6
)
TINY_STYLE = EncoderConfig(
    model_size=32, num_layers=2, num_heads=2, intermediate_size=64, norm_eps=1e-5
)
TINY_DIT = DiTConfig(
    latent_dim=64, phoneme_dim=32, hidden_dim=64, n_blocks=2, heads=4, rot_dim=8,
    conv_groups=16,
)
TINY_BACKBONE = BackboneConfig(
    latent_dim=64, hidden_dim=64, phoneme_dim=32, dit=TINY_DIT,
    text=TINY_TEXT, style=TINY_STYLE,
)
# real hop 3200 but skinny channels — cheap on CPU, same shape contract
TINY_CODEC = CodecConfig(latent_dim=64, channels=(16, 16, 16, 8, 8, 4))
