"""Converters for the DMD sidecar checkpoints (ASR / SV / discriminator).

The reference publishes these as torch state_dicts inside dmd_checkpoints
(reference: src/scripts/train/dmd2/distill.py:465-479). torchaudio and
speechbrain are absent in this environment, so the tests validate against
*structural replicas* built with exact state_dict key names and the
documented module math (torchaudio ConformerLayer, reference Discriminator)
— numerics parity for ASR/discriminator, key-layout validation for the
speechbrain ECAPA SV."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from smalltts_tpu.models.asr import ASRConfig, asr_forward  # noqa: E402
from smalltts_tpu.models.conformer import ConformerConfig  # noqa: E402
from smalltts_tpu.models.discriminator import (  # noqa: E402
    DiscriminatorConfig,
    discriminator_forward,
)
from smalltts_tpu.models.sv import SVConfig, init_sv, sv_forward  # noqa: E402
from smalltts_tpu.utils.torch_convert import (  # noqa: E402
    convert_asr_state_dict,
    convert_discriminator_state_dict,
    convert_sv_state_dict,
    state_dict_to_numpy,
)

VOCAB = 198


# ---------------------------------------------------- torchaudio replicas
# exact submodule names => exact state_dict keys; math follows the public
# torchaudio.models.conformer implementation


class _FF(nn.Module):
    def __init__(self, d, ffn):
        super().__init__()
        self.sequential = nn.Sequential(
            nn.LayerNorm(d), nn.Linear(d, ffn), nn.SiLU(), nn.Dropout(0.0),
            nn.Linear(ffn, d), nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.sequential(x)


class _ConvModule(nn.Module):
    def __init__(self, d, k, use_group_norm):
        super().__init__()
        self.layer_norm = nn.LayerNorm(d)
        norm = nn.GroupNorm(1, d) if use_group_norm else nn.BatchNorm1d(d)
        self.sequential = nn.Sequential(
            nn.Conv1d(d, 2 * d, 1), nn.GLU(dim=1),
            nn.Conv1d(d, d, k, padding=(k - 1) // 2, groups=d),
            norm, nn.SiLU(), nn.Conv1d(d, d, 1), nn.Dropout(0.0),
        )

    def forward(self, x):  # (B, T, D)
        x = self.layer_norm(x)
        return self.sequential(x.transpose(1, 2)).transpose(1, 2)


class _ConformerLayer(nn.Module):
    def __init__(self, d, ffn, h, k, use_group_norm=False):
        super().__init__()
        self.ffn1 = _FF(d, ffn)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.self_attn = nn.MultiheadAttention(d, h)
        self.conv_module = _ConvModule(d, k, use_group_norm)
        self.ffn2 = _FF(d, ffn)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, key_padding_mask=None):  # (T, B, D)
        r = x
        x = self.ffn1(x) * 0.5 + r
        r = x
        x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(x, x, x, key_padding_mask=key_padding_mask,
                              need_weights=False)
        x = x + r
        r = x
        x = r + self.conv_module(x.transpose(0, 1)).transpose(0, 1)
        r = x
        x = self.ffn2(x) * 0.5 + r
        return self.final_layer_norm(x)


class _Conformer(nn.Module):
    def __init__(self, d, h, ffn, n, k, use_group_norm=False):
        super().__init__()
        self.conformer_layers = nn.ModuleList(
            [_ConformerLayer(d, ffn, h, k, use_group_norm) for _ in range(n)]
        )

    def forward(self, x, key_padding_mask=None):  # (B, T, D)
        x = x.transpose(0, 1)
        for layer in self.conformer_layers:
            x = layer(x, key_padding_mask)
        return x.transpose(0, 1)


class ASRReplica(nn.Module):
    """Reference ASR key layout (src/smalltts/models/asr.py:25-52)."""

    class _Up(nn.Module):
        def __init__(self, d, r):
            super().__init__()
            self.deconv = nn.ConvTranspose1d(d, d, r, stride=r, groups=d)

        def forward(self, x):
            return self.deconv(x.transpose(1, 2)).transpose(1, 2)

    def __init__(self, d, h, ffn, n, k, vocab):
        super().__init__()
        self.encoder = _Conformer(d, h, ffn, n, k)
        self.proj = nn.Linear(d, vocab)
        self.upsample = self._Up(d, 4)

    def forward(self, x, lengths=None):
        x = self.upsample(x)
        kpm = None
        if lengths is not None:
            t = torch.arange(x.shape[1])
            kpm = t[None, :] >= (lengths * 4)[:, None]
        return torch.log_softmax(self.proj(self.encoder(x, kpm)), dim=-1)


def _randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm1d):
            m.running_mean.uniform_(-0.5, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)


def test_asr_conversion_numerics():
    torch.manual_seed(0)
    d, h, ffn, n, k = 16, 4, 32, 2, 9
    m = ASRReplica(d, h, ffn, n, k, VOCAB)
    _randomize_bn_stats(m)
    m.eval()

    params = convert_asr_state_dict(state_dict_to_numpy(m.state_dict()))
    cfg = ASRConfig(
        input_dim=d,
        conformer=ConformerConfig(input_dim=d, num_heads=h, ffn_dim=ffn,
                                  num_layers=n, depthwise_conv_kernel_size=k),
    )
    x = torch.randn(2, 10, d)
    with torch.no_grad():
        want = m(x).numpy()
    got, out_lens, _ = jax.jit(
        lambda p, lat, ln: asr_forward(p, cfg, lat, ln)
    )(params, x.numpy(), np.array([10, 10], np.int32))
    assert np.asarray(out_lens).tolist() == [40, 40]
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)

    # padded lengths: weight-exact parity uses pad_invariant=False (the
    # reference trained with torchaudio's conv-over-padding leakage)
    cfg_ref = ASRConfig(
        input_dim=d,
        conformer=ConformerConfig(input_dim=d, num_heads=h, ffn_dim=ffn,
                                  num_layers=n, depthwise_conv_kernel_size=k,
                                  pad_invariant=False),
    )
    lengths = torch.tensor([10, 6])
    with torch.no_grad():
        want = m(x, lengths).numpy()
    got, out_lens, _ = asr_forward(params, cfg_ref, x.numpy(),
                                   lengths.numpy().astype(np.int32))
    assert np.asarray(out_lens).tolist() == [40, 24]
    got = np.asarray(got)
    np.testing.assert_allclose(got[0], want[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(got[1, :24], want[1, :24], atol=3e-5, rtol=1e-4)


class DiscriminatorReplica(nn.Module):
    """Reference Discriminator key layout + forward math
    (src/smalltts/models/discriminator.py:47-112)."""

    def __init__(self, latent_dim, transformer_dim, model_dim, num_tail):
        super().__init__()
        self.transformer_dim = transformer_dim
        self.num_tail = num_tail
        self.layers_proj = nn.Linear(num_tail * transformer_dim, model_dim)
        self.audio_proj = nn.Linear(latent_dim, model_dim)
        self.phoneme_embed = nn.Embedding(VOCAB, model_dim)
        self.ref_proj = nn.Linear(transformer_dim, model_dim)
        self.cond_proj = nn.Linear(2, model_dim)
        self.enc_a = _Conformer(model_dim, 4, 2 * model_dim, 2, 7,
                                use_group_norm=True)
        self.out = nn.Conv1d(model_dim, 1, kernel_size=1)

    def forward(self, stacked, noised, ref_seq, ref_mask, mask, phonemes, t):
        stacked = stacked[:, -self.num_tail:, :, :]
        b, n_layers, seq_len, _ = stacked.shape
        flat = stacked.permute(0, 2, 1, 3).reshape(
            b, seq_len, n_layers * self.transformer_dim
        )
        layers_proj = self.layers_proj(flat)
        noised_proj = self.audio_proj(noised)
        mask_f = mask.float().unsqueeze(-1)
        t_f = t.view(b, 1, 1).expand(-1, noised.shape[1], 1)
        cond = self.cond_proj(torch.cat([mask_f, t_f], dim=-1))
        ref_proj = self.ref_proj(ref_seq)
        c_ph = self.phoneme_embed(phonemes)
        feats = torch.cat([layers_proj, noised_proj, cond, ref_proj, c_ph], dim=1)
        phoneme_mask = phonemes != 0
        kpm = ~torch.cat([mask, mask, mask, ref_mask, phoneme_mask], dim=1)
        enc = self.enc_a(feats, kpm)
        valid = (~kpm).float()
        y = self.out(enc.transpose(1, 2)).squeeze(1)
        return (y * valid).sum(dim=1) / valid.sum(dim=1).clamp_min(1)


def test_discriminator_conversion_numerics():
    torch.manual_seed(1)
    latent_dim, tdim, mdim, tail = 8, 24, 32, 2
    m = DiscriminatorReplica(latent_dim, tdim, mdim, tail)
    m.eval()
    params = convert_discriminator_state_dict(state_dict_to_numpy(m.state_dict()))
    cfg = DiscriminatorConfig(
        latent_dim=latent_dim, transformer_dim=tdim, ref_dim=tdim,
        model_dim=mdim, num_tail_layers=tail,
        conformer=ConformerConfig(input_dim=mdim, num_heads=4, ffn_dim=2 * mdim,
                                  num_layers=2, depthwise_conv_kernel_size=7,
                                  use_group_norm=True,
                                  # the reference trained with conv padding
                                  # leakage; weight-exact parity needs it
                                  pad_invariant=False),
    )
    b, seq, ref, ph = 2, 6, 4, 5
    stacked = torch.randn(b, 4, seq, tdim)
    noised = torch.randn(b, seq, latent_dim)
    ref_seq = torch.randn(b, ref, tdim)
    ref_mask = torch.tensor([[1, 1, 1, 1], [1, 1, 0, 0]], dtype=torch.bool)
    mask = torch.tensor([[1] * seq, [1, 1, 1, 0, 0, 0]], dtype=torch.bool)
    phonemes = torch.tensor([[3, 4, 5, 6, 7], [3, 4, 0, 0, 0]])
    t = torch.tensor([0.3, 0.8])
    with torch.no_grad():
        want = m(stacked, noised, ref_seq, ref_mask, mask, phonemes, t).numpy()
    got, _ = discriminator_forward(
        params, cfg, stacked.numpy(), noised.numpy(), ref_seq.numpy(),
        ref_mask.numpy(), mask.numpy(), phonemes.numpy().astype(np.int32),
        t.numpy(),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


# ------------------------------------------------------------- SV (ECAPA)


def _fake_speechbrain_ecapa_sd(cfg: SVConfig, rng):
    """A state_dict with speechbrain ECAPA_TDNN's exact key layout
    (speechbrain/lobes/models/ECAPA_TDNN.py; wrappers put the real modules
    at .conv.conv / .norm.norm)."""
    sd = {}

    def conv(key, c_in, c_out, k):
        sd[f"{key}.conv.weight"] = rng.randn(c_out, c_in, k).astype(np.float32) * 0.05
        sd[f"{key}.conv.bias"] = rng.randn(c_out).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = np.abs(rng.randn(c).astype(np.float32)) + 0.5
        sd[f"{key}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{key}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{key}.running_var"] = np.abs(rng.randn(c).astype(np.float32)) + 0.5
        sd[f"{key}.num_batches_tracked"] = np.asarray(10)

    def tdnn(key, c_in, c_out, k):
        conv(f"{key}.conv", c_in, c_out, k)
        bn(f"{key}.norm.norm", c_out)

    ch, ks = cfg.channels, cfg.kernel_sizes
    scale, width = cfg.res2net_scale, ch[1] // cfg.res2net_scale
    tdnn("blocks.0", cfg.input_dim, ch[0], ks[0])
    for i in (1, 2, 3):
        tdnn(f"blocks.{i}.tdnn1", ch[i - 1], ch[i], 1)
        for j in range(scale - 1):
            tdnn(f"blocks.{i}.res2net_block.blocks.{j}", width, width, ks[i])
        tdnn(f"blocks.{i}.tdnn2", ch[i], ch[i], 1)
        conv(f"blocks.{i}.se_block.conv1", ch[i], cfg.se_channels, 1)
        conv(f"blocks.{i}.se_block.conv2", cfg.se_channels, ch[i], 1)
    tdnn("mfa", ch[0] * 3, ch[-1], ks[-1])
    tdnn("asp.tdnn", ch[-1] * 3, cfg.attention_channels, 1)
    conv("asp.conv", cfg.attention_channels, ch[-1], 1)
    bn("asp_bn.norm", ch[-1] * 2)
    conv("fc", ch[-1] * 2, cfg.emb_dim, 1)
    return {f"ecapa.{k}": v for k, v in sd.items()}


def test_sv_conversion_layout_and_forward():
    cfg = SVConfig(input_dim=16, emb_dim=8, channels=(24, 24, 24, 24, 72),
                   kernel_sizes=(3, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                   attention_channels=8, res2net_scale=4, se_channels=8)
    rng = np.random.RandomState(0)
    sd = _fake_speechbrain_ecapa_sd(cfg, rng)
    params = convert_sv_state_dict(sd, res2net_scale=cfg.res2net_scale)

    # tree structure matches init_sv (plus the speechbrain ASP BN)
    ref = init_sv(jax.random.PRNGKey(0), cfg)
    ref_paths = {jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_leaves_with_path(params)}
    extra = got_paths - ref_paths
    assert not (ref_paths - got_paths), ref_paths - got_paths
    assert all("attn_tdnn_bn" in p for p in extra), extra

    # conv layout round trip: torch (C_out, C_in, K) -> ours (K, C_in, C_out)
    w_torch = sd["ecapa.blocks.0.conv.conv.weight"]
    np.testing.assert_array_equal(
        params["block0"]["conv"]["w"], w_torch.transpose(2, 1, 0)
    )
    np.testing.assert_array_equal(
        params["asp_bn"]["mean"], sd["ecapa.asp_bn.norm.running_mean"]
    )

    # shape-compatible forward with the speechbrain ASP sub-path active
    emb, _ = sv_forward(params, cfg, rng.randn(2, 12, 16).astype(np.float32),
                        np.array([12, 7], np.int32))
    assert emb.shape == (2, 8)
    assert np.isfinite(np.asarray(emb)).all()


def test_sv_conversion_full_size_keys():
    """The real checkpoint dims (768x4 + 2304, scale 12) map without error."""
    cfg = SVConfig()
    rng = np.random.RandomState(1)
    sd = _fake_speechbrain_ecapa_sd(cfg, rng)
    params = convert_sv_state_dict(sd)
    assert params["fc"]["w"].shape == (1, 4608, 192)
    assert len(params["blocks"][0]["res2net"]) == 11


def test_nested_prefixes_strip_in_any_order():
    """'_orig_mod.module.' (compiled DDP) and 'ema_model.module.' left a
    residual 'module.' under the single ordered pass (review r3)."""
    import numpy as np

    from smalltts_tpu.utils.torch_convert import clean_state_dict_keys

    sd = {"_orig_mod.module.a.w": np.zeros(1),
          "ema_model.module.b.w": np.ones(1),
          "module._orig_mod.c.w": np.ones(1) * 2}
    cleaned = clean_state_dict_keys(sd)
    assert set(cleaned) == {"a.w", "b.w", "c.w"}


def test_backbone_block_count_crosscheck():
    import numpy as np
    import pytest

    from smalltts_tpu.utils.torch_convert import convert_backbone_state_dict

    sd = {f"dit.transformer_blocks.{i}.x.weight": np.zeros(1) for i in range(3)}
    with pytest.raises(ValueError, match="3 DiT blocks"):
        convert_backbone_state_dict(sd, n_dit_blocks=12)
