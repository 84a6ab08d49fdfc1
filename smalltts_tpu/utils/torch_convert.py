"""Convert reference (torch) checkpoints into our parameter pytrees.

The reference distributes teacher / DMD student checkpoints as torch
state_dicts (reference: src/scripts/train/teacher.py:160-171,
src/scripts/train/dmd2/distill.py:465-479). This module maps those key
layouts onto our stacked-pytree parameterization:

* torch Linear weight (out, in)     -> ours (in, out)      [transpose]
* torch Conv1d  weight (out, in, k) -> ours (k, in, out)   [HIO, channel-last]
* per-block weights ....{i}....     -> stacked leading-dim-L leaves (lax.scan)

Also implements the reference's tolerant prefix-cleaning rules
(distill.py:39-57: strip module./_orig_mod./ema_model./online_model.,
drop initted/step keys) so EMA / compiled / DDP checkpoints all load.

Works on numpy arrays — call `state_dict_to_numpy` on a torch state_dict
first; torch is only imported inside that helper so the rest of the framework
never depends on it.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_PREFIXES = ("module.", "_orig_mod.", "ema_model.", "online_model.")


def clean_state_dict_keys(sd: Dict[str, "np.ndarray"]) -> Dict[str, "np.ndarray"]:
    cleaned = {}
    for k, v in sd.items():
        if k in ("initted", "step"):
            continue
        # loop until stable: a single ordered pass left residue on nested
        # spellings like '_orig_mod.module.' (compiled DDP) because
        # 'module.' had already been tried before '_orig_mod.' stripped
        while True:
            for prefix in _PREFIXES:
                if k.startswith(prefix):
                    k = k[len(prefix):]
                    break
            else:
                break
        k = k.replace("._orig_mod.", ".")
        cleaned[k] = v
    return cleaned


def state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    import torch  # local: torch is an optional conversion-time dependency

    return {
        k: v.detach().cpu().float().numpy()
        for k, v in sd.items()
        if isinstance(v, torch.Tensor)
    }


def _lin(sd, key, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if bias:
        p["b"] = sd[f"{key}.bias"]
    return p


def _conv1d(sd, key):
    # torch (C_out, C_in/groups, K) -> HIO (K, C_in/groups, C_out)
    return {
        "w": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 1, 0)),
        "b": sd[f"{key}.bias"],
    }


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"]}


def _encoder_block(sd, pre):
    return {
        "attn": {
            "wq": _lin(sd, f"{pre}.attention.wq", bias=False),
            "wk": _lin(sd, f"{pre}.attention.wk", bias=False),
            "wv": _lin(sd, f"{pre}.attention.wv", bias=False),
            "wo": _lin(sd, f"{pre}.attention.wo", bias=False),
            "gate": _lin(sd, f"{pre}.attention.gate", bias=False),
            "q_norm": _norm(sd, f"{pre}.attention.q_norm"),
            "k_norm": _norm(sd, f"{pre}.attention.k_norm"),
        },
        "mlp": {
            "w1": _lin(sd, f"{pre}.mlp.w1", bias=False),
            "w3": _lin(sd, f"{pre}.mlp.w3", bias=False),
            "w2": _lin(sd, f"{pre}.mlp.w2", bias=False),
        },
        "attention_norm": _norm(sd, f"{pre}.attention_norm"),
        "mlp_norm": _norm(sd, f"{pre}.mlp_norm"),
    }


def _cat_lins(sd, keys):
    """Concatenate reference per-projection Linears into one fused weight:
    our DiT packs q/k_self/v_self (and each cross k/v pair) into single wide
    matmuls (models/dit.py), so torch weights concatenate on the out dim."""
    ws = [np.ascontiguousarray(sd[f"{k}.weight"].T) for k in keys]
    bs = [sd[f"{k}.bias"] for k in keys]
    return {"w": np.concatenate(ws, axis=1), "b": np.concatenate(bs, axis=0)}


def _dit_block(sd, pre):
    return {
        "attn_norm": {"linear": _lin(sd, f"{pre}.attn_norm.linear")},
        "attn": {
            "qkv_self": _cat_lins(
                sd,
                [f"{pre}.attn.to_q", f"{pre}.attn.to_k_self", f"{pre}.attn.to_v_self"],
            ),
            "gate": _lin(sd, f"{pre}.attn.gate", bias=False),
            "to_out": _lin(sd, f"{pre}.attn.to_out.0", bias=False),
            "q_norm": _norm(sd, f"{pre}.attn.q_norm"),
            "k_norm": _norm(sd, f"{pre}.attn.k_norm"),
            "kv_ref": _cat_lins(sd, [f"{pre}.attn.to_k_ref", f"{pre}.attn.to_v_ref"]),
            "kv_text": _cat_lins(sd, [f"{pre}.attn.to_k_text", f"{pre}.attn.to_v_text"]),
            "k_norm_cross": _norm(sd, f"{pre}.attn.k_norm_cross"),
        },
        "ff": {
            "w1": _lin(sd, f"{pre}.ff.w1"),
            "w3": _lin(sd, f"{pre}.ff.w3"),
            "w2": _lin(sd, f"{pre}.ff.w2"),
        },
    }


def _stack(blocks):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def _count_blocks(sd, prefix: str) -> int:
    idx = len(prefix.split("."))
    return max(int(k.split(".")[idx]) + 1 for k in sd if k.startswith(prefix + "."))


def convert_text_encoder_state_dict(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Standalone reference TextEncoder state_dict -> our pytree (blocks
    stacked for lax.scan)."""
    p = (prefix + ".") if prefix else ""
    n = _count_blocks(sd, f"{p}blocks" if p else "blocks")
    return {
        "text_embedding": {"w": sd[f"{p}text_embedding.weight"]},
        "blocks": _stack([_encoder_block(sd, f"{p}blocks.{i}") for i in range(n)]),
        "norm": _norm(sd, f"{p}norm"),
    }


def convert_style_encoder_state_dict(sd: Dict[str, np.ndarray], prefix: str = ""):
    p = (prefix + ".") if prefix else ""
    n = _count_blocks(sd, f"{p}blocks" if p else "blocks")
    return {
        "in_proj": _lin(sd, f"{p}in_proj"),
        "log_scale": sd[f"{p}log_scale"],
        "blocks": _stack([_encoder_block(sd, f"{p}blocks.{i}") for i in range(n)]),
        "norm": _norm(sd, f"{p}norm"),
        "out_proj": _lin(sd, f"{p}out_proj"),
    }


def convert_dit_state_dict(sd: Dict[str, np.ndarray], prefix: str = ""):
    p = (prefix + ".") if prefix else ""
    n = _count_blocks(sd, f"{p}transformer_blocks" if p else "transformer_blocks")
    return {
        "input_embed": {
            "proj": _lin(sd, f"{p}input_embed.proj"),
            "conv1": _conv1d(sd, f"{p}input_embed.conv_pos_embed.conv1"),
            "conv2": _conv1d(sd, f"{p}input_embed.conv_pos_embed.conv2"),
        },
        "phoneme_proj": _lin(sd, f"{p}phoneme_proj"),
        "emb_proj": {
            "l1": _lin(sd, f"{p}emb_proj.0"),
            "l2": _lin(sd, f"{p}emb_proj.2"),
        },
        "blocks": _stack(
            [_dit_block(sd, f"{p}transformer_blocks.{i}") for i in range(n)]
        ),
        "norm_out": {"linear": _lin(sd, f"{p}norm_out.linear")},
    }


def convert_backbone_state_dict(sd: Dict[str, np.ndarray],
                                n_dit_blocks: Optional[int] = None):
    """Reference DiTModel state_dict -> our backbone param pytree (numpy
    leaves). The DiT block count is always derived from the state_dict;
    `n_dit_blocks`, when given, is a cross-check that fails loudly instead
    of silently converting a different depth than the caller expected
    (it used to be accepted and ignored, review r3)."""
    sd = clean_state_dict_keys(sd)
    if n_dit_blocks is not None:
        found = _count_blocks(sd, "dit.transformer_blocks")
        if found != n_dit_blocks:
            raise ValueError(
                f"checkpoint has {found} DiT blocks, caller expected "
                f"{n_dit_blocks}")
    return {
        "time_embedding": {
            "l1": _lin(sd, "time_embedding.mlp.0"),
            "l2": _lin(sd, "time_embedding.mlp.2"),
        },
        "phoneme_embedding": convert_text_encoder_state_dict(sd, "phoneme_embedding"),
        "style_encoder": convert_style_encoder_state_dict(sd, "style_encoder"),
        "dit": convert_dit_state_dict(sd, "dit"),
        "velocity": _lin(sd, "velocity"),
    }


# ---------------------------------------------------------------------------
# DMD sidecar models: ASR / SV / discriminator (reference publishes these in
# dmd_checkpoints, saved at src/scripts/train/dmd2/distill.py:465-479)
# ---------------------------------------------------------------------------


def _ln_affine(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn_state(sd, key):
    """torch BatchNorm1d (weight/bias/running_mean/running_var) -> our
    batchnorm params+state (ops/nn.init_batchnorm layout)."""
    return {
        "scale": sd[f"{key}.weight"],
        "bias": sd[f"{key}.bias"],
        "mean": sd[f"{key}.running_mean"],
        "var": sd[f"{key}.running_var"],
    }


def _ffn_module(sd, pre):
    # torchaudio _FeedForwardModule.sequential: 0=LayerNorm, 1=Linear,
    # 2=SiLU, 3=Dropout, 4=Linear, 5=Dropout
    return {
        "ln": _ln_affine(sd, f"{pre}.sequential.0"),
        "w1": _lin(sd, f"{pre}.sequential.1"),
        "w2": _lin(sd, f"{pre}.sequential.4"),
    }


def _conformer_layer(sd, pre, use_group_norm: bool):
    # torchaudio ConformerLayer; conv_module.sequential: 0=pw Conv1d(d->2d,1),
    # 1=GLU, 2=depthwise Conv1d(k, groups=d), 3=BatchNorm1d|GroupNorm,
    # 4=SiLU, 5=pw Conv1d(d->d,1)
    conv = {
        "pw1": _conv1d(sd, f"{pre}.conv_module.sequential.0"),
        "dw": _conv1d(sd, f"{pre}.conv_module.sequential.2"),
        "pw2": _conv1d(sd, f"{pre}.conv_module.sequential.5"),
    }
    if use_group_norm:
        conv["gn_scale"] = sd[f"{pre}.conv_module.sequential.3.weight"]
        conv["gn_bias"] = sd[f"{pre}.conv_module.sequential.3.bias"]
    else:
        conv["bn"] = _bn_state(sd, f"{pre}.conv_module.sequential.3")
    return {
        "ffn1": _ffn_module(sd, f"{pre}.ffn1"),
        "attn_ln": _ln_affine(sd, f"{pre}.self_attn_layer_norm"),
        "attn": {
            # nn.MultiheadAttention packs q/k/v rows in in_proj_weight
            "in_proj": {
                "w": np.ascontiguousarray(sd[f"{pre}.self_attn.in_proj_weight"].T),
                "b": sd[f"{pre}.self_attn.in_proj_bias"],
            },
            "out_proj": _lin(sd, f"{pre}.self_attn.out_proj"),
        },
        "conv_ln": _ln_affine(sd, f"{pre}.conv_module.layer_norm"),
        "conv": conv,
        "ffn2": _ffn_module(sd, f"{pre}.ffn2"),
        "final_ln": _ln_affine(sd, f"{pre}.final_layer_norm"),
    }


def _conformer_stack(sd, pre, use_group_norm: bool):
    n = _count_blocks(sd, pre)
    return {
        "layers": [
            _conformer_layer(sd, f"{pre}.{i}", use_group_norm) for i in range(n)
        ]
    }


def convert_asr_state_dict(sd: Dict[str, np.ndarray]):
    """Reference ASR (src/smalltts/models/asr.py: depthwise ConvTranspose1d
    upsample + torchaudio Conformer + Linear head) -> our pytree."""
    sd = clean_state_dict_keys(sd)
    return {
        # ConvTranspose1d(d, d, r, stride=r, groups=d) weight (d, 1, r) ->
        # ours (r, 1, d)
        "upsample": {
            "w": np.ascontiguousarray(
                sd["upsample.deconv.weight"].transpose(2, 1, 0)
            ),
            "b": sd["upsample.deconv.bias"],
        },
        "conformer": _conformer_stack(
            sd, "encoder.conformer_layers", use_group_norm=False
        ),
        "proj": _lin(sd, "proj"),
    }


def convert_discriminator_state_dict(sd: Dict[str, np.ndarray]):
    """Reference Discriminator (src/smalltts/models/discriminator.py:47-112)
    -> our pytree (local torchaudio-ConformerLayer stack, group norm)."""
    sd = clean_state_dict_keys(sd)
    return {
        "layers_proj": _lin(sd, "layers_proj"),
        "audio_proj": _lin(sd, "audio_proj"),
        "phoneme_embed": {"w": sd["phoneme_embed.weight"]},
        "ref_proj": _lin(sd, "ref_proj"),
        "cond_proj": _lin(sd, "cond_proj"),
        "enc": _conformer_stack(sd, "enc_a.conformer_layers", use_group_norm=True),
        "out": _conv1d(sd, "out"),
    }


def _sb_conv(sd, key):
    """speechbrain Conv1d wrapper (self.conv = nn.Conv1d) -> ours."""
    return _conv1d(sd, f"{key}.conv")


def _sb_tdnn(sd, key):
    """speechbrain TDNNBlock: Conv1d wrapper + activation + BatchNorm1d
    wrapper (self.norm.norm)."""
    return {"conv": _sb_conv(sd, f"{key}.conv"), "bn": _bn_state(sd, f"{key}.norm.norm")}


def convert_sv_state_dict(sd: Dict[str, np.ndarray],
                          res2net_scale: Optional[int] = None):
    """Reference SV student (speechbrain ECAPA_TDNN under the `ecapa.`
    prefix, src/smalltts/models/sv/model.py:13-24) -> our pytree.

    The converted params include `asp.attn_tdnn_bn` (speechbrain's ASP runs
    its attention conv through a TDNNBlock: conv -> ReLU -> BN -> tanh);
    sv_forward enables that sub-path when the key is present."""
    sd = clean_state_dict_keys(sd)
    if any(k.startswith("ecapa.") for k in sd):
        sd = {k[len("ecapa."):]: v for k, v in sd.items() if k.startswith("ecapa.")}

    def se_res2net(pre):
        # scale is self-describing: count the res2net blocks actually in
        # the state_dict (scale-1 of them). A hardcoded default dropped or
        # KeyError'd on checkpoints with a different scale — the standard
        # speechbrain VoxCeleb ECAPA uses 8 where ours uses 12 (review r3).
        n = (res2net_scale - 1 if res2net_scale is not None
             else _count_blocks(sd, f"{pre}.res2net_block.blocks"))
        return {
            "in_tdnn": _sb_tdnn(sd, f"{pre}.tdnn1"),
            "res2net": [
                _sb_tdnn(sd, f"{pre}.res2net_block.blocks.{j}")
                for j in range(n)
            ],
            "out_tdnn": _sb_tdnn(sd, f"{pre}.tdnn2"),
            "se1": _sb_conv(sd, f"{pre}.se_block.conv1"),
            "se2": _sb_conv(sd, f"{pre}.se_block.conv2"),
        }

    return {
        "block0": _sb_tdnn(sd, "blocks.0"),
        "blocks": [se_res2net(f"blocks.{i}") for i in (1, 2, 3)],
        "mfa": _sb_tdnn(sd, "mfa"),
        "asp": {
            "attn1": _sb_conv(sd, "asp.tdnn.conv"),
            "attn_tdnn_bn": _bn_state(sd, "asp.tdnn.norm.norm"),
            "attn2": _sb_conv(sd, "asp.conv"),
        },
        "asp_bn": _bn_state(sd, "asp_bn.norm"),
        "fc": _sb_conv(sd, "fc"),
    }
