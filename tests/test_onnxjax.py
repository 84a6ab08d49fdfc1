"""ONNX -> JAX importer tests.

Validates the pure-Python proto parser and the graph interpreter against a
*third-party producer*: real files from `torch.onnx.export` (torchscript
exporter; its final onnxscript post-pass is patched out since it is a no-op
for standard ops). Covers the op vocabulary a VibeVoice-class codec export
can contain (reference: src/smalltts/codec/onnx.py — conv/convtranspose
stacks, norms, gated activations, shape math with dynamic time axes).
"""

import io
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from smalltts_tpu.onnxjax import OnnxFunction, parse_model  # noqa: E402
from smalltts_tpu.onnxjax import proto  # noqa: E402

warnings.filterwarnings("ignore")


def export(module, args, opset=17, dynamic_axes=None):
    """torch.onnx.export to bytes without the `onnx` package installed."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    module.eval()
    buf = io.BytesIO()
    with torch.no_grad():
        torch.onnx.export(
            module, args, buf, opset_version=opset, dynamic_axes=dynamic_axes,
            dynamo=False,
        )
    return buf.getvalue()


def run_parity(module, args, opset=17, atol=1e-5, rtol=1e-5, dynamic_axes=None):
    fn = OnnxFunction(parse_model(export(module, args, opset, dynamic_axes)))
    with torch.no_grad():
        want = module(*args)
    wants = want if isinstance(want, tuple) else (want,)
    got = jax.jit(fn)(fn.params, *[a.numpy() for a in args])
    gots = got if isinstance(got, tuple) else (got,)
    assert len(gots) == len(wants)
    for g, w in zip(gots, wants):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy(), atol=atol, rtol=rtol
        )
    return fn


# ------------------------------------------------------------------- proto


def test_parser_reads_torch_export():
    m = parse_model(export(nn.Conv1d(4, 8, 3, padding=1), (torch.randn(1, 4, 16),)))
    assert m.opset[""] == 17
    assert m.producer_name == "pytorch"
    ops = [n.op_type for n in m.graph.nodes]
    assert "Conv" in ops
    inits = {t.name: proto.tensor_to_numpy(t) for t in m.graph.initializers}
    shapes = sorted(v.shape for v in inits.values())
    assert shapes == [(8,), (8, 4, 3)]


def test_writer_roundtrip():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    g = proto.Graph(
        name="t",
        nodes=[
            proto.Node(
                op_type="Mul", inputs=["x", "w"], outputs=["y"],
            )
        ],
        initializers=[proto.numpy_to_tensor("w", arr)],
        inputs=[proto.make_value_info("x", 1, [2, 3, 4])],
        outputs=[proto.make_value_info("y", 1, [2, 3, 4])],
    )
    m = proto.Model(ir_version=8, graph=g, opset={"": 17})
    parsed = parse_model(proto.serialize_model(m))
    assert parsed.opset[""] == 17
    assert parsed.graph.nodes[0].op_type == "Mul"
    np.testing.assert_array_equal(
        proto.tensor_to_numpy(parsed.graph.initializers[0]), arr
    )
    fn = OnnxFunction(parsed)
    x = np.ones((2, 3, 4), np.float32)
    np.testing.assert_allclose(np.asarray(fn(fn.params, x)), arr)


def test_writer_attribute_kinds():
    g = proto.Graph(
        nodes=[
            proto.Node(
                op_type="Concat", inputs=["x", "x"], outputs=["y"],
                attributes={"axis": proto.attr_i("axis", 1)},
            )
        ],
        inputs=[proto.make_value_info("x", 1, [2, 2])],
        outputs=[proto.make_value_info("y", 1, [2, 4])],
    )
    fn = OnnxFunction(parse_model(proto.serialize_model(proto.Model(graph=g))))
    x = np.random.randn(2, 2).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fn(fn.params, x)), np.concatenate([x, x], 1)
    )


# --------------------------------------------------------------- conv family


def test_conv1d_variants():
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Conv1d(8, 16, 5, stride=2, padding=2)
            self.b = nn.Conv1d(16, 16, 3, padding=2, dilation=2)
            self.c = nn.Conv1d(16, 16, 7, padding=3, groups=16)  # depthwise
            self.d = nn.Conv1d(16, 4, 1)

        def forward(self, x):
            return self.d(self.c(self.b(self.a(x))))

    run_parity(M(), (torch.randn(2, 8, 40),))


def test_conv2d_and_pool():
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, padding=1)
            self.pool = nn.MaxPool2d(2, 2)
            self.avg = nn.AvgPool2d(3, stride=1, padding=1)

        def forward(self, x):
            return self.avg(self.pool(F.relu(self.conv(x))))

    run_parity(M(), (torch.randn(1, 3, 16, 16),))


def test_conv_transpose1d_variants():
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.ConvTranspose1d(16, 8, 4, stride=2, padding=1)
            self.b = nn.ConvTranspose1d(8, 8, 5, stride=3, padding=1, output_padding=2)
            self.c = nn.ConvTranspose1d(8, 8, 4, stride=2, padding=1, groups=8)

        def forward(self, x):
            return self.c(self.b(self.a(x)))

    run_parity(M(), (torch.randn(2, 16, 10),), atol=1e-4)


def test_depthwise_conv_transpose_asr_style():
    # the reference ASR upsampler shape (src/smalltts/models/asr.py:11-22)
    torch.manual_seed(0)
    m = nn.ConvTranspose1d(64, 64, 8, stride=4, padding=2, groups=64)
    run_parity(m, (torch.randn(2, 64, 20),))


# ----------------------------------------------------------------- networks


def test_mlp_gemm_layernorm_gelu():
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(32, 64)
            self.ln = nn.LayerNorm(64)
            self.fc2 = nn.Linear(64, 16)

        def forward(self, x):
            return self.fc2(F.gelu(self.ln(self.fc1(x))))

    run_parity(M(), (torch.randn(4, 32),))


def test_convnext_style_block():
    torch.manual_seed(0)

    class Block(nn.Module):
        def __init__(self, dim=32):
            super().__init__()
            self.dw = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
            self.norm = nn.LayerNorm(dim)
            self.p1 = nn.Linear(dim, dim * 4)
            self.p2 = nn.Linear(dim * 4, dim)

        def forward(self, x):  # (B, C, T)
            h = self.dw(x).transpose(1, 2)
            h = self.p2(F.gelu(self.p1(self.norm(h)))).transpose(1, 2)
            return x + h

    run_parity(Block(), (torch.randn(2, 32, 24),), atol=2e-5)


def test_attention_block():
    torch.manual_seed(0)

    class Attn(nn.Module):
        def __init__(self, d=32, h=4):
            super().__init__()
            self.h = h
            self.qkv = nn.Linear(d, 3 * d)
            self.out = nn.Linear(d, d)

        def forward(self, x):  # (B, T, D)
            b, t, d = x.shape
            q, k, v = self.qkv(x).chunk(3, dim=-1)
            q = q.view(b, t, self.h, -1).transpose(1, 2)
            k = k.view(b, t, self.h, -1).transpose(1, 2)
            v = v.view(b, t, self.h, -1).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / (d // self.h) ** 0.5, -1)
            return self.out((a @ v).transpose(1, 2).reshape(b, t, d))

    run_parity(Attn(), (torch.randn(2, 10, 32),), atol=1e-5)


def test_norms():
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.gn = nn.GroupNorm(4, 16)
            self.inorm = nn.InstanceNorm1d(16, affine=True)
            self.bn = nn.BatchNorm1d(16)

        def forward(self, x):
            return self.bn(self.inorm(self.gn(x)))

    m = M()
    m.eval()
    # give batchnorm non-trivial running stats
    m.bn.running_mean.uniform_(-1, 1)
    m.bn.running_var.uniform_(0.5, 2.0)
    run_parity(m, (torch.randn(2, 16, 12),), atol=1e-5)


def test_activation_zoo():
    torch.manual_seed(0)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.prelu = nn.PReLU(8)

        def forward(self, x):
            x = F.silu(x) + F.mish(x)
            x = F.elu(x) + F.leaky_relu(x, 0.2)
            x = F.hardswish(x) + F.hardsigmoid(x)
            x = F.softplus(x) + torch.tanh(x) + F.selu(x)
            return self.prelu(x)

    run_parity(M(), (torch.randn(2, 8, 10),), atol=1e-5)


def test_snake_style_ops():
    # snake activation as ONNX emits it: Sin/Pow/Mul/Div/Add chains
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.alpha = nn.Parameter(torch.rand(8, 1) + 0.5)

        def forward(self, x):
            return x + torch.sin(self.alpha * x) ** 2 / self.alpha

    run_parity(M(), (torch.randn(2, 8, 16),), atol=1e-5)


def test_weight_norm_conv():
    torch.manual_seed(0)
    m = nn.utils.parametrizations.weight_norm(nn.Conv1d(8, 16, 3, padding=1))
    run_parity(m, (torch.randn(2, 8, 12),), atol=1e-5)


# ----------------------------------------------------------- data movement


def test_pad_modes():
    class M(nn.Module):
        def forward(self, x):
            a = F.pad(x, (2, 3), mode="constant", value=1.5)
            b = F.pad(x, (2, 2), mode="reflect")
            c = F.pad(x, (1, 4), mode="replicate")
            return a, b, c

    run_parity(M(), (torch.randn(2, 4, 16),))


def test_slice_chunk_cat_flip():
    class M(nn.Module):
        def forward(self, x):
            a, b = x.chunk(2, dim=1)
            c = torch.cat([b, a], dim=1)
            d = c[:, :, 1:-1]
            e = torch.flip(d, dims=[-1])
            return e[:, ::2]

    run_parity(M(), (torch.randn(2, 8, 16),))


def test_embedding_gather():
    torch.manual_seed(0)
    m = nn.Embedding(100, 16)
    run_parity(m, (torch.randint(0, 100, (2, 12)),))


def test_reductions_and_stats():
    class M(nn.Module):
        def forward(self, x):
            mu = x.mean(dim=-1, keepdim=True)
            sd = torch.sqrt(((x - mu) ** 2).mean(dim=-1, keepdim=True) + 1e-5)
            z = (x - mu) / sd
            return z.sum(dim=1), z.amax(dim=-1), z.abs().amin(dim=0)

    run_parity(M(), (torch.randn(3, 5, 7),), atol=1e-5)


def test_where_clip_cast():
    class M(nn.Module):
        def forward(self, x):
            y = torch.where(x > 0, x, x * 0.1)
            y = torch.clamp(y, -0.5, 0.5)
            return y + (x > 0.2).float()

    run_parity(M(), (torch.randn(4, 6),))


def test_expand_repeat_broadcast():
    class M(nn.Module):
        def forward(self, x):
            a = x.unsqueeze(1).expand(-1, 3, -1)
            b = x.repeat(2, 1)
            return a.reshape(x.shape[0], -1), b

    run_parity(M(), (torch.randn(2, 5),))


def test_upsample_nearest_and_linear():
    class M(nn.Module):
        def forward(self, x):
            a = F.interpolate(x, scale_factor=2.0, mode="nearest")
            b = F.interpolate(x, scale_factor=2.0, mode="linear", align_corners=False)
            c = F.interpolate(x, scale_factor=2.0, mode="linear", align_corners=True)
            return a, b, c

    run_parity(M(), (torch.randn(2, 4, 12),), atol=1e-5)


def test_dynamic_time_axis_reshape_chain():
    """Shape->Gather->Concat->Reshape chains (what real dynamic-axis exports
    contain) must fold at the *call-time* static shape: (B,C,T) -> (B,T/4,4C).
    Built with the writer because the torchscript exporter constant-folds
    Python shape arithmetic even under dynamic_axes."""
    P = proto
    nodes = [
        P.Node(op_type="Transpose", inputs=["x"], outputs=["xt"],
               attributes={"perm": P.attr_ints("perm", [0, 2, 1])}),
        P.Node(op_type="Shape", inputs=["x"], outputs=["shp"]),
        P.Node(op_type="Constant", outputs=["i0"],
               attributes={"value": P.attr_t("value", np.array([0], np.int64))}),
        P.Node(op_type="Constant", outputs=["i2"],
               attributes={"value": P.attr_t("value", np.array([2], np.int64))}),
        P.Node(op_type="Constant", outputs=["four"],
               attributes={"value": P.attr_t("value", np.array([4], np.int64))}),
        P.Node(op_type="Constant", outputs=["neg1"],
               attributes={"value": P.attr_t("value", np.array([-1], np.int64))}),
        P.Node(op_type="Gather", inputs=["shp", "i0"], outputs=["b"]),
        P.Node(op_type="Gather", inputs=["shp", "i2"], outputs=["t"]),
        P.Node(op_type="Div", inputs=["t", "four"], outputs=["t4"]),
        P.Node(op_type="Concat", inputs=["b", "t4", "neg1"], outputs=["tgt"],
               attributes={"axis": P.attr_i("axis", 0)}),
        P.Node(op_type="Reshape", inputs=["xt", "tgt"], outputs=["y"]),
    ]
    g = P.Graph(
        nodes=nodes,
        inputs=[P.make_value_info("x", 1, ["b", 8, "t"])],
        outputs=[P.make_value_info("y", 1, ["b", "t4", 32])],
    )
    fn = OnnxFunction(parse_model(P.serialize_model(P.Model(graph=g, opset={"": 17}))))
    for shape in [(2, 8, 16), (3, 8, 32)]:
        x = np.random.randn(*shape).astype(np.float32)
        got = np.asarray(jax.jit(fn)(fn.params, x))
        want = x.transpose(0, 2, 1).reshape(shape[0], shape[2] // 4, 32)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv_graph_runs_at_new_length():
    """A conv-only graph (the real codec case) re-traces cleanly at a
    different time length than the export example."""
    torch.manual_seed(0)
    enc = MiniEncoder()
    fn = OnnxFunction(
        parse_model(
            export(enc, (torch.randn(1, 1, 80),), dynamic_axes={"x": {0: "b", 2: "t"}})
        )
    )
    x2 = torch.randn(3, 1, 200)
    with torch.no_grad():
        want = enc(x2).numpy()
    got = np.asarray(jax.jit(fn)(fn.params, x2.numpy()))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fp16_initializers_load():
    torch.manual_seed(0)
    m = nn.Linear(8, 4).half()
    x = torch.randn(2, 8).half()
    fn = OnnxFunction(parse_model(export(m, (x,))))
    assert all(v.dtype == np.float16 for v in fn.params.values())
    got = np.asarray(fn(fn.params, x.numpy()))
    np.testing.assert_allclose(got, m(x).detach().numpy(), atol=1e-2)


# --------------------------------------------------------------- mini codec


class MiniEncoder(nn.Module):
    """VibeVoice-shaped encoder: (B,1,T) -> (B, T/hop, D); hop = 4*5 = 20."""

    def __init__(self, d=16):
        super().__init__()
        self.stem = nn.Conv1d(1, 8, 7, padding=3)
        self.down1 = nn.Conv1d(8, 16, 8, stride=4, padding=2)
        self.res1 = nn.Conv1d(16, 16, 3, padding=1)
        self.down2 = nn.Conv1d(16, 32, 10, stride=5, padding=3)
        self.norm = nn.GroupNorm(4, 32)
        self.head = nn.Conv1d(32, d, 1)

    def forward(self, x):
        h = F.gelu(self.stem(x))
        h = F.gelu(self.down1(h))
        h = h + torch.tanh(self.res1(h))
        h = self.norm(F.gelu(self.down2(h)))
        return self.head(h).transpose(1, 2)


class MiniDecoder(nn.Module):
    """(B, T', D) -> (B, 1, T'*20), ConvTranspose upsampling + snake."""

    def __init__(self, d=16):
        super().__init__()
        self.inp = nn.Conv1d(d, 32, 3, padding=1)
        self.up1 = nn.ConvTranspose1d(32, 16, 10, stride=5, padding=3, output_padding=1)
        self.alpha = nn.Parameter(torch.rand(16, 1) + 0.5)
        self.up2 = nn.ConvTranspose1d(16, 8, 8, stride=4, padding=2)
        self.out = nn.Conv1d(8, 1, 7, padding=3)

    def forward(self, z):
        h = self.inp(z.transpose(1, 2))
        h = self.up1(F.gelu(h))
        h = h + torch.sin(self.alpha * h) ** 2 / self.alpha
        h = self.up2(h)
        return torch.tanh(self.out(h))


def test_mini_codec_end_to_end():
    torch.manual_seed(1)
    enc, dec = MiniEncoder(), MiniDecoder()
    hop = 20
    audio = torch.randn(2, 1, 8 * hop) * 0.3

    enc_fn = OnnxFunction(
        parse_model(export(enc, (audio,), dynamic_axes={"x": {0: "b", 2: "t"}}))
    )
    with torch.no_grad():
        lat_t = enc(audio)
    lat = np.asarray(jax.jit(enc_fn)(enc_fn.params, audio.numpy()))
    np.testing.assert_allclose(lat, lat_t.numpy(), atol=2e-5, rtol=1e-4)
    assert lat.shape == (2, 8, 16)

    dec_fn = OnnxFunction(parse_model(export(dec, (lat_t,))))
    with torch.no_grad():
        wav_t = dec(lat_t)
    wav = np.asarray(jax.jit(dec_fn)(dec_fn.params, lat))
    assert wav.shape == (2, 1, 8 * hop)
    np.testing.assert_allclose(wav, wav_t.numpy(), atol=5e-5, rtol=1e-3)


def test_unsupported_op_reports_names():
    g = proto.Graph(
        nodes=[proto.Node(op_type="BogusOp9000", inputs=["x"], outputs=["y"])],
        inputs=[proto.make_value_info("x", 1, [1])],
        outputs=[proto.make_value_info("y", 1, [1])],
    )
    with pytest.raises(NotImplementedError, match="BogusOp9000"):
        OnnxFunction(parse_model(proto.serialize_model(proto.Model(graph=g))))


def test_lstm_forward_and_bidirectional():
    torch.manual_seed(0)
    for bidi in (False, True):
        m = nn.LSTM(input_size=6, hidden_size=5, bidirectional=bidi)
        x = torch.randn(7, 2, 6)  # (T, B, I)

        class Wrap(nn.Module):
            def __init__(self, lstm):
                super().__init__()
                self.lstm = lstm

            def forward(self, x):
                y, (h, c) = self.lstm(x)
                return y, h, c

        run_parity(Wrap(m), (x,), atol=1e-5)


def test_gru_forward_and_reverse():
    torch.manual_seed(1)
    for bidi in (False, True):
        m = nn.GRU(input_size=4, hidden_size=3, bidirectional=bidi)
        x = torch.randn(5, 2, 4)

        class Wrap(nn.Module):
            def __init__(self, gru):
                super().__init__()
                self.gru = gru

            def forward(self, x):
                y, h = self.gru(x)
                return y, h

        run_parity(Wrap(m), (x,), atol=1e-5)


def test_encodec_style_lstm_bottleneck():
    """conv downsample -> LSTM bottleneck -> conv (the EnCodec codec shape)."""
    torch.manual_seed(2)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.down = nn.Conv1d(1, 8, 8, stride=4, padding=2)
            self.lstm = nn.LSTM(8, 8)
            self.out = nn.Conv1d(8, 4, 3, padding=1)

        def forward(self, x):  # (B, 1, T)
            h = torch.relu(self.down(x))
            seq = h.permute(2, 0, 1)  # (T, B, C)
            y, _ = self.lstm(seq)
            return self.out((y + seq).permute(1, 2, 0))

    run_parity(M(), (torch.randn(2, 1, 64),), atol=1e-5)


# ------------------------------------------------- ONNX spec-conformance fixes


def _single_op_fn(op_type, n_in, attrs=None, inits=None, out_rank_hint=None):
    """Graph with one node: inputs x0..x{n-1} (+ named initializers)."""
    inits = inits or {}
    in_names = [f"x{i}" for i in range(n_in)]
    g = proto.Graph(
        nodes=[proto.Node(op_type=op_type,
                          inputs=in_names + list(inits),
                          outputs=["y"], attributes=attrs or {})],
        initializers=[proto.numpy_to_tensor(k, v) for k, v in inits.items()],
        inputs=[proto.make_value_info(n, 1, []) for n in in_names],
        outputs=[proto.make_value_info("y", 1, [])],
    )
    return OnnxFunction(parse_model(proto.serialize_model(proto.Model(graph=g))))


def test_flatten_negative_axis():
    """ONNX: negative axis means axis + rank (was off by one via % (rank+1))."""
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    fn = _single_op_fn("Flatten", 1, {"axis": proto.attr_i("axis", -1)})
    assert np.asarray(fn(fn.params, x)).shape == (6, 4)
    fn = _single_op_fn("Flatten", 1, {"axis": proto.attr_i("axis", -3)})
    assert np.asarray(fn(fn.params, x)).shape == (1, 24)


def test_pow_integer_base_float_exponent():
    """pow(4:int, 0.5) must be 2, not 4**int(0.5)==1."""
    fn = _single_op_fn("Pow", 2)
    y = np.asarray(fn(fn.params, np.array([4, 9], np.int64),
                      np.array(0.5, np.float32)))
    np.testing.assert_array_equal(y, [2, 3])
    # output takes the base (integer) dtype; x64 is disabled in tests so
    # int64 inputs surface as int32
    assert np.issubdtype(y.dtype, np.integer)


def test_reduce_sum_empty_axes_input_reduces_all():
    """An explicitly EMPTY axes tensor (noop_with_empty_axes=0) means reduce
    over ALL axes, not reduce nothing."""
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    fn = _single_op_fn("ReduceSum", 1,
                       {"keepdims": proto.attr_i("keepdims", 0)},
                       inits={"axes": np.zeros((0,), np.int64)})
    np.testing.assert_allclose(np.asarray(fn(fn.params, x)), 15.0)


def test_onehot_out_of_range_is_all_off():
    """Indices outside [-depth, depth-1] produce all-off rows (no % wrap)."""
    fn = _single_op_fn("OneHot", 1, {"axis": proto.attr_i("axis", -1)},
                       inits={"depth": np.array(3, np.int64),
                              "values": np.array([0.0, 1.0], np.float32)})
    y = np.asarray(fn(fn.params, np.array([0, 3, -1, -4], np.int64)))
    np.testing.assert_array_equal(
        y, [[1, 0, 0], [0, 0, 0], [0, 0, 1], [0, 0, 0]])


def test_average_pool_ceil_mode():
    """ceil_mode=1 emits the last partial window (ORT: len-5 k2 s2 -> 3)."""
    x = np.arange(5, dtype=np.float32)[None, None, :]
    fn = _single_op_fn("AveragePool", 1, {
        "kernel_shape": proto.attr_ints("kernel_shape", [2]),
        "strides": proto.attr_ints("strides", [2]),
        "ceil_mode": proto.attr_i("ceil_mode", 1),
    })
    y = np.asarray(fn(fn.params, x))
    np.testing.assert_allclose(y[0, 0], [0.5, 2.5, 4.0])  # last window = mean([4])


def test_conv_transpose_output_shape_odd_padding_at_start():
    """With output_shape set and auto_pad NOTSET, the odd extra pad goes at
    the START (torch ConvTranspose1d semantics match for this case)."""
    import torch

    x = np.random.RandomState(0).randn(1, 2, 5).astype(np.float32)
    w = np.random.RandomState(1).randn(2, 3, 4).astype(np.float32)
    fn = _single_op_fn("ConvTranspose", 2, {
        "strides": proto.attr_ints("strides", [2]),
        "kernel_shape": proto.attr_ints("kernel_shape", [4]),
        "output_shape": proto.attr_ints("output_shape", [11]),
    })
    y = np.asarray(fn(fn.params, x, w))
    assert y.shape == (1, 3, 11)
    # torch reference: full (pads=0) output is len 12; total_padding = 1,
    # all of it at the start per the ONNX else-branch
    full = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    np.testing.assert_allclose(y, full[:, :, 1:], rtol=1e-5, atol=1e-5)


def test_consumed_missing_output_raises_clearly():
    """A node output that the graph consumes but the impl does not produce
    must raise NotImplementedError, not KeyError mid-trace."""
    g = proto.Graph(
        nodes=[
            proto.Node(op_type="MaxPool", inputs=["x"], outputs=["y0", "idx"],
                       attributes={"kernel_shape": proto.attr_ints("kernel_shape", [2]),
                                   "strides": proto.attr_ints("strides", [2])}),
            proto.Node(op_type="Cast", inputs=["idx"], outputs=["y"],
                       attributes={"to": proto.attr_i("to", 1)}),
        ],
        inputs=[proto.make_value_info("x", 1, [])],
        outputs=[proto.make_value_info("y", 1, [])],
    )
    fn = OnnxFunction(parse_model(proto.serialize_model(proto.Model(graph=g))))
    with pytest.raises(NotImplementedError, match="Indices|idx"):
        fn(fn.params, np.zeros((1, 1, 4), np.float32))


def test_serialize_external_tensor_requires_base_dir(tmp_path):
    """ADVICE r2: serialize_tensor must not resolve external sidecar files
    against the cwd — an unrelated same-named file there would silently
    embed wrong bytes. No base_dir -> clear error; the model's own dir ->
    correct bytes round-trip."""
    payload = np.arange(6, dtype=np.float32).reshape(2, 3)
    (tmp_path / "weights.bin").write_bytes(payload.tobytes())

    t = proto.Tensor(name="w", dims=[2, 3], data_type=1,
                     data_location=1,
                     external={"location": "weights.bin", "offset": 0,
                               "length": payload.nbytes})
    with pytest.raises(ValueError, match="base_dir"):
        proto.serialize_tensor(t)

    blob = proto.serialize_tensor(t, base_dir=str(tmp_path))
    rt = proto._parse_tensor(blob)
    np.testing.assert_array_equal(
        proto.tensor_to_numpy(rt), payload)


def test_serialize_model_resolves_external_data_against_model_dir(tmp_path):
    """serialize_model defaults base_dir to the loaded model's directory
    (Model._path), so re-emitting an external-data model from any cwd embeds
    the right bytes."""
    w = np.arange(4, dtype=np.float32).reshape(2, 2)
    (tmp_path / "w.bin").write_bytes(w.tobytes())
    g = proto.Graph(
        name="g",
        nodes=[proto.Node(op_type="Identity", inputs=["w"], outputs=["y"])],
        initializers=[proto.Tensor(
            name="w", dims=[2, 2], data_type=1, data_location=1,
            external={"location": "w.bin", "offset": 0, "length": w.nbytes})],
        inputs=[],
        outputs=[proto.make_value_info("y", 1, [2, 2])],
    )
    m = proto.Model(graph=g, ir_version=8, opset={"": 17})
    (tmp_path / "m.onnx").write_bytes(proto.serialize_model(
        m, base_dir=str(tmp_path)))
    loaded = proto.load_model(str(tmp_path / "m.onnx"))
    # loaded model now has raw_data inline; re-serialize from a different cwd
    blob2 = proto.serialize_model(loaded)
    m2 = proto.parse_model(blob2)
    np.testing.assert_array_equal(
        proto.tensor_to_numpy(m2.graph.initializers[0]), w)


def test_initializer_shape_input_compiles_under_jit():
    """torch.onnx.export with do_constant_folding=True stores Reshape/
    Expand target shapes as int64 INITIALIZERS; since params are threaded
    as jit arguments (to keep weights out of the HLO), those initializers
    arrive as tracers at shape-consuming inputs. static_input must fall
    back to the host-side numpy copy instead of raising 'data-dependent
    shape computation' (review r3)."""
    x = np.arange(12, dtype=np.float32).reshape(3, 4)

    fn = _single_op_fn("Reshape", 1,
                       inits={"shape": np.asarray([2, 6], np.int64)})
    out = jax.jit(fn)(fn.params, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out), x.reshape(2, 6))

    fn = _single_op_fn("Expand", 1,
                       inits={"shape": np.asarray([2, 3, 4], np.int64)})
    out = jax.jit(fn)(fn.params, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.broadcast_to(x, (2, 3, 4)))


def test_argmax_select_last_index():
    """ONNX: select_last_index=1 resolves ties to the LAST occurrence
    (jnp.argmax returns the first; review r3 found the attribute silently
    ignored)."""
    x = np.asarray([[3.0, 1.0, 3.0], [1.0, 2.0, 2.0]], np.float32)
    first = _single_op_fn(
        "ArgMax", 1, {"axis": proto.attr_i("axis", 1),
                      "keepdims": proto.attr_i("keepdims", 0)})
    last = _single_op_fn(
        "ArgMax", 1, {"axis": proto.attr_i("axis", 1),
                      "keepdims": proto.attr_i("keepdims", 0),
                      "select_last_index": proto.attr_i("select_last_index", 1)})
    np.testing.assert_array_equal(np.asarray(first(first.params, x)), [0, 1])
    np.testing.assert_array_equal(np.asarray(last(last.params, x)), [2, 2])


def test_typed_field_dtypes_uint32_uint64_double():
    """Spec-conformant typed-field storage: uint32 lives in uint64_data
    (it loaded as empty from int32_data and crashed on reshape); uint64
    values >= 2^63 must not be two's-complement-folded negative; float64
    in double_data must serialize (review r3)."""
    t32 = proto.Tensor()
    t32.name, t32.data_type, t32.dims = "u32", 12, [3]
    t32.uint64_data.extend([1, 2, 4_000_000_000])
    arr = proto.tensor_to_numpy(t32)
    assert arr.dtype == np.uint32
    np.testing.assert_array_equal(arr, np.array([1, 2, 4_000_000_000], np.uint32))

    t64 = proto.Tensor()
    t64.name, t64.data_type, t64.dims = "u64", 13, [2]
    t64.uint64_data.extend([2**64 - 1, 7])
    # round-trip through the wire format: the varint decoder must keep the
    # value unsigned
    blob = proto.serialize_tensor(t64)
    back = proto._parse_tensor(blob)
    arr = proto.tensor_to_numpy(back)
    assert arr.dtype == np.uint64
    np.testing.assert_array_equal(
        arr, np.array([2**64 - 1, 7], np.uint64))

    td = proto.Tensor()
    td.name, td.data_type, td.dims = "f64", 11, [2]
    td.double_data.extend([1.5, -2.25])
    blob = proto.serialize_tensor(td)  # used to raise 'no data payload'
    back = proto._parse_tensor(blob)
    np.testing.assert_array_equal(
        proto.tensor_to_numpy(back), np.array([1.5, -2.25], np.float64))


def test_onehot_keeps_values_dtype():
    """ONNX spec: OneHot output dtype = values dtype (an int64 OneHot fed
    float32 to integer consumers, review r3)."""
    g = proto.Graph(
        name="oh",
        nodes=[proto.Node(op_type="OneHot",
                          inputs=["idx", "depth", "vals"], outputs=["y"])],
        initializers=[
            proto.numpy_to_tensor("depth", np.array(4, np.int64)),
            proto.numpy_to_tensor("vals", np.array([0, 1], np.int64)),
        ],
        inputs=[proto.make_value_info("idx", 7, [3])],
        outputs=[proto.make_value_info("y", 7, [3, 4])],
    )
    m = proto.Model(ir_version=8, graph=g, opset={"": 17})
    fn = OnnxFunction(parse_model(proto.serialize_model(m)))
    y = np.asarray(fn(fn.params, np.array([0, 2, -1], np.int64)))
    # x64-disabled JAX canonicalizes int64 -> int32; the property under
    # test is that OneHot stays INTEGRAL (it returned float32 before)
    assert np.issubdtype(y.dtype, np.integer), y.dtype
    np.testing.assert_array_equal(
        y, np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.int64))
