"""onnx2bcnn tests: ONNX models built with the same public-schema subset
(field numbers are the upstream wire contract), converted, loaded by the
framework, and cross-validated numerically against torch forward passes
with identical weights — torch is the independent implementation of the
ONNX op semantics here (no onnx/onnxruntime in the image).

The reference never implemented its declared ONNX format
(bcnn_net.c:1485-1558 errors out), so this converter is beyond-parity.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)

torch = pytest.importorskip("torch")


def _pb():
    from onnx2bcnn import _load_proto_module

    return _load_proto_module()


def make_model(pb, input_shape, nodes, inits, output_name):
    m = pb.ModelProto()
    m.ir_version = 8
    m.producer_name = "test"
    op = m.opset_import.add()
    op.version = 13
    g = m.graph
    g.name = "g"
    inp = g.input.add()
    inp.name = "input"
    tt = inp.type.tensor_type
    tt.elem_type = 1
    for d in input_shape:
        tt.shape.dim.add().dim_value = d
    g.output.add().name = output_name
    for name, arr in inits.items():
        t = g.initializer.add()
        t.name = name
        t.data_type = 1 if arr.dtype == np.float32 else 7
        t.dims.extend(arr.shape)
        t.raw_data = arr.tobytes()
    for op_type, inputs, outputs, attrs in nodes:
        n = g.node.add()
        n.op_type = op_type
        n.input.extend(inputs)
        n.output.extend(outputs)
        for k, v in attrs.items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, bool) or isinstance(v, int):
                a.i = int(v)
                a.type = 2
            elif isinstance(v, float):
                a.f = v
                a.type = 1
            elif isinstance(v, bytes):
                a.s = v
                a.type = 3
            elif isinstance(v, (list, tuple)) and v and isinstance(
                v[0], float
            ):
                a.floats.extend(v)
                a.type = 6
            elif isinstance(v, (list, tuple)):
                a.ints.extend(int(x) for x in v)
                a.type = 7
            else:
                raise TypeError(type(v))
    return m


def run_converted(model_bytes, tmp_path, x, out_tensor=None):
    from onnx2bcnn import convert

    onnx_path = tmp_path / "m.onnx"
    onnx_path.write_bytes(model_bytes)
    conf = str(tmp_path / "m.conf")
    weights = str(tmp_path / "m.bcnnmodel")
    convert(str(onnx_path), conf, weights)

    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net

    net = Net(Mode.PREDICT)
    load_net(net, conf, weights)
    sess = Session(net, 0).compile_net()
    if out_tensor is None:
        from bcnn_tpu.types import LayerType

        last = [n for n in net.nodes if n.type != LayerType.COST][-1]
        out_tensor = net.tensors[last.dst[0]].name
    (out,), _ = sess.predict_on_batch(x, outputs=[out_tensor])
    return np.asarray(out), net


def test_onnx_classif_chain_matches_torch(tmp_path):
    """Conv+BN+Relu+MaxPool+Conv+LeakyRelu(0.1)+Flatten+Gemm+Softmax:
    converted graph must reproduce torch's forward with the same weights
    (BN eps folded exactly — stored var compensates bcnn's 1e-6)."""
    pb = _pb()
    rng = np.random.RandomState(3)
    W1 = rng.randn(4, 3, 3, 3).astype(np.float32) * 0.5
    B1 = rng.randn(4).astype(np.float32)
    bn_s = (rng.rand(4).astype(np.float32) + 0.5)
    bn_b = rng.randn(4).astype(np.float32)
    bn_m = rng.randn(4).astype(np.float32)
    bn_v = (rng.rand(4).astype(np.float32) + 0.2)
    W2 = rng.randn(6, 4, 3, 3).astype(np.float32) * 0.3
    B2 = rng.randn(6).astype(np.float32)
    FW = rng.randn(5, 6 * 4 * 4).astype(np.float32) * 0.1
    FB = rng.randn(5).astype(np.float32)

    m = make_model(
        pb, (1, 3, 8, 8),
        nodes=[
            ("Conv", ["input", "W1", "B1"], ["c1"],
             {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
              "strides": [1, 1]}),
            ("BatchNormalization",
             ["c1", "bn_s", "bn_b", "bn_m", "bn_v"], ["b1"],
             {"epsilon": 1e-3}),
            ("Relu", ["b1"], ["r1"], {}),
            ("MaxPool", ["r1"], ["p1"],
             {"kernel_shape": [2, 2], "strides": [2, 2]}),
            ("Conv", ["p1", "W2", "B2"], ["c2"],
             {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
              "strides": [1, 1]}),
            ("LeakyRelu", ["c2"], ["l2"], {"alpha": 0.1}),
            ("Flatten", ["l2"], ["fl"], {"axis": 1}),
            ("Gemm", ["fl", "FW", "FB"], ["fc"], {"transB": 1}),
            ("Softmax", ["fc"], ["prob"], {"axis": 1}),
        ],
        inits={"W1": W1, "B1": B1, "bn_s": bn_s, "bn_b": bn_b,
               "bn_m": bn_m, "bn_v": bn_v, "W2": W2, "B2": B2,
               "FW": FW, "FB": FB},
        output_name="prob",
    )

    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    got, net = run_converted(m.SerializeToString(), tmp_path, x)
    assert net.bn_folded  # PREDICT load folds the standalone BN

    tm = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3, padding=1),
        torch.nn.BatchNorm2d(4, eps=1e-3),
        torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Conv2d(4, 6, 3, padding=1),
        torch.nn.LeakyReLU(0.1),
        torch.nn.Flatten(),
        torch.nn.Linear(6 * 4 * 4, 5),
        torch.nn.Softmax(dim=1),
    ).eval()
    with torch.no_grad():
        tm[0].weight.copy_(torch.from_numpy(W1))
        tm[0].bias.copy_(torch.from_numpy(B1))
        tm[1].weight.copy_(torch.from_numpy(bn_s))
        tm[1].bias.copy_(torch.from_numpy(bn_b))
        tm[1].running_mean.copy_(torch.from_numpy(bn_m))
        tm[1].running_var.copy_(torch.from_numpy(bn_v))
        tm[4].weight.copy_(torch.from_numpy(W2))
        tm[4].bias.copy_(torch.from_numpy(B2))
        tm[7].weight.copy_(torch.from_numpy(FW))
        tm[7].bias.copy_(torch.from_numpy(FB))
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-4, atol=1e-5)


def test_onnx_depthwise_residual_matches_torch(tmp_path):
    """Depthwise Conv (group=C) + residual Add + GlobalAveragePool +
    Gemm — eltwise and dw mappings cross-checked against torch."""
    pb = _pb()
    rng = np.random.RandomState(4)
    C = 3
    DW = rng.randn(C, 1, 3, 3).astype(np.float32) * 0.5
    DB = rng.randn(C).astype(np.float32)
    FW = rng.randn(4, C).astype(np.float32)
    FB = rng.randn(4).astype(np.float32)

    m = make_model(
        pb, (2, C, 6, 6),
        nodes=[
            ("Conv", ["input", "DW", "DB"], ["d1"],
             {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
              "strides": [1, 1], "group": C}),
            ("Add", ["d1", "input"], ["a1"], {}),
            ("GlobalAveragePool", ["a1"], ["g1"], {}),
            ("Flatten", ["g1"], ["fl"], {"axis": 1}),
            ("Gemm", ["fl", "FW", "FB"], ["fc"], {"transB": 1}),
        ],
        inits={"DW": DW, "DB": DB, "FW": FW, "FB": FB},
        output_name="fc",
    )
    x = rng.randn(2, C, 6, 6).astype(np.float32)
    got, _ = run_converted(m.SerializeToString(), tmp_path, x)

    conv = torch.nn.Conv2d(C, C, 3, padding=1, groups=C)
    fc = torch.nn.Linear(C, 4)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(DW))
        conv.bias.copy_(torch.from_numpy(DB))
        fc.weight.copy_(torch.from_numpy(FW))
        fc.bias.copy_(torch.from_numpy(FB))
        t = torch.from_numpy(x)
        want = fc((conv(t) + t).mean(dim=(2, 3))).numpy()
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-4, atol=1e-5)


def test_onnx_deconv_prelu_upsample_matches_torch(tmp_path):
    """ConvTranspose + PRelu (per-channel slopes) + Upsample(nearest x2):
    deconv blob layout (C_in, C_out, k, k) maps verbatim."""
    pb = _pb()
    rng = np.random.RandomState(5)
    TW = rng.randn(3, 4, 3, 3).astype(np.float32) * 0.4  # (Cin, Cout, k, k)
    TB = rng.randn(4).astype(np.float32)
    slopes = (rng.rand(4).astype(np.float32) * 0.5)

    m = make_model(
        pb, (1, 3, 5, 5),
        nodes=[
            ("ConvTranspose", ["input", "TW", "TB"], ["u1"],
             {"kernel_shape": [3, 3], "strides": [2, 2],
              "pads": [1, 1, 1, 1]}),
            ("PRelu", ["u1", "slopes"], ["p1"], {}),
            ("Upsample", ["p1"], ["up"],
             {"mode": b"nearest",
              "scales": [1.0, 1.0, 2.0, 2.0]}),  # opset-7 attr style
        ],
        inits={"TW": TW, "TB": TB, "slopes": slopes},
        output_name="up",
    )
    x = rng.randn(1, 3, 5, 5).astype(np.float32)
    got, _ = run_converted(m.SerializeToString(), tmp_path, x,
                           out_tensor=None)

    deconv = torch.nn.ConvTranspose2d(3, 4, 3, stride=2, padding=1)
    prelu = torch.nn.PReLU(4)
    with torch.no_grad():
        deconv.weight.copy_(torch.from_numpy(TW))
        deconv.bias.copy_(torch.from_numpy(TB))
        prelu.weight.copy_(torch.from_numpy(slopes))
        y = prelu(deconv(torch.from_numpy(x)))
        want = torch.nn.functional.interpolate(y, scale_factor=2,
                                               mode="nearest").numpy()
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-4, atol=1e-5)


def test_onnx_unsupported_op_raises(tmp_path):
    pb = _pb()
    m = make_model(
        pb, (1, 3, 4, 4),
        nodes=[("InstanceNormalization", ["input"], ["y"], {})],
        inits={},
        output_name="y",
    )
    from onnx2bcnn import convert

    p = tmp_path / "bad.onnx"
    p.write_bytes(m.SerializeToString())
    with pytest.raises(NotImplementedError, match="InstanceNormalization"):
        convert(str(p), str(tmp_path / "o.conf"), str(tmp_path / "o.model"))
