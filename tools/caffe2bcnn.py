"""caffe2bcnn: convert a Caffe prototxt + caffemodel into a bcnn .conf and
weight blob.

Port of tools/caffe_converter/caffe2bcnn.cpp (op mapping preserved):
  Convolution -> [conv] (filters/size/stride/pad/num_groups, bias then
                 weights blobs; zero bias when bias_term is false)
  InnerProduct -> [connected]
  Pooling      -> [maxpool]
  ReLU / PReLU -> [activation] (PReLU slopes written to the blob)
  Softmax      -> [softmax]
  Dropout      -> [dropout]
  Concat       -> [concat] (channel axis only)
  BatchNorm    -> [batchnorm]: scales of ones, mean/var rescaled by the
                 1/blobs[2] scale factor when present, eps folded into the
                 variance, zero biases — exactly the reference's fold
                 (caffe2bcnn.cpp:120-156)
  Input        -> input_width/height/channels in [net]

The emitted .conf uses bcnn's named src=/dst= dialect (the reference
emitted `{conv}`-style section markers, which its own parser does not
read back — we emit the parseable `[conv]` form). The weight blob is the
.bcnnmodel format (magic + version + per-layer blobs in graph order) so
`bcnn_tpu.config.load_net(conf, model)` loads it directly.

Usage: python tools/caffe2bcnn.py <prototxt> <caffemodel> <out.conf> <out.bcnnmodel>
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))


def _load_proto_module():
    """Compile the subset schema with protoc on first use."""
    gen = os.path.join(_TOOLS, "proto", "caffe_subset_pb2.py")
    if not os.path.exists(gen):
        subprocess.run(
            [
                "protoc",
                f"--python_out={os.path.join(_TOOLS, 'proto')}",
                f"--proto_path={os.path.join(_TOOLS, 'proto')}",
                "caffe_subset.proto",
            ],
            check=True,
        )
    sys.path.insert(0, os.path.join(_TOOLS, "proto"))
    import caffe_subset_pb2  # noqa: E402

    return caffe_subset_pb2


def convert(prototxt: str, caffemodel: str, out_conf: str, out_model: str):
    pb = _load_proto_module()
    from google.protobuf import text_format

    proto = pb.NetParameter()
    with open(prototxt) as f:
        text_format.Parse(f.read(), proto)
    weights = pb.NetParameter()
    with open(caffemodel, "rb") as f:
        weights.ParseFromString(f.read())

    blobs_by_name = {l.name: l for l in weights.layer}

    conf_lines = ["[net]"]
    blob_parts = []  # raw float32 arrays in bcnn load order

    # network input
    if proto.input and (proto.input_shape or proto.input_dim):
        if proto.input_shape:
            dims = list(proto.input_shape[0].dim)
        else:
            dims = list(proto.input_dim[:4])
        if len(dims) == 4:
            conf_lines += [
                f"input_width={dims[3]}",
                f"input_height={dims[2]}",
                f"input_channels={dims[1]}",
                f"batch_size={dims[0]}",
            ]

    def src_dst(layer):
        lines = []
        if layer.bottom:
            lines.append("src=" + ",".join(layer.bottom))
        if layer.top:
            lines.append("dst=" + ",".join(layer.top))
        return lines

    for layer in proto.layer:
        t = layer.type
        bin_layer = blobs_by_name.get(layer.name)

        def blob(i):
            return np.asarray(bin_layer.blobs[i].data, np.float32)

        if t == "Input":
            shp = list(layer.input_param.shape[0].dim)
            conf_lines += [
                f"input_width={shp[3]}",
                f"input_height={shp[2]}",
                f"input_channels={shp[1]}",
                f"batch_size={shp[0]}",
            ]
            continue
        if t == "Convolution":
            cp = layer.convolution_param
            conf_lines.append("")
            conf_lines.append("[conv]")
            conf_lines.append(f"filters={cp.num_output}")
            conf_lines.append(
                f"size={cp.kernel_size[0] if cp.kernel_size else 3}"
            )
            conf_lines.append(f"stride={cp.stride[0] if cp.stride else 1}")
            conf_lines.append(f"pad={cp.pad[0] if cp.pad else 0}")
            conf_lines.append(f"num_groups={cp.group}")
            conf_lines += src_dst(layer)
            if cp.bias_term and len(bin_layer.blobs) > 1:
                blob_parts.append(blob(1))
            else:
                blob_parts.append(np.zeros(cp.num_output, np.float32))
            blob_parts.append(blob(0))  # (O,I,k,k) flat — bcnn order
        elif t == "InnerProduct":
            ip = layer.inner_product_param
            conf_lines += ["", "[connected]", f"output={ip.num_output}"]
            conf_lines += src_dst(layer)
            if ip.bias_term and len(bin_layer.blobs) > 1:
                blob_parts.append(blob(1))
            else:
                blob_parts.append(np.zeros(ip.num_output, np.float32))
            blob_parts.append(blob(0))  # (out, in) flat — bcnn order
        elif t == "Pooling":
            pp = layer.pooling_param
            conf_lines += [
                "",
                "[maxpool]",
                f"size={pp.kernel_size}",
                f"stride={pp.stride}",
                "padding_type=caffe",
            ]
            conf_lines += src_dst(layer)
        elif t == "ReLU":
            conf_lines += ["", "[activation]", "function=relu"]
            if layer.bottom:
                conf_lines.append(f"src={layer.bottom[0]}")
        elif t == "PReLU":
            conf_lines += ["", "[activation]", "function=prelu"]
            if layer.bottom:
                conf_lines.append(f"src={layer.bottom[0]}")
            blob_parts.append(blob(0))
        elif t == "Softmax":
            conf_lines += ["", "[softmax]"]
            conf_lines += src_dst(layer)
        elif t == "Dropout":
            ratio = layer.dropout_param.dropout_ratio
            conf_lines += ["", "[dropout]", f"rate={ratio:f}"]
            if layer.bottom:
                conf_lines.append(f"src={layer.bottom[0]}")
        elif t == "Concat":
            if layer.concat_param.axis not in (0, 1):
                print(
                    "[WARNING] only channel concat supported", file=sys.stderr
                )
            conf_lines += ["", "[concat]"]
            conf_lines += src_dst(layer)
        elif t == "BatchNorm":
            conf_lines += ["", "[batchnorm]"]
            conf_lines += src_dst(layer)
            mean = blob(0)
            var = blob(1)
            eps = layer.batch_norm_param.eps
            if len(bin_layer.blobs) >= 3:
                sf = bin_layer.blobs[2].data[0]
                scale_factor = 1.0 / sf if sf else 0.0
                mean = mean * scale_factor
                var = var * scale_factor
            # bcnn load order for [batchnorm]: mean, var, scales, biases
            blob_parts.append(mean)
            blob_parts.append(var + eps)
            blob_parts.append(np.ones_like(mean))
            blob_parts.append(np.zeros_like(mean))
        elif t in ("Scale",):
            # Caffe BatchNorm+Scale pairs: fold gamma/beta into the
            # preceding [batchnorm]'s scales/biases
            gamma = blob(0)
            beta = (
                blob(1)
                if len(bin_layer.blobs) > 1
                else np.zeros_like(gamma)
            )
            # replace the ones/zeros written by the BatchNorm branch
            blob_parts[-2] = gamma
            blob_parts[-1] = beta
        else:
            print(f"[WARNING] skipping layer type {t}", file=sys.stderr)

    with open(out_conf, "w") as f:
        f.write("\n".join(conf_lines) + "\n")
    with open(out_model, "wb") as f:
        f.write(b"BCNN")
        f.write(struct.pack("<3I", 0, 2, 0))
        for part in blob_parts:
            part.astype(np.float32).tofile(f)
    print(
        f"wrote {out_conf} + {out_model} "
        f"({sum(p.size for p in blob_parts)} floats)"
    )


if __name__ == "__main__":
    if len(sys.argv) < 5:
        print(
            "Usage: caffe2bcnn.py <prototxt> <caffemodel> "
            "<out.conf> <out.bcnnmodel>"
        )
        sys.exit(1)
    convert(*sys.argv[1:5])
