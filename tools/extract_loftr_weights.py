"""One-time extraction of LoFTR_teacher weights into a repo-owned checkpoint.

Reads the reference's ONNX asset (model/LoFTR_teacher.onnx, consumed by
src/dnnfeaturematcher.cpp:50-74) through the in-repo protobuf reader and maps
its initializers/constants onto the structured pytree consumed by
`models/loftr_native.py`. After this runs once, the framework no longer needs
the .onnx file or the reference mount — the npz ships with the repo
(0.8 MB of float32).

Weight-name map (ONNX initializer -> role) derived from the node trace:
the backbone is conv1(7x7/2) + 4 residual stages (1->8->16->32->32 channels,
/16 resolution) + a bias-free 1x1 outconv; the coarse transformer is 4
LoFTREncoderLayers applied [self, cross, self, cross] to both feature sets.
The exporter duplicated each layer's weights per application (feat0/feat1
copies verified bit-equal), so only the first copy is kept.

Usage: python tools/extract_loftr_weights.py [onnx_path] [out_npz]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from mono_slam_framework_tpu.models.onnx_reader import load_graph  # noqa: E402

# backbone: (key, weight_init, bias_init or None)
_BACKBONE = [
    ("conv1", "1028", "1029"),
    ("layer1/block0/conv1", "1031", "1032"),
    ("layer1/block0/conv2", "1034", "1035"),
    ("layer1/block1/conv1", "1037", "1038"),
    ("layer1/block1/conv2", "1040", "1041"),
    ("layer2/block0/conv1", "1043", "1044"),
    ("layer2/block0/conv2", "1046", "1047"),
    ("layer2/block0/down", "1049", "1050"),
    ("layer2/block1/conv1", "1052", "1053"),
    ("layer2/block1/conv2", "1055", "1056"),
    ("layer3/block0/conv1", "1058", "1059"),
    ("layer3/block0/conv2", "1061", "1062"),
    ("layer3/block0/down", "1064", "1065"),
    ("layer3/block1/conv1", "1067", "1068"),
    ("layer3/block1/conv2", "1070", "1071"),
    ("layer4/block0/conv1", "1073", "1074"),
    ("layer4/block0/conv2", "1076", "1077"),
    ("layer4/block0/down", "1079", "1080"),
    ("layer4/block1/conv1", "1082", "1083"),
    ("layer4/block1/conv2", "1085", "1086"),
    ("outconv", "backbone.layer4_outconv.weight", None),
]

# coarse transformer layers: (wq, wk, wv, merge, mlp0, mlp1); the duplicated
# second-application copies (e.g. 1100-1112 for layer 0) are verified equal.
_COARSE = [
    ("1087", "1088", "1089", "1097", "1098", "1099"),
    ("1113", "1114", "1115", "1123", "1124", "1125"),
    ("1139", "1140", "1141", "1149", "1150", "1151"),
    ("1165", "1166", "1167", "1175", "1176", "1177"),
]
_COARSE_DUP = [
    ("1100", "1101", "1102", "1110", "1111", "1112"),
    ("1126", "1127", "1128", "1136", "1137", "1138"),
    ("1152", "1153", "1154", "1162", "1163", "1164"),
    ("1178", "1179", "1180", "1188", "1189", "1190"),
]


def extract(onnx_path: str) -> dict[str, np.ndarray]:
    g = load_graph(onnx_path)
    init = g.initializers
    out: dict[str, np.ndarray] = {}
    for key, w, b in _BACKBONE:
        out[f"backbone/{key}/w"] = init[w].astype(np.float32)
        if b is not None:
            out[f"backbone/{key}/b"] = init[b].astype(np.float32)
    for i, (names, dup) in enumerate(zip(_COARSE, _COARSE_DUP)):
        for role, w, w2 in zip(("wq", "wk", "wv", "merge", "mlp0", "mlp1"), names, dup):
            assert np.array_equal(init[w], init[w2]), f"layer {i} {role} copies differ"
            out[f"coarse/{i}/{role}"] = init[w].astype(np.float32)
        for n in ("norm1", "norm2"):
            out[f"coarse/{i}/{n}_w"] = init[f"loftr_coarse.layers.{i}.{n}.weight"]
            out[f"coarse/{i}/{n}_b"] = init[f"loftr_coarse.layers.{i}.{n}.bias"]
    # positional-encoding table (graph Constant feeding the post-split Add);
    # equals the exp(-2k)-frequency sine table loftr_native regenerates, kept
    # for bit-exactness at the native 480x640 operating point.
    for n in g.nodes:
        if n.op_type == "Constant" and n.outputs[0] == "248":
            out["posenc"] = np.asarray(n.attrs["value"])[0].astype(np.float32)
            break
    assert "posenc" in out, "positional encoding constant not found"
    return out


def main() -> None:
    onnx_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/model/LoFTR_teacher.onnx"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "mono_slam_framework_tpu/models/weights/loftr_teacher.npz"
    )
    params = extract(onnx_path)
    np.savez_compressed(out_path, **params)
    total = sum(v.size * v.itemsize for v in params.values())
    print(f"wrote {out_path}: {len(params)} arrays, {total / 1e6:.2f} MB raw")


if __name__ == "__main__":
    main()
