"""LoFTR coarse matcher: ONNX-graph interpreter (golden oracle since round 2).

The runtime model is models/loftr_native.py (hand-written forward, repo-owned
weights). This interpreter executes the reference's .onnx export op-by-op and
serves as the in-repo parity oracle for the native forward
(tests/test_loftr.py::TestGoldenParity); it is not on any runtime path.

The reference runs model/LoFTR_teacher.onnx through ONNX Runtime on CPU
(src/dnnfeaturematcher.cpp:50-74): inputs two [1,1,480,640] f32 images,
output a [1,1200,1200] coarse confidence matrix over 16px cells (ResNet-FPN
backbone, positional encoding, 4x(self+cross) linear-attention blocks, dual
softmax — graph census: 21 Conv, 65 MatMul, 16 Elu, 2 Softmax).

TPU design: instead of hand-porting layer by layer (and risking weight-mapping
bugs), the parsed ONNX graph is interpreted op-by-op into one jittable JAX
function — the weights come straight from the .onnx initializers and XLA
fuses the whole thing into a single TPU program. Shape-computation subgraphs
(Shape/Slice/Concat feeding Reshape) are evaluated on host with concrete
numpy ints at trace time, keeping the traced program fully static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.models.onnx_reader import OnnxGraph, load_graph

_REDUCE_OPS = {"ReduceSum": jnp.sum, "ReduceMean": jnp.mean}


def _is_host(v) -> bool:
    return isinstance(v, np.ndarray)


def _run_node(node, env, params):
    op = node.op_type
    ins = [env[i] if i in env else params[i] for i in node.inputs if i]

    def first_traced():
        for v in ins:
            if not _is_host(v):
                return True
        return False

    if op == "Constant":
        out = node.attrs.get("value")
        if out is None:
            out = np.asarray(node.attrs.get("value_float", 0.0), np.float32)
        return [np.asarray(out)]
    if op == "Shape":
        x = ins[0]
        return [np.asarray(x.shape, np.int64)]
    if op in ("Add", "Sub", "Mul", "Div", "Pow"):
        a, b = ins
        if _is_host(a) and _is_host(b):
            f = {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
                 "Div": np.divide, "Pow": np.power}[op]
            return [f(a, b)]
        f = {"Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
             "Div": jnp.divide, "Pow": jnp.power}[op]
        return [f(a, b)]
    if op == "Sqrt":
        return [np.sqrt(ins[0]) if _is_host(ins[0]) else jnp.sqrt(ins[0])]
    if op == "Relu":
        return [jnp.maximum(ins[0], 0.0)]
    if op == "Elu":
        alpha = node.attrs.get("alpha", 1.0) or 1.0
        x = ins[0]
        return [jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))]
    if op == "Cast":
        to = node.attrs.get("to", 1)
        dt = {1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 11: jnp.float64, 9: bool}.get(
            to, jnp.float32
        )
        x = ins[0]
        if _is_host(x):
            return [x.astype(np.dtype(dt) if dt is not bool else np.bool_)]
        return [x.astype(dt)]
    if op == "Concat":
        axis = node.attrs.get("axis", 0)
        if all(_is_host(v) for v in ins):
            return [np.concatenate(ins, axis=axis)]
        return [jnp.concatenate([jnp.asarray(v) for v in ins], axis=axis)]
    if op == "Split":
        axis = node.attrs.get("axis", 0)
        n_out = len(node.outputs)
        return list(jnp.split(ins[0], n_out, axis=axis))
    if op == "Reshape":
        x, shape = ins
        shape = np.asarray(shape).astype(np.int64).tolist()
        return [jnp.reshape(x, shape) if not _is_host(x) else x.reshape(shape)]
    if op == "Transpose":
        perm = node.attrs.get("perm")
        return [jnp.transpose(ins[0], perm)]
    if op in ("Squeeze", "Unsqueeze"):
        axes = node.attrs.get("axes")
        if axes is None and len(ins) > 1:
            axes = np.asarray(ins[1]).tolist()
        x = ins[0]
        if op == "Squeeze":
            return [jnp.squeeze(x, axis=tuple(axes)) if axes else jnp.squeeze(x)]
        out = x
        for a in sorted(axes):
            out = jnp.expand_dims(out, a) if not _is_host(out) else np.expand_dims(out, a)
        return [out]
    if op == "Slice":
        # opset-10+ style: data, starts, ends, axes, steps as inputs
        x = ins[0]
        starts = np.asarray(ins[1]).tolist()
        ends = np.asarray(ins[2]).tolist()
        axes = np.asarray(ins[3]).tolist() if len(ins) > 3 else list(range(len(starts)))
        steps = np.asarray(ins[4]).tolist() if len(ins) > 4 else [1] * len(starts)
        sl = [slice(None)] * x.ndim
        for s, e, a, st in zip(starts, ends, axes, steps):
            e = min(e, np.iinfo(np.int32).max)
            sl[a] = slice(s, e, st)
        return [x[tuple(sl)]]
    if op in _REDUCE_OPS:
        axes = node.attrs.get("axes")
        if axes is None and len(ins) > 1:
            axes = np.asarray(ins[1]).tolist()
        keep = bool(node.attrs.get("keepdims", 1))
        f = _REDUCE_OPS[op]
        ax = tuple(axes) if axes else None
        return [f(ins[0], axis=ax, keepdims=keep)]
    if op == "MatMul":
        a, b = (jnp.asarray(v) for v in ins)
        return [
            jnp.matmul(
                a, b, preferred_element_type=jnp.float32
            )
        ]
    if op == "Softmax":
        axis = node.attrs.get("axis", -1)
        return [jax.nn.softmax(ins[0], axis=axis)]
    if op == "Conv":
        x, w = jnp.asarray(ins[0]), jnp.asarray(ins[1])
        b = jnp.asarray(ins[2]) if len(ins) > 2 else None
        strides = node.attrs.get("strides") or [1, 1]
        pads = node.attrs.get("pads") or [0, 0, 0, 0]
        dil = node.attrs.get("dilations") or [1, 1]
        groups = node.attrs.get("group", 1) or 1
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=tuple(strides),
            padding=((pads[0], pads[2]), (pads[1], pads[3])),
            rhs_dilation=tuple(dil),
            feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if b is not None:
            out = out + b[None, :, None, None]
        return [out]
    raise NotImplementedError(f"ONNX op not supported: {op}")


def execute_graph(graph: OnnxGraph, params: dict, feeds: dict):
    """Run the graph; `feeds` maps input names to (traced) arrays."""
    env: dict = dict(feeds)
    for node in graph.nodes:
        outs = _run_node(node, env, params)
        for name, val in zip(node.outputs, outs):
            env[name] = val
    return [env[o] for o in graph.outputs]


class LoftrModel:
    """Loaded LoFTR_teacher graph with a jitted forward."""

    def __init__(self, onnx_path: str):
        self.graph = load_graph(onnx_path)
        # float weights flow through the jit boundary (traced); integer shape
        # tensors stay host-side numpy so Reshape targets remain static
        self.params = {
            k: jnp.asarray(v)
            for k, v in self.graph.initializers.items()
            if v.dtype in (np.float32, np.float16)
        }
        self._host_consts = {
            k: v
            for k, v in self.graph.initializers.items()
            if v.dtype not in (np.float32, np.float16)
        }

        @jax.jit
        def forward(params, img0, img1):
            merged = {**self._host_consts, **params}
            outs = execute_graph(self.graph, merged, {"img0": img0, "img1": img1})
            return outs[0]

        self._forward = forward

    def confidence(self, img0, img1):
        """img0/img1: [1,1,H,W] f32 in [0,1] -> [1, L, L] confidence."""
        return self._forward(self.params, img0, img1)


@functools.lru_cache(maxsize=1)
def default_model(path: str) -> LoftrModel:
    """Interpreter for an explicit .onnx path.

    Since round 2 the runtime model is models/loftr_native.py (repo-owned
    weights); this interpreter remains as the in-repo golden oracle the
    native forward is parity-tested against when an ONNX export is present.
    """
    return LoftrModel(path)
