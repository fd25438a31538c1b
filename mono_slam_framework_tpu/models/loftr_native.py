"""Native JAX LoFTR coarse matcher — the framework-owned DNN model.

Replaces the round-1 ONNX graph interpreter (models/loftr.py, kept as the
in-repo golden oracle) with a hand-written forward whose weights live in the
repo checkpoint `models/weights/loftr_teacher.npz` (extracted once by
tools/extract_loftr_weights.py from the reference asset consumed at
src/dnnfeaturematcher.cpp:50-74). The framework no longer needs the
reference mount or any ONNX machinery at runtime.

Architecture (decoded from the exported graph, golden-tested to 1e-4):

* backbone: conv7x7/2 then 4 residual stages (1->8->8 /2, ->16 /4, ->32 /8,
  ->32 /16) and a bias-free 1x1 outconv -> [B, C=32] coarse features on a
  /16 grid (30x40 for the native 480x640 input -> L=1200 tokens).
* positional encoding: interleaved sine table, frequency exp(-2k) for
  channel group k, positions 1-indexed (regenerated for any grid; bit-equal
  to the exported 480x640 table).
* coarse transformer: 4 LoFTREncoderLayers applied ['self','cross','self',
  'cross'] with *sequential* cross semantics — feat0 updates first, feat1
  attends to the updated feat0. Single-head linear attention with elu+1
  feature maps, V pre-scaled by 1/L and the message rescaled by L, eps 1e-6;
  merge -> LayerNorm(eps 1e-7) -> MLP(2C->2C->C, bias-free) on
  concat(x, message) -> LayerNorm -> residual.
* head: features /sqrt(C), similarity /0.1 temperature, dual softmax.

TPU-first split: `encode` (backbone+posenc) is per-image and cacheable —
frame features are computed once and reused across every pairwise match;
`confidence_from_features` is the pairwise transformer+head, vmappable over
a stack of stored keyframe features so a keyframe-database scan is ONE
batched device program (KeyFrameDatabase.cc:31/63 O(N) loop replaced).
"""

from __future__ import annotations

import functools
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

C = 32  # coarse feature dim
ATTN_EPS = 1e-6
LN_EPS = 1e-7
TEMPERATURE = 0.1

_WEIGHTS_PATH = pathlib.Path(__file__).parent / "weights" / "loftr_teacher.npz"


def load_params(path: str | pathlib.Path | None = None) -> dict:
    """Load the flat {name: array} parameter dict from the repo checkpoint."""
    with np.load(path or _WEIGHTS_PATH) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def positional_encoding(h: int, w: int, c: int = C) -> jnp.ndarray:
    """Interleaved sine table [c, h, w]; group-k frequency exp(-2k), 1-indexed.

    Matches the exported 480x640 table to float32 rounding (verified in
    tests); regenerating keeps the model resolution-independent.
    """
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    f = np.exp(-2.0 * np.arange(c // 4, dtype=np.float32))[:, None, None]
    pe = np.zeros((c, h, w), np.float32)
    pe[0::4] = np.sin(x[None] * f)
    pe[1::4] = np.cos(x[None] * f)
    pe[2::4] = np.sin(y[None] * f)
    pe[3::4] = np.cos(y[None] * f)
    return jnp.asarray(pe)


def _conv(x, w, b=None, stride=1, pad=None):
    kh, kw = w.shape[2], w.shape[3]
    if pad is None:
        pad = (kh // 2, kw // 2)
    with jax.default_matmul_precision("bfloat16"):
        # learned-weight conv: bf16 MXU passes are the DNN fast path and
        # well inside the model's tolerance; the package-level f32 default
        # (see __init__) protects geometry math, not this backbone
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _block(p, prefix, x, stride=1):
    """Residual basic block; `down` 1x1 projection present iff stride 2."""
    y = jax.nn.relu(_conv(x, p[f"{prefix}/conv1/w"], p[f"{prefix}/conv1/b"], stride))
    y = _conv(y, p[f"{prefix}/conv2/w"], p[f"{prefix}/conv2/b"])
    if f"{prefix}/down/w" in p:
        x = _conv(x, p[f"{prefix}/down/w"], p[f"{prefix}/down/b"], stride, pad=(0, 0))
    return jax.nn.relu(x + y)


def _backbone_trunk(params: dict, img: jnp.ndarray):
    """Shared trunk: returns (coarse [B,C,H/16,W/16], fine [B,16,H/4,W/4]).

    The /4 layer2 activation doubles as a training-free FINE feature map for
    subpixel match refinement (`fine_refine`) — the exported teacher is
    coarse-only (dnnfeaturematcher.cpp decodes 16 px cells), so this is an
    optional quality extension, not a reference behavior."""
    x = jax.nn.relu(_conv(img, params["backbone/conv1/w"], params["backbone/conv1/b"], 2))
    x = _block(params, "backbone/layer1/block0", x)
    x = _block(params, "backbone/layer1/block1", x)
    x = _block(params, "backbone/layer2/block0", x, 2)
    x = _block(params, "backbone/layer2/block1", x)
    fine = x
    x = _block(params, "backbone/layer3/block0", x, 2)
    x = _block(params, "backbone/layer3/block1", x)
    x = _block(params, "backbone/layer4/block0", x, 2)
    x = _block(params, "backbone/layer4/block1", x)
    return _conv(x, params["backbone/outconv/w"], pad=(0, 0)), fine


def backbone(params: dict, img: jnp.ndarray) -> jnp.ndarray:
    """[B,1,H,W] float in [0,1] -> [B,C,H/16,W/16] coarse feature map."""
    return _backbone_trunk(params, img)[0]


@jax.jit
def encode(params: dict, img: jnp.ndarray) -> jnp.ndarray:
    """Backbone + positional encoding, flattened: [B,1,H,W] -> [B, L, C].

    Row-major over (y, x), matching the matcher's cell decode
    (dnnfeaturematcher.cpp:75-100: x = cell % grid_w, y = cell // grid_w).
    Jitted: one XLA program for the whole ~50-op backbone (shapes are fixed
    per resolution, so a single compilation covers every frame).
    """
    fmap = backbone(params, img)
    b, c, h, w = fmap.shape
    fmap = fmap + positional_encoding(h, w, c)[None]
    return fmap.reshape(b, c, h * w).transpose(0, 2, 1)


def _layernorm(x, w, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc / jnp.sqrt(var + LN_EPS)) * w + b


def encoder_layer(lp: dict, x: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """One LoFTREncoderLayer (single-head linear attention), [B,L,C] each."""
    v_len = source.shape[1]
    with jax.default_matmul_precision("bfloat16"):  # learned-weight fast path
        q = jax.nn.elu(x @ lp["wq"]) + 1.0
        k = jax.nn.elu(source @ lp["wk"]) + 1.0
        v = (source @ lp["wv"]) / v_len
        kv = jnp.einsum("bld,blv->bdv", k, v)  # [B,C,C]
        z = 1.0 / (jnp.einsum("bld,bd->bl", q, jnp.sum(k, axis=1)) + ATTN_EPS)
        msg = jnp.einsum("bld,bdv->blv", q, kv) * z[..., None] * float(v_len)
        msg = _layernorm(msg @ lp["merge"], lp["norm1_w"], lp["norm1_b"])
        m = (
            jax.nn.relu(jnp.concatenate([x, msg], axis=-1) @ lp["mlp0"])
            @ lp["mlp1"]
        )
    return x + _layernorm(m, lp["norm2_w"], lp["norm2_b"])


_LAYER_NAMES = ("self", "cross", "self", "cross")


def coarse_transformer(params: dict, f0: jnp.ndarray, f1: jnp.ndarray):
    """4x [self, cross] with sequential cross updates (original LoFTR order:
    feat0 updates first, feat1 attends to the *updated* feat0)."""
    for i, name in enumerate(_LAYER_NAMES):
        lp = {k.rsplit("/", 1)[1]: v for k, v in params.items() if k.startswith(f"coarse/{i}/")}
        if name == "self":
            f0 = encoder_layer(lp, f0, f0)
            f1 = encoder_layer(lp, f1, f1)
        else:
            f0 = encoder_layer(lp, f0, f1)
            f1 = encoder_layer(lp, f1, f0)
    return f0, f1


def confidence_from_features(params: dict, f0: jnp.ndarray, f1: jnp.ndarray) -> jnp.ndarray:
    """Pairwise transformer + dual-softmax head: [B,L,C] x2 -> [B,L,L]."""
    f0, f1 = coarse_transformer(params, f0, f1)
    scale = 1.0 / np.sqrt(float(C))
    with jax.default_matmul_precision("bfloat16"):  # learned-feature sim
        sim = jnp.einsum("blc,bsc->bls", f0 * scale, f1 * scale) / TEMPERATURE
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


@jax.jit
def loftr_confidence(params: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Full forward, [1,1,H,W] x2 -> [1,L,L] confidence (ONNX-output twin).

    Both images run the backbone as one batch of 2 (the exported graph's
    Concat/Split), keeping the conv work a single MXU-friendly program.
    """
    feats = encode(params, jnp.concatenate([img0, img1], axis=0))
    return confidence_from_features(params, feats[0:1], feats[1:2])


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_features_topk(params, f0, f1, max_matches: int):
    """Pairwise match + flat top-k decode: returns (vals, flat_idx) [B,K].

    flat_idx = cell0 * L + cell1 over the [L, L] confidence matrix. Used by
    both the single-pair matcher and the vmapped database scan.
    """
    conf = confidence_from_features(params, f0, f1)
    b, l0, l1 = conf.shape
    flat = conf.reshape(b, l0 * l1)
    if jax.default_backend() == "tpu":
        vals, idx = jax.lax.approx_max_k(flat, max_matches)
    else:
        vals, idx = jax.lax.top_k(flat, max_matches)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_one_against_many(params, f_query, f_stack, max_matches: int):
    """One query's features vs a stack of stored features, one device program.

    f_query [1,L,C], f_stack [N,L,C] -> (vals [N,K], idx [N,K]). The
    reference scans its keyframe database serially (KeyFrameDatabase.cc:31,
    63-70 — N full forwards); here the pairwise transformer is vmapped over
    the stack so relocalization/loop-detection with the DNN matcher costs one
    batched XLA call.
    """
    def one(f_other):
        return match_features_topk(params, f_query, f_other[None], max_matches)

    vals, idx = jax.vmap(one)(f_stack)
    return vals[:, 0], idx[:, 0]


@jax.jit
def encode_with_fine(params: dict, img: jnp.ndarray):
    """encode() + the /4 fine feature map: [B,1,H,W] -> ([B,L,C], [B,16,H/4,W/4])."""
    fmap, fine = _backbone_trunk(params, img)
    b, c, h, w = fmap.shape
    fmap = fmap + positional_encoding(h, w, c)[None]
    return fmap.reshape(b, c, h * w).transpose(0, 2, 1), fine


@functools.partial(jax.jit, static_argnames=("grid_w", "window"))
def fine_refine(
    fine0,  # [F,H4,W4] /4 features of image 0
    fine1,  # [F,H4,W4] /4 features of image 1
    cell0,  # i32 [K] flat cell ids (row-major /16 grid) in image 0
    cell1,  # i32 [K] flat cell ids in image 1
    grid_w: int = 40,
    window: int = 5,
):
    """Training-free subpixel refinement of coarse cell matches.

    Correlates the /4 backbone descriptor at each image-0 cell corner against
    a window x window /4-texel neighborhood around the image-1 cell corner
    and takes the correlation soft-argmax. Returns the refined image-1 match
    offsets [K,2] in MODEL pixels (add to the 16*cell corner decode); offsets
    stay within the coarse cell (window=5 -> +-2 texels = +-8 px).
    """
    F, H4, W4 = fine0.shape
    r = window // 2
    y0 = (cell0 // grid_w) * 4
    x0 = (cell0 % grid_w) * 4
    y1 = (cell1 // grid_w) * 4
    x1 = (cell1 % grid_w) * 4

    d0 = fine0[:, jnp.clip(y0, 0, H4 - 1), jnp.clip(x0, 0, W4 - 1)].T  # [K,F]
    d0 = d0 / (jnp.linalg.norm(d0, axis=-1, keepdims=True) + 1e-6)

    off = jnp.arange(-r, r + 1)
    dy, dx = jnp.meshgrid(off, off, indexing="ij")  # [w,w]
    dy = dy.ravel()
    dx = dx.ravel()  # [w*w]
    ys = jnp.clip(y1[:, None] + dy[None, :], 0, H4 - 1)  # [K,w*w]
    xs = jnp.clip(x1[:, None] + dx[None, :], 0, W4 - 1)
    patches = fine1[:, ys, xs].transpose(1, 2, 0)  # [K,w*w,F]
    patches = patches / (
        jnp.linalg.norm(patches, axis=-1, keepdims=True) + 1e-6
    )
    with jax.default_matmul_precision("bfloat16"):  # learned-feature corr
        scores = jnp.einsum("kf,kwf->kw", d0, patches)  # [K,w*w] in [-1,1]
    w_soft = jax.nn.softmax(scores / 0.1, axis=-1)
    ox = jnp.sum(w_soft * dx[None, :].astype(jnp.float32), axis=-1)
    oy = jnp.sum(w_soft * dy[None, :].astype(jnp.float32), axis=-1)
    return jnp.stack([ox, oy], axis=-1) * 4.0  # /4 texels -> model pixels
