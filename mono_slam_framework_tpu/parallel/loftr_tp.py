"""Tensor-parallel LoFTR: the coarse transformer sharded over a device mesh.

The reference's DNN matcher is a single-threaded CPU ONNX session
(src/dnnfeaturematcher.cpp:50-74); this module is its multi-chip scaling
surface. The token (sequence) dimension L is sharded over the mesh axis —
each device owns L/n tokens of BOTH feature sets and the collectives ride
ICI:

* linear attention is TP-friendly by construction: the only cross-token
  reductions are KV = sum_l k_l v_l^T ([C,C]) and Ksum = sum_l k_l ([C]) —
  both become one `psum` of a tiny partial per layer; queries then produce
  their messages purely locally.
* the dual-softmax head gathers the (small, [L,32]) opposite feature block
  with `all_gather`, computes the local [L/n, L] similarity slab, applies the
  row softmax locally and the column softmax via `pmax`/`psum` partials.

The confidence output stays sharded on rows — callers that only need top-k
matches can reduce per shard before gathering.

Correctness is pinned against the single-device forward in
tests/test_parallel.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mono_slam_framework_tpu.models import loftr_native

_AXIS = "data"


def _layer_tp(lp: dict, x, source, axis: str):
    """One LoFTREncoderLayer on token-sharded [B, Lloc, C] blocks."""
    n = jax.lax.psum(1, axis)
    v_len = source.shape[1] * n  # global token count
    q = jax.nn.elu(x @ lp["wq"]) + 1.0
    k = jax.nn.elu(source @ lp["wk"]) + 1.0
    v = (source @ lp["wv"]) / v_len
    kv = jax.lax.psum(jnp.einsum("bld,blv->bdv", k, v), axis)
    ksum = jax.lax.psum(jnp.sum(k, axis=1), axis)
    z = 1.0 / (jnp.einsum("bld,bd->bl", q, ksum) + loftr_native.ATTN_EPS)
    msg = jnp.einsum("bld,bdv->blv", q, kv) * z[..., None] * float(v_len)
    msg = loftr_native._layernorm(msg @ lp["merge"], lp["norm1_w"], lp["norm1_b"])
    m = jax.nn.relu(jnp.concatenate([x, msg], axis=-1) @ lp["mlp0"]) @ lp["mlp1"]
    return x + loftr_native._layernorm(m, lp["norm2_w"], lp["norm2_b"])


def _confidence_tp(params: dict, f0, f1, axis: str):
    """Sharded transformer + dual softmax; returns row-sharded [B, Lloc, L]."""
    for i, name in enumerate(loftr_native._LAYER_NAMES):
        lp = {
            k.rsplit("/", 1)[1]: v
            for k, v in params.items()
            if k.startswith(f"coarse/{i}/")
        }
        if name == "self":
            f0 = _layer_tp(lp, f0, f0, axis)
            f1 = _layer_tp(lp, f1, f1, axis)
        else:  # sequential cross (original LoFTR order)
            f0 = _layer_tp(lp, f0, f1, axis)
            f1 = _layer_tp(lp, f1, f0, axis)
    scale = 1.0 / np.sqrt(float(loftr_native.C))
    f1_full = jax.lax.all_gather(f1, axis, axis=1, tiled=True)  # [B, L, C]
    sim = jnp.einsum("blc,bsc->bls", f0 * scale, f1_full * scale)
    sim = sim / loftr_native.TEMPERATURE  # [B, Lloc, L]
    # softmax over columns (image-1 cells) is row-local
    s_cols = jax.nn.softmax(sim, axis=2)
    # softmax over rows (image-0 cells) spans shards: global max + sum partials
    row_max = jax.lax.pmax(jnp.max(sim, axis=1), axis)  # [B, L]
    e = jnp.exp(sim - row_max[:, None, :])
    denom = jax.lax.psum(jnp.sum(e, axis=1), axis)  # [B, L]
    s_rows = e / denom[:, None, :]
    return s_rows * s_cols


@functools.lru_cache(maxsize=4)
def _build(mesh: Mesh, axis: str):
    fn = jax.shard_map(
        functools.partial(_confidence_tp, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None),
    )
    return jax.jit(fn)


def loftr_tp_confidence(mesh: Mesh, params: dict, f0, f1, axis: str = _AXIS):
    """Token-sharded confidence: f0/f1 [B, L, C] -> [B, L, L].

    L must be divisible by the mesh size (1200 = 8 x 150 on the test mesh).
    `params` is replicated (0.65 MB); activations and the L x L matrix are
    sharded on the token axis.
    """
    return _build(mesh, axis)(params, f0, f1)
