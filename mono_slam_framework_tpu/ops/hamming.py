"""Brute-force Hamming matching as an MXU matmul.

TPU-native replacement for cv::DescriptorMatcher "BruteForce-Hamming"
knnMatch(k=2) + Lowe ratio test (reference matcher, src/featurematcher.cpp:27-42).

hamming(a, b) = |a| + |b| - 2 a.b for 0/1 bit vectors, so the full K1 x K2
distance matrix is one [K1,256] @ [256,K2] matmul (f32 accumulate -> exact
integers) — the systolic array does in microseconds what the reference's CPU
loop does per frame pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BITS = 256


def unpack_bits(packed):
    """uint32 [K, 8] -> f32 [K, 256] of {0,1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], N_BITS).astype(jnp.float32)


def distance_matrix(desc1, desc2, valid1, valid2):
    """Pairwise Hamming distances. desc uint32 [K,8]; invalid -> +inf."""
    b1 = unpack_bits(desc1)
    b2 = unpack_bits(desc2)
    n1 = jnp.sum(b1, axis=1)
    n2 = jnp.sum(b2, axis=1)
    # bf16 operands are exact for 0/1 bits and keep the MXU in its fast path;
    # accumulation stays f32 so counts up to 256 are exact.
    dot = jax.lax.dot_general(
        b1.astype(jnp.bfloat16),
        b2.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = n1[:, None] + n2[None, :] - 2.0 * dot
    inf = jnp.asarray(jnp.inf, d.dtype)
    d = jnp.where(valid1[:, None] & valid2[None, :], d, inf)
    return d


def knn2_ratio_match(d, ratio):
    """Per-row 2-NN with Lowe ratio test (strict '<', featurematcher.cpp:32).

    Args:
      d: [K1, K2] distance matrix (+inf for invalid pairs).
      ratio: accept when best < ratio * second-best.

    Returns:
      (idx2 i32 [K1], ok bool [K1]) — best train index per query and whether
      the ratio test passed.

    Implementation: two masked min-reductions instead of top_k — a sort of
    every [K2] row costs tens of ms on TPU; two VPU reductions are free.
    """
    idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(d.shape[1])
    d2 = jnp.where(cols[None, :] == idx[:, None], jnp.inf, d)
    second = jnp.min(d2, axis=1)
    ok = jnp.isfinite(best) & (best < ratio * second)
    return idx.astype(jnp.int32), ok
