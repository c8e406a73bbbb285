"""Binary VLAD descriptors (behavioral spec: reference
``src/x/place_recognition/vlad.cpp``).

computeVLAD (``vlad.cpp:40-67``): per descriptor, find the nearest
vocabulary word; XOR the descriptor with the word centroid; OR-aggregate
the residuals per cluster -> a (W, 32) uint8 matrix.
computeScore (``vlad.cpp:69-76``): normalized Hamming similarity
(v_length - popcount(x XOR y)) / v_length.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .vocabulary import transform


def compute_vlad(
    words: jnp.ndarray,  # (W, 32) uint8
    descriptors: jnp.ndarray,  # (N, 32) uint8
    valid: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """-> (W, 32) uint8 VLAD."""
    w = words.shape[0]
    ids = transform(words, descriptors)  # (N,)
    resid = jnp.bitwise_xor(descriptors, words[ids])  # (N, 32)
    resid = jnp.where(valid[:, None], resid, jnp.zeros_like(resid))
    onehot = (ids[:, None] == jnp.arange(w)[None, :]) & valid[:, None]  # (N, W)
    # OR-aggregate per cluster: max over member residual bits == bitwise OR
    expanded = jnp.where(onehot[:, :, None], resid[:, None, :], 0)
    return jax.lax.reduce(
        expanded, jnp.asarray(0, jnp.uint8), jax.lax.bitwise_or, (0,)
    )


def vlad_score(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Normalized Hamming similarity in [0, 1]."""
    v_length = x.shape[0] * x.shape[1] * 8
    ham = jax.lax.population_count(jnp.bitwise_xor(x, y)).astype(jnp.int32).sum()
    return (v_length - ham).astype(jnp.float32) / v_length
