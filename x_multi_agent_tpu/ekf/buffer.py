"""IMU-rate ring buffer ops (behavioral spec: reference
``ekf/state_buffer.h``, ``src/x/ekf/state_buffer.cpp``).

The buffer is a stacked :class:`CoreState` pytree with cyclic ``head``.
All ops are fixed-shape; invalid slots carry time < 0 (reference kInvalid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import CoreState

INVALID_IDX = jnp.int32(-1)


def get_slot(buffer: CoreState, idx) -> CoreState:
    """Read one ring slot as an unstacked CoreState."""
    return jax.tree.map(lambda x: x[idx], buffer)


def set_slot(buffer: CoreState, idx, core: CoreState) -> CoreState:
    """Write one ring slot."""
    return jax.tree.map(lambda b, c: b.at[idx].set(c), buffer, core)


def closest_idx(times: jnp.ndarray, t, time_margin) -> jnp.ndarray:
    """Ring index of the valid state closest in time to ``t``.

    Mirrors ``StateBuffer::closestIdx`` (``state_buffer.cpp:26-63``):
    measurements more than ``time_margin`` outside the covered range return
    INVALID_IDX and the update is dropped.
    """
    valid = times >= 0
    dt = jnp.where(valid, jnp.abs(times - t), jnp.inf)
    idx = jnp.argmin(dt)
    ok = dt[idx] <= time_margin
    # also allow interior matches: any valid state within margin counts;
    # interior timestamps always have a neighbor within one IMU period.
    return jnp.where(ok, idx.astype(jnp.int32), INVALID_IDX)


def ring_range(start, length: int, buffer_size: int) -> jnp.ndarray:
    """Indices of the ``length`` ring slots after ``start`` (static length)."""
    return (start + 1 + jnp.arange(length, dtype=jnp.int32)) % buffer_size


def steps_between(from_idx, to_idx, buffer_size: int) -> jnp.ndarray:
    """Number of ring steps from ``from_idx`` forward to ``to_idx``."""
    return (to_idx - from_idx) % buffer_size
