"""Keyframe database + VLAD request-response policy.

Behavioral spec: reference ``src/x/place_recognition/database.cpp`` and
``keyframe.cpp``: ring of 15 keyframes; each stores a SimpleState-style
snapshot, its track descriptors and a VLAD vector, plus the set of peer
ids already served (``findCandidate`` answers each peer at most once per
keyframe, ``database.cpp:30-50``).

This is the "89% communication reduction" machinery (README.md:98-99):
a requester broadcasts only its small VLAD; a responder ships the heavy
keyframe payload only on a place-recognition hit (score > pr_score_thr).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..parallel.payload import AgentPayload
from .vlad import compute_vlad, vlad_score


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


class DbDims(NamedTuple):
    n_keyframes: int = 15  # ring size (database.h:68)
    n_words: int = 64  # vocabulary leaves
    max_agents: int = 8  # served-peer bitmap width


@_pytree_dataclass
class KeyframeDB:
    payload: AgentPayload  # stacked (R, ...)
    vlad: jnp.ndarray  # (R, W, 32) uint8
    served: jnp.ndarray  # (R, A) bool
    valid: jnp.ndarray  # (R,)
    wptr: jnp.ndarray  # int32 ring write pointer

    @staticmethod
    def zero(db_dims: DbDims, payload_proto: AgentPayload) -> "KeyframeDB":
        r = db_dims.n_keyframes
        stack = lambda x: jnp.broadcast_to(
            jnp.zeros_like(x), (r,) + x.shape
        )
        return KeyframeDB(
            payload=jax.tree.map(stack, payload_proto),
            vlad=jnp.zeros((r, db_dims.n_words, 32), jnp.uint8),
            served=jnp.zeros((r, db_dims.max_agents), bool),
            valid=jnp.zeros((r,), bool),
            wptr=jnp.asarray(0, jnp.int32),
        )


def add_keyframe(
    db_dims: DbDims, db: KeyframeDB, payload: AgentPayload, words: jnp.ndarray
) -> KeyframeDB:
    """Insert a keyframe (computes + stores its VLAD; FIFO ring,
    reference ``Database::addKeyframe``)."""
    r = db_dims.n_keyframes
    vlad = compute_vlad(words, payload.slam_desc, payload.slam_desc_valid)
    i = db.wptr
    new_payload = jax.tree.map(lambda b, x: b.at[i].set(x), db.payload, payload)
    return KeyframeDB(
        payload=new_payload,
        vlad=db.vlad.at[i].set(vlad),
        served=db.served.at[i].set(jnp.zeros((db_dims.max_agents,), bool)),
        valid=db.valid.at[i].set(True),
        wptr=(i + 1) % r,
    )


def find_candidate(
    db: KeyframeDB, uav_id, query_vlad: jnp.ndarray, score_thr: float
) -> Tuple[jnp.ndarray, jnp.ndarray, KeyframeDB]:
    """Best-scoring unserved keyframe above threshold; marks it served for
    this peer. Returns (keyframe index, found, new_db)."""
    best, found, _, db = find_candidate_scored(db, uav_id, query_vlad, score_thr)
    return best, found, db


def find_candidate_scored(
    db: KeyframeDB, uav_id, query_vlad: jnp.ndarray, score_thr: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, KeyframeDB]:
    """:func:`find_candidate` that also returns the winning VLAD score
    (used by requesters for top-K peer selection, CollabConfig.top_k_peers)."""
    scores = jax.vmap(lambda v: vlad_score(query_vlad, v))(db.vlad)
    eligible = db.valid & ~db.served[:, uav_id]
    scores = jnp.where(eligible, scores, -1.0)
    best = jnp.argmax(scores)
    found = scores[best] > score_thr
    served = db.served.at[best, uav_id].set(db.served[best, uav_id] | found)
    return (
        best.astype(jnp.int32),
        found,
        scores[best],
        dataclasses.replace(db, served=served),
    )


def get_keyframe(db: KeyframeDB, idx) -> AgentPayload:
    return jax.tree.map(lambda x: x[idx], db.payload)
