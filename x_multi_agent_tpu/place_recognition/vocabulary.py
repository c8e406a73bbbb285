"""Binary visual vocabularies.

Replaces the vendored DBoW3 (reference ``third_party/DBow3``, used only for
``Vocabulary::transform`` / ``getWord`` at ``vlad.cpp:36-37``): the
vocabulary becomes a flat (W, 32) uint8 word-centroid table; quantization
is an on-device argmin over Hamming distances (at <=128 leaf words the
k-ary tree walk buys nothing — and flat argmin is the *exact* nearest
word, whereas the tree walk is approximate).

Includes:
  * a reader for the DBoW3 binary vocabulary format (magic 88877711233,
    QuickLZ-level-1-compressed node stream) so the reference's shipped
    thermal/visual vocabularies load directly — the QuickLZ decoder below
    is an independent implementation of the published level-1 format
  * k-majority training (Hamming k-means with bitwise-majority centroids)
    to build vocabularies from scratch
"""
from __future__ import annotations

import struct
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# QuickLZ level 1 decompression (format: header flags byte; bit0 =
# compressed, bit1 = long header; 32-bit control words, LSB-first; match
# tokens carry a 12-bit hash of the match source position, resolved against
# a hash table that the decoder rebuilds from its own output)
# ---------------------------------------------------------------------------

_BITLUT = [4, 0, 1, 0, 2, 0, 1, 0, 3, 0, 1, 0, 2, 0, 1, 0]


def _qlz_header(src: bytes):
    flags = src[0]
    if flags & 2:  # long header
        csize, dsize = struct.unpack_from("<II", src, 1)
        return flags, 9, csize, dsize
    csize, dsize = src[1], src[2]
    return flags, 3, csize, dsize


def _hash3(b0, b1, b2):
    fetch = b0 | (b1 << 8) | (b2 << 16)
    return ((fetch >> 12) ^ fetch) & 0xFFF


def qlz1_decompress(src: bytes) -> bytes:
    flags, hlen, csize, dsize = _qlz_header(src)
    if not (flags & 1):  # stored uncompressed
        return bytes(src[hlen : hlen + dsize])

    dst = bytearray(dsize)
    hash_table = [0] * 4096
    d = 0  # write position
    s = hlen
    cword = 1
    last_matchstart = dsize - 1 - 6 - 4  # UNCONDITIONAL_MATCHLEN + UNCOMPRESSED_END
    last_hashed = -1

    def update_hashes(upto):  # hash positions last_hashed+1 .. upto
        nonlocal last_hashed
        while last_hashed < upto:
            last_hashed += 1
            p = last_hashed
            hash_table[_hash3(dst[p], dst[p + 1], dst[p + 2])] = p

    while True:
        if cword == 1:
            cword = struct.unpack_from("<I", src, s)[0]
            s += 4
        if cword & 1:
            cword >>= 1
            fetch = src[s] | (src[s + 1] << 8) | (src[s + 2] << 16)
            h = (fetch >> 4) & 0xFFF
            pos = hash_table[h]
            if fetch & 0xF:
                matchlen = (fetch & 0xF) + 2
                s += 2
            else:
                matchlen = src[s + 2]
                s += 3
            for i in range(matchlen):  # overlapping copies are sequential
                dst[d + i] = dst[pos + i]
            d += matchlen
            update_hashes(d - matchlen)  # inclusive of the match start
            last_hashed = d - 1
        else:
            if d < last_matchstart:
                n = _BITLUT[cword & 0xF]
                dst[d : d + n] = src[s : s + n]
                cword >>= n
                d += n
                s += n
                update_hashes(d - 3)
            else:
                while d < dsize:
                    if cword == 1:
                        s += 4
                        cword = 1 << 31
                    dst[d] = src[s]
                    d += 1
                    s += 1
                    cword >>= 1
                return bytes(dst)


# ---------------------------------------------------------------------------
# DBoW3 binary vocabulary reader
# ---------------------------------------------------------------------------

_DBOW3_MAGIC = 88877711233


class Vocabulary(NamedTuple):
    words: np.ndarray  # (W, D) uint8 leaf-word centroids
    k: int = 0  # branching factor (informational)
    levels: int = 0

    @property
    def n_words(self) -> int:
        return self.words.shape[0]


def load_dbow3(path: str) -> Vocabulary:
    """Load a DBoW3 binary vocabulary (the reference's .yaml files in
    ``Vocabulary/`` are this binary format despite the extension)."""
    data = open(path, "rb").read()
    (sig,) = struct.unpack_from("<Q", data, 0)
    if sig != _DBOW3_MAGIC:
        raise ValueError(f"{path}: not a DBoW3 binary vocabulary")
    compressed = data[8]
    (nnodes,) = struct.unpack_from("<I", data, 9)
    off = 13
    if compressed:
        (nchunks,) = struct.unpack_from("<I", data, off)
        off += 4
        stream = bytearray()
        for _ in range(nchunks):
            _, hlen, csize, _ = _qlz_header(data[off : off + 9])
            stream += qlz1_decompress(data[off : off + csize])
            off += csize
        stream = bytes(stream)
    else:
        stream = data[off:]

    o = 0
    k, levels, _scoring, _weighting = struct.unpack_from("<iiii", stream, o)
    o += 16
    parents = np.zeros(nnodes, np.uint32)
    descs = [None] * nnodes
    for _ in range(nnodes - 1):
        nid, parent = struct.unpack_from("<II", stream, o)
        o += 8
        (_weight,) = struct.unpack_from("<d", stream, o)
        o += 8
        cols, rows, _type = struct.unpack_from("<iii", stream, o)
        o += 12
        descs[nid] = np.frombuffer(stream, np.uint8, cols, o).copy()
        o += cols
        parents[nid] = parent
    (n_words,) = struct.unpack_from("<I", stream, o)
    o += 4
    words = [None] * n_words
    for _ in range(n_words):
        wid, nid = struct.unpack_from("<II", stream, o)
        o += 8
        words[wid] = descs[nid]
    return Vocabulary(words=np.stack(words), k=k, levels=levels)


# ---------------------------------------------------------------------------
# training (k-majority) + on-device transform
# ---------------------------------------------------------------------------


def _popcount_np(x):
    return np.unpackbits(x, axis=-1).sum(-1)


def train_kmajority(
    descriptors: np.ndarray, n_words: int, n_iters: int = 10, seed: int = 0
) -> Vocabulary:
    """Hamming k-means with bitwise-majority centroids (host-side; replaces
    DBoW3's hierarchical k-medians training)."""
    rng = np.random.default_rng(seed)
    descs = np.asarray(descriptors, np.uint8)
    idx = rng.choice(len(descs), n_words, replace=False)
    cents = descs[idx].copy()
    for _ in range(n_iters):
        d = _popcount_np(descs[:, None, :] ^ cents[None, :, :])  # (N, W)
        assign = d.argmin(1)
        for w in range(n_words):
            members = descs[assign == w]
            if len(members):
                bits = np.unpackbits(members, axis=1)
                maj = (bits.mean(0) >= 0.5).astype(np.uint8)
                cents[w] = np.packbits(maj)
    return Vocabulary(words=cents)


def transform(words: jnp.ndarray, descriptors: jnp.ndarray) -> jnp.ndarray:
    """On-device nearest-word ids: (W, D) uint8 x (N, D) uint8 -> (N,).

    XOR + popcount reduction (reference ``Vocabulary::transform`` tree walk
    replaced by exact flat argmin)."""
    x = jnp.bitwise_xor(descriptors[:, None, :], words[None, :, :])
    d = jax.lax.population_count(x).astype(jnp.int32).sum(-1)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


class TreeVocabulary(NamedTuple):
    """Hierarchical k-ary vocabulary (DBoW3 ``Vocabulary::create``
    parity, ``third_party/DBow3/src/Vocabulary.cpp`` — branching factor k,
    depth L, trained by recursive k-majority clustering).

    Stored flat, breadth-first: ``nodes`` (T, 32) centroid per tree node,
    ``children`` (T, k) int32 child node ids (-1 none), ``word_id`` (T,)
    leaf word id (-1 for interior). ``words`` is the leaf table in word-id
    order — identical in role to the flat :class:`Vocabulary`, so
    everything downstream (VLAD, transform) is unchanged."""

    nodes: np.ndarray  # (T, 32) uint8
    children: np.ndarray  # (T, k) int32
    word_id: np.ndarray  # (T,) int32
    words: np.ndarray  # (W, 32) uint8

    @property
    def n_words(self) -> int:
        return int(self.words.shape[0])


def train_hierarchical(
    descriptors: np.ndarray, k: int = 10, depth: int = 3,
    n_iters: int = 10, seed: int = 0,
) -> TreeVocabulary:
    """Hierarchical k-majority training (DBoW3's HKmeansStep lineage:
    recursively cluster each node's member descriptors into k children
    until ``depth`` levels; leaves become words). For <=128 words the flat
    training is exact and preferred; this exists for the from-scratch
    LARGE-vocabulary story (k^depth words) where flat argmin at query
    time would be too wide and training all words jointly too slow."""
    rng = np.random.default_rng(seed)
    descs = np.asarray(descriptors, np.uint8)

    nodes = [np.zeros(32, np.uint8)]  # root (centroid unused)
    children: list = [[]]
    word_of: list = [-1]

    def cluster(member_idx: np.ndarray, level: int, node_id: int):
        if level == depth or len(member_idx) <= k:
            return  # node stays a leaf
        pts = descs[member_idx]
        kk = min(k, len(pts))
        sel = rng.choice(len(pts), kk, replace=False)
        cents = pts[sel].copy()
        assign = np.zeros(len(pts), np.int64)
        for _ in range(n_iters):
            d = _popcount_np(pts[:, None, :] ^ cents[None, :, :])
            assign = d.argmin(1)
            for c in range(kk):
                members = pts[assign == c]
                if len(members):
                    bits = np.unpackbits(members, axis=1)
                    cents[c] = np.packbits((bits.mean(0) >= 0.5).astype(np.uint8))
        for c in range(kk):
            cid = len(nodes)
            nodes.append(cents[c])
            children.append([])
            word_of.append(-1)
            children[node_id].append(cid)
            cluster(member_idx[assign == c], level + 1, cid)

    cluster(np.arange(len(descs)), 0, 0)

    # leaves -> word ids, breadth-first like DBoW3's createWords
    words = []
    for nid in range(len(nodes)):
        if not children[nid] and nid != 0:
            word_of[nid] = len(words)
            words.append(nodes[nid])
    ch = np.full((len(nodes), k), -1, np.int32)
    for nid, cs in enumerate(children):
        ch[nid, : len(cs)] = cs
    return TreeVocabulary(
        nodes=np.stack(nodes) if nodes else np.zeros((0, 32), np.uint8),
        children=ch,
        word_id=np.asarray(word_of, np.int32),
        words=np.stack(words) if words else np.zeros((0, 32), np.uint8),
    )


def transform_tree(voc: TreeVocabulary, descriptors: np.ndarray) -> np.ndarray:
    """DBoW3-style greedy tree-walk quantization (host-side oracle; the
    production on-device path uses flat :func:`transform` over
    ``voc.words``, which is exact — the tree walk is the approximate
    reference behavior, kept for parity checks)."""
    descs = np.asarray(descriptors, np.uint8)
    out = np.empty(len(descs), np.int32)
    for i, d0 in enumerate(descs):
        nid = 0
        while True:
            cs = voc.children[nid]
            cs = cs[cs >= 0]
            if len(cs) == 0:
                break
            dist = _popcount_np(voc.nodes[cs] ^ d0[None, :])
            nid = int(cs[dist.argmin()])
        out[i] = voc.word_id[nid]
    return out
