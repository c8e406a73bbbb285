"""Pallas TPU kernel: fused FAST-9/16 corner score + threshold + 3x3 NMS.

Behavioral spec: reference ``cv::FAST`` with nonmaxSuppression inside
``Tracker::featureDetection`` (``tracker.cpp:432-449``). Numerically
equivalent to ``fast.nms3(fast.fast_score(img, thr))`` (oracle-tested in
tests/test_pallas_vision.py).

Why a hand kernel: the jnp formulation builds 16 rolled copies of the
image plus 2x16 arc-min chains; XLA materializes several full-image
temporaries in HBM. This kernel streams the image once: each grid step
DMAs one (TILE_H + 8)-row strip (4-row halo: 3 for the Bresenham circle,
1 for NMS) into VMEM and does the entire segment test, scoring,
thresholding and non-max suppression in-register before writing the
(TILE_H, W) score block. HBM traffic = 1 read + 1 write of the image.

The 16 circle taps are static row-slices of the strip (dy in [-3,3])
combined with lane rolls (dx in [-3,3]); the 9-arc minima use a
log-depth min tree (16*4 mins instead of 16*8). All VPU work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC, CIRCLE

_HALO = 4  # 3 (circle radius) + 1 (NMS window)


def _roll_x(arr: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Shift so output[x] = arr[x + dx] (wrap; wrapped columns are masked
    out by the interior mask downstream)."""
    if dx == 0:
        return arr
    return pltpu.roll(arr, (-dx) % arr.shape[1], axis=1)


def _score_strip(s, i, *, tile_h: int, h: int, w: int, threshold: float,
                 nms: bool):
    """FAST score + threshold + NMS of one VMEM strip ``s`` whose row 0 is
    image row ``i*tile_h - HALO``. Returns the (tile_h, W) score block."""
    dtype = s.dtype
    rows = tile_h + 2  # score rows: strip rows [3, tile_h+5) (+-1 NMS halo)

    # center block and the 16 circle taps (output[y] = strip[y+3+dy] etc.)
    center = s[3 : 3 + rows, :]
    d = []
    row_cache = {}
    for dy, dx in CIRCLE:
        if dy not in row_cache:
            row_cache[dy] = s[3 + dy : 3 + dy + rows, :]
        d.append(_roll_x(row_cache[dy], dx) - center)

    def arc_scores(diffs):
        # min over every 9-long circular arc, log-depth
        m2 = [jnp.minimum(diffs[k], diffs[(k + 1) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m8[k], diffs[(k + 8) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    assert ARC == 9
    score = jnp.maximum(arc_scores(d), arc_scores([-x for x in d]))
    score = jnp.where(score > threshold, score, jnp.zeros_like(score))

    # interior mask in ORIGINAL image coordinates (3 px border scores 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + (i * tile_h - 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    interior = (gy >= 3) & (gy < h - 3) & (gx >= 3) & (gx < w - 3)
    score = jnp.where(interior, score, jnp.zeros_like(score))

    if nms:
        neigh = None
        for dy in range(3):
            row = score[dy : dy + tile_h, :]
            for dx in (-1, 0, 1):
                v = _roll_x(row, dx)
                neigh = v if neigh is None else jnp.maximum(neigh, v)
        centre = score[1 : 1 + tile_h, :]
        out = jnp.where(centre >= neigh, centre, jnp.zeros_like(centre))
    else:
        out = score[1 : 1 + tile_h, :]
    return out.astype(dtype)


def _fast_kernel(
    img_hbm, out_ref, strip, sem, *, tile_h: int, h: int, w: int,
    threshold: float, nms: bool
):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * _HALO)], strip, sem
    )
    cp.start()
    cp.wait()
    out_ref[:] = _score_strip(
        strip[:], i, tile_h=tile_h, h=h, w=w, threshold=threshold, nms=nms
    )


def _fast_kernel_batch(
    img_hbm, out_ref, strip, sem, *, tile_h: int, h: int, w: int,
    threshold: float, nms: bool, n_blocks: int,
):
    """Batched variant: grid (A, n_blocks), double-buffered strip DMA."""
    a = pl.program_id(0)
    i = pl.program_id(1)
    n_a = pl.num_programs(0)

    def start_fetch(slot, aa, ii):
        return pltpu.make_async_copy(
            img_hbm.at[aa, pl.ds(ii * tile_h, tile_h + 2 * _HALO)],
            strip.at[slot], sem.at[slot],
        )

    @pl.when((a == 0) & (i == 0))
    def _():
        start_fetch(0, 0, 0).start()

    # prefetch the next strip (possibly the next agent's first strip)
    two = jnp.int32(2)
    nb = jnp.int32(n_blocks)
    slot = jax.lax.rem(a * nb + i, two)
    nxt = a * nb + i + 1

    @pl.when(nxt < n_a * n_blocks)
    def _():
        start_fetch(1 - slot, nxt // nb, jax.lax.rem(nxt, nb)).start()

    start_fetch(slot, a, i).wait()
    out_ref[0] = _score_strip(
        strip[slot], i, tile_h=tile_h, h=h, w=w, threshold=threshold, nms=nms
    )


@functools.partial(
    jax.jit, static_argnames=("threshold", "nms", "tile_h", "interpret")
)
def fast_score_nms(
    img: jnp.ndarray,
    threshold: float,
    nms: bool = True,
    tile_h: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused FAST score (+ optional 3x3 NMS) of a (H, W) image.

    Returns the (H, W) score map (0 where not a corner / suppressed),
    identical to ``fast.nms3(fast.fast_score(img, threshold))``.
    """
    h, w = img.shape
    if not jnp.issubdtype(img.dtype, jnp.floating):
        img = img.astype(jnp.float32)
    dtype = img.dtype

    h_pad = -(-h // tile_h) * tile_h
    w_pad = max(-(-w // 128) * 128, 128)
    grid = h_pad // tile_h
    padded = jnp.zeros((h_pad + 2 * _HALO, w_pad), dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (_HALO, 0))

    kernel = functools.partial(
        _fast_kernel, tile_h=tile_h, h=h, w=w,
        threshold=float(threshold), nms=nms,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_h, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, w_pad), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return out[:h, :w]


@functools.partial(
    jax.jit, static_argnames=("threshold", "nms", "tile_h", "interpret")
)
def fast_score_nms_batch(
    imgs: jnp.ndarray,
    threshold: float,
    nms: bool = True,
    tile_h: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched :func:`fast_score_nms` over a leading agent axis.

    One kernel, grid (A, row_blocks), double-buffered strip DMA — the
    agent batch is part of the grid (NOT a vmap of per-agent kernels), so
    per-strip DMA latency overlaps compute across the whole batch.
    """
    a, h, w = imgs.shape
    if not jnp.issubdtype(imgs.dtype, jnp.floating):
        imgs = imgs.astype(jnp.float32)
    dtype = imgs.dtype

    h_pad = -(-h // tile_h) * tile_h
    w_pad = max(-(-w // 128) * 128, 128)
    n_blocks = h_pad // tile_h
    padded = jnp.zeros((a, h_pad + 2 * _HALO, w_pad), dtype)
    padded = jax.lax.dynamic_update_slice(padded, imgs, (0, _HALO, 0))

    kernel = functools.partial(
        _fast_kernel_batch, tile_h=tile_h, h=h, w=w,
        threshold=float(threshold), nms=nms, n_blocks=n_blocks,
    )
    out = pl.pallas_call(
        kernel,
        grid=(a, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_pad), lambda aa, i: (aa, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((a, h_pad, w_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * _HALO, w_pad), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return out[:, :h, :w]
