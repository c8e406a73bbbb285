"""Probe Mosaic DMA/lane constraints for the LK window gather on real TPU.

Q1: does an HBM->VMEM DMA with dynamic sublane start and (p, 128) shape
    (dynamic lane start) compile+run?
Q2: if the lane start must be static/aligned: DMA (p, 256) from a
    128-aligned base, then dynamic pltpu.roll on the lane axis to bring
    the window to lane 0 — does dynamic roll work?
Q3: full composite: per-feature window extract matches numpy.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 24  # sublane rows per slab


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[OK]   {name}: {np.asarray(out).ravel()[:4]}")
        return np.asarray(out)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


H, W = 256, 512
img = jnp.asarray(np.arange(H * W, dtype=np.float32).reshape(H, W))


# ---- Q1: dynamic lane start, 128-wide DMA
def k_q1(off_ref, img_hbm, out_ref, slab, sem):
    by = off_ref[0]
    bx = off_ref[1]
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(by, P), pl.ds(bx, 128)], slab, sem
    )
    cp.start()
    cp.wait()
    out_ref[:] = slab[:]


def q1():
    off = jnp.asarray([37, 53], jnp.int32)
    return pl.pallas_call(
        k_q1,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(off, img)


r1 = probe("Q1 dyn-lane-start (p,128) DMA", q1)
if r1 is not None:
    want = np.asarray(img)[37 : 37 + P, 53 : 53 + 128]
    print("     Q1 matches:", np.array_equal(r1, want))


# ---- Q1b: dynamic lane start, 22-wide DMA (the original failing case?)
def k_q1b(off_ref, img_hbm, out_ref, slab, sem):
    by = off_ref[0]
    bx = off_ref[1]
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(by, P), pl.ds(bx, 22)], slab, sem
    )
    cp.start()
    cp.wait()
    out_ref[:] = slab[:]


def q1b():
    off = jnp.asarray([37, 53], jnp.int32)
    return pl.pallas_call(
        k_q1b,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 22), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P, 22), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(off, img)


r1b = probe("Q1b dyn-lane-start (p,22) DMA", q1b)
if r1b is not None:
    want = np.asarray(img)[37 : 37 + P, 53 : 53 + 22]
    print("     Q1b matches:", np.array_equal(r1b, want))


# ---- Q2: dynamic roll on lane axis of a (P, 256) vmem block
def k_q2(off_ref, img_hbm, out_ref, slab, sem):
    by = off_ref[0]
    bx_al = off_ref[1]  # 128-aligned base
    rem = off_ref[2]
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(by, P), pl.ds(bx_al, 256)], slab, sem
    )
    cp.start()
    cp.wait()
    rolled = pltpu.roll(slab[:], -rem, axis=1)
    out_ref[:] = rolled[:, :128]


def q2():
    off = jnp.asarray([37, 0, 53], jnp.int32)
    return pl.pallas_call(
        k_q2,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P, 256), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(off, img)


r2 = probe("Q2 aligned (p,256) DMA + dyn roll", q2)
if r2 is not None:
    want = np.asarray(img)[37 : 37 + P, 53 : 53 + 128]
    print("     Q2 matches:", np.array_equal(r2, want))


# ---- Q3: 3D scratch slab (FB, P, 128) with per-feature DMA, dyn sublane
FB = 8


def k_q3(off_ref, img_hbm, out_ref, slab, sems):
    cps = []
    for f in range(FB):
        by = off_ref[f, 0]
        bx = off_ref[f, 1]
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.ds(by, P), pl.ds(bx, 128)], slab.at[f], sems.at[f]
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    out_ref[:] = slab[:]


def q3():
    off = jnp.asarray([[i * 7 + 1, i * 13 + 5] for i in range(FB)], jnp.int32)
    return pl.pallas_call(
        k_q3,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FB, P, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FB, P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((FB,)),
        ],
    )(off, img)


r3 = probe("Q3 (FB,P,128) per-feature DMAs", q3)
if r3 is not None:
    want = np.stack(
        [np.asarray(img)[i * 7 + 1 : i * 7 + 1 + P, i * 13 + 5 : i * 13 + 5 + 128] for i in range(FB)]
    )
    print("     Q3 matches:", np.array_equal(r3, want))
