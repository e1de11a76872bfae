"""Prototype: per-keypoint window-DMA schemes head-to-head.

P0 = the shipping pattern: static grid over capacity blocks, 2-slot
double buffer, per-DMA wait, @pl.when per DMA (count-gated).
P1 = dynamic-trip design: grid=(1,), internal fori_loop over the LIVE
block count only, NBUF-slot ring, ONE whole-slot semaphore wait per
block (all of a slot's DMAs share one semaphore; the wait descriptor's
dst is the whole slot, so its byte count equals the sum of the block's
copies), clamped tail indices instead of per-DMA branches.

Workload: DMA [rows,128] f32 windows from a slab at scattered origins,
write each window's row-sum vector out.  Checks P0 == P1 numerically,
then times both at K=5000 capacity / ~1080 live.
"""

import sys

sys.path.insert(0, ".")

from sift_tpu.perf.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.perf.timing import measure_ms

LANES = 128
SUBLANE = 8


# ---------------- P0: shipping pattern ----------------

def _p0_kernel(cnt_ref, ys_ref, xs_ref, src_ref, out_ref, wins, sems, *,
               rows, block_k, n_kpts):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def start(slot, block):
        for j in range(block_k):
            k = block * block_k + j

            @pl.when(k < cnt_ref[0])
            def _(k=k, j=j):
                kc = jnp.minimum(k, n_kpts - 1)
                ys = pl.multiple_of(ys_ref[kc], SUBLANE)
                xs = pl.multiple_of(xs_ref[kc], LANES)
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(ys, rows), pl.ds(xs, LANES)],
                    wins.at[slot, j], sems.at[slot, j]).start()

    def wait(slot, block):
        for j in range(block_k):
            k = block * block_k + j

            @pl.when(k < cnt_ref[0])
            def _(k=k, j=j):
                kc = jnp.minimum(k, n_kpts - 1)
                ys = pl.multiple_of(ys_ref[kc], SUBLANE)
                xs = pl.multiple_of(xs_ref[kc], LANES)
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(ys, rows), pl.ds(xs, LANES)],
                    wins.at[slot, j], sems.at[slot, j]).wait()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < nb)
    def _():
        start((i + 1) % 2, i + 1)

    wait(i % 2, i)
    for j in range(block_k):
        @pl.when(i * block_k + j < cnt_ref[0])
        def _(j=j):
            out_ref[j, :] = jnp.sum(wins[i % 2, j], axis=0)


def p0(slab, ys0, xs0, rows, count, block_k=8):
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    cnt = jnp.minimum(count, kp).astype(jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // block_k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_k, LANES), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, block_k)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p0_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp),
        out_shape=jax.ShapeDtypeStruct((kp, LANES), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cnt, ys0, xs0, slab)[:k]


# ---------------- P0b: P0 + blocked par input ----------------

def _p0b_kernel(cnt_ref, ys_ref, xs_ref, par_ref, src_ref, out_ref,
                wins, sems, *, rows, block_k, n_kpts):
    _p0_kernel(cnt_ref, ys_ref, xs_ref, src_ref, out_ref, wins, sems,
               rows=rows, block_k=block_k, n_kpts=n_kpts)
    i = pl.program_id(0)

    @pl.when(i * block_k < cnt_ref[0])
    def _():
        out_ref[0, :] = out_ref[0, :] + par_ref[0, 0]


def p0b(slab, ys0, xs0, par, rows, count, block_k=8):
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    cnt = jnp.minimum(count, kp).astype(jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // block_k,),
        in_specs=[
            pl.BlockSpec((block_k, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_k, LANES), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, block_k)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p0b_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp),
        out_shape=jax.ShapeDtypeStruct((kp, LANES), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cnt, ys0, xs0, par, slab)[:k]


# ---------------- P1: dynamic-trip, slot-wait ----------------

def _p1_kernel(cnt_ref, ys_ref, xs_ref, src_ref, out_ref, wins, sems, *,
               rows, block_k, n_kpts, nbuf):
    nblocks = (cnt_ref[0] + block_k - 1) // block_k

    def start(slot, block):
        base = block * block_k
        for j in range(block_k):
            kc = jnp.minimum(base + j, n_kpts - 1)
            ys = pl.multiple_of(ys_ref[kc], SUBLANE)
            xs = pl.multiple_of(xs_ref[kc], LANES)
            pltpu.make_async_copy(
                src_ref.at[pl.ds(ys, rows), pl.ds(xs, LANES)],
                wins.at[slot, j], sems.at[slot]).start()

    def wait_slot(slot):
        # One wait for the whole slot: the descriptor's dst is the full
        # [block_k, rows, LANES] slot, so the awaited byte count equals
        # the block's block_k window copies combined.
        pltpu.make_async_copy(wins.at[slot], wins.at[slot],
                              sems.at[slot]).wait()

    for b in range(nbuf - 1):
        @pl.when(b < nblocks)
        def _(b=b):
            start(b % nbuf, b)

    def body(i, carry):
        slot = jax.lax.rem(i, nbuf)

        @pl.when(i + nbuf - 1 < nblocks)
        def _():
            start(jax.lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1)

        wait_slot(slot)
        base = i * block_k
        for j in range(block_k):
            out_ref[pl.ds(jnp.minimum(base + j, n_kpts - 1), 1), :] = \
                jnp.sum(wins[slot, j], axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, nblocks, body, 0, unroll=False)


def p1(slab, ys0, xs0, rows, count, block_k=8, nbuf=4):
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    cnt = jnp.minimum(count, kp).astype(jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, block_k, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p1_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp, nbuf=nbuf),
        out_shape=jax.ShapeDtypeStruct((kp, LANES), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(cnt, ys0, xs0, slab)[:k]


def main():
    rng = np.random.default_rng(0)
    H, W = 1536, 1024          # slab-ish
    rows = 72
    K = 5000
    live = 1080
    slab = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
    ys0 = jnp.asarray(
        (rng.integers(0, (H - rows) // 8, K) * 8), jnp.int32)
    xs0 = jnp.asarray(rng.integers(0, (W - LANES) // 128, K) * 128,
                      jnp.int32)
    count = jnp.asarray(live, jnp.int32)

    a = jax.jit(p0, static_argnums=(3,))(slab, ys0, xs0, rows, count)
    for bk, nbuf in [(8, 4), (8, 8), (16, 4), (32, 2), (8, 2)]:
        b = jax.jit(p1, static_argnums=(3, 5, 6))(
            slab, ys0, xs0, rows, count, bk, nbuf)
        ok = bool(jnp.allclose(a[:live], b[:live]))
        print(f"P1 bk={bk} nbuf={nbuf}: match={ok}")

    def s0(x):
        return x, jnp.sum(p0(slab, ys0, xs0, rows, count)[:live]) + \
            jnp.sum(x) * 1e-20
    ms = measure_ms(s0, jnp.zeros((8, 128)), k_small=4, k_large=24)
    print(f"P0 static-grid 2-slot:      {ms:7.3f} ms "
          f"({ms*1000/live:5.2f} us/kpt)")

    par = jnp.asarray(rng.normal(size=(K, 16)), jnp.float32)

    def s0b(x):
        return x, jnp.sum(p0b(slab, ys0, xs0, par, rows, count)[:live]) \
            + jnp.sum(x) * 1e-20
    ms = measure_ms(s0b, jnp.zeros((8, 128)), k_small=4, k_large=24)
    print(f"P0b + blocked par input:    {ms:7.3f} ms "
          f"({ms*1000/live:5.2f} us/kpt)")

    for bk, nbuf in [(8, 2), (8, 4), (8, 8), (16, 4), (32, 2), (32, 4)]:
        def s1(x, bk=bk, nbuf=nbuf):
            return x, jnp.sum(
                p1(slab, ys0, xs0, rows, count, bk, nbuf)[:live]) + \
                jnp.sum(x) * 1e-20
        ms = measure_ms(s1, jnp.zeros((8, 128)), k_small=4, k_large=24)
        print(f"P1 dyn bk={bk:2d} nbuf={nbuf}:       {ms:7.3f} ms "
              f"({ms*1000/live:5.2f} us/kpt)")


if __name__ == "__main__":
    main()
