"""Pallas TPU kernel: replay window gather via scalar-prefetch DMA.

The learner's hottest memory op is gathering sampled observation
windows out of the HBM-resident replay ring (SURVEY.md §7 M6 lists the
irregular replay gather as a Pallas candidate). XLA lowers the
advanced-index gather to per-row HBM touches; this kernel instead uses
`PrefetchScalarGridSpec` — sampled (env, col) indices are prefetched
to SMEM before the body runs, so each grid step issues ONE contiguous
async DMA per window row straight from the storage ring in HBM
(ANY memory space) into the output block, double-buffered across the
grid by the pipeline.

Shapes: storage (E, T, *obs) — gathers `win` consecutive columns
starting at col[b] (mod T) for each of B samples:
  out[b, w] = storage[env[b], (col[b] + w) % T]

STATUS — CLOSED as investigated (SURVEY.md §7 M6 candidate), XLA
keeps the learner gather. Round-2 (this kernel, B=256, win=4, 4KB
rows): 0.53 ms vs XLA 0.43 ms. Round-3 (fused_union_gather below,
B=256, F+n=7 union rows, bench shapes, measured in one process by
tools/bench_pallas_gather.py): correct checksums, but 1.628 ms/gather
at group=8 and 16 vs XLA's two native gathers at 0.304 ms — 5.4x
slower. One descriptor-issued DMA per sample (even grouped in flight)
cannot match XLA's bulk gather at these row sizes; the copies are
~15% of the update program (tools/profile_bench.py), so the headroom
never justified more than this. Mosaic constraints hit and documented
along the way:
  * in an (E, T, R) memref the (8, 128) tiling lands on (T, R):
    window slices along T must be 8-aligned — fixed by viewing rows
    as their own (8, R/8) tile blocks (see pad_rows below);
  * the round-2 4D-raw-frame variant (window_gather above) no longer
    compiles on the round-3 toolchain for the same reason (slicing
    dim 2 = 84 not 8-aligned) — kept for interpret-mode/CPU tests;
  * per-grid-step start+wait serializes DMAs; grouped in-flight
    descriptors (start-all/wait-all) recover overlap but not enough.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit,
                   static_argnames=("window", "interpret"))
def window_gather(storage: jnp.ndarray, env: jnp.ndarray,
                  col: jnp.ndarray, window: int,
                  interpret: bool = False) -> jnp.ndarray:
    """out[b, w] = storage[env[b], (col[b]+w) % T]  (B, window, *obs).

    `col` may be negative (lookback); it is wrapped mod T here so the
    kernel only sees canonical columns.
    """
    E, T = storage.shape[0], storage.shape[1]
    B = env.shape[0]
    obs_shape = storage.shape[2:]
    col = jnp.mod(col, T).astype(jnp.int32)
    env = env.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )

    def kernel(env_ref, col_ref, storage_ref, out_ref, sem):
        # One contiguous DMA per sample (rows are T-major contiguous);
        # a window crossing the ring seam splits into two.
        b = pl.program_id(0)
        e = env_ref[b]
        c0 = col_ref[b]
        n_first = jnp.minimum(T - c0, window)

        @pl.when(n_first >= window)
        def _():
            pltpu.make_async_copy(
                storage_ref.at[e, pl.ds(c0, window)],
                out_ref.at[b], sem.at[0]).start()
            pltpu.make_async_copy(
                storage_ref.at[e, pl.ds(c0, window)],
                out_ref.at[b], sem.at[0]).wait()

        @pl.when(n_first < window)
        def _():
            # seam split: [c0, T) then [0, window - n_first)
            for w in range(window):
                c = jax.lax.rem(c0 + w, T)
                pltpu.make_async_copy(
                    storage_ref.at[e, c], out_ref.at[b, w],
                    sem.at[0]).start()
                pltpu.make_async_copy(
                    storage_ref.at[e, c], out_ref.at[b, w],
                    sem.at[0]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, window) + obs_shape,
                                       storage.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
        interpret=interpret,
    )(env, col, storage)


def window_gather_reference(storage, env, col, window):
    """jnp reference implementation (and non-TPU fallback)."""
    T = storage.shape[1]
    offs = jnp.arange(window, dtype=jnp.int32)
    cols = jnp.mod(col[:, None] + offs[None, :], T)
    return storage[env[:, None], cols]


# ---------------------------------------------------------------------------
# Fused stack + n-step union gather (the docstring's promised variant)
# ---------------------------------------------------------------------------
#
# The FF learner gathers TWO overlapping frame-stack windows per sample
# (obs at col and col+n_step: 2*F rows); their union is one contiguous
# window of F+n rows [col-F+1, col+n]. This kernel fetches the union in
# ONE DMA per sample (two on a ring seam), with `group` DMAs in flight
# at once (start-all/wait-all per grid step) so HBM latency overlaps —
# the cross-grid double-buffering the round-2 status block planned.
#
# Storage rows must be tile-aligned for Mosaic HBM slicing. In a 3D
# (E, T, R) memref the (sublane, lane) tiling lands on (T, R), which
# forbids slicing T by a window length that isn't a multiple of 8
# (measured on-chip: "Slice shape along dimension 1 must be aligned to
# tiling (8), but is 7" for the F+n=7 union). So each row is padded to
# a multiple of 8*128=1024 bytes and VIEWED as its own (8, R/8)
# tile-aligned 2D block — the memref becomes (E, T, 8, R/8), T is
# untiled again, and arbitrary window lengths slice cleanly. For
# 84x84=7056 the pad is to 7168 (1.6%), which also buys aligned,
# purely-contiguous DMA rows.

def pad_rows(storage: jnp.ndarray) -> jnp.ndarray:
    """(E, T, *obs) -> (E, T, R) flattened rows, R % 1024 == 0."""
    E, T = storage.shape[:2]
    row = int(np.prod(storage.shape[2:]))
    R = -(-row // 1024) * 1024
    flat = storage.reshape(E, T, row)
    if R == row:
        return flat
    return jnp.pad(flat, ((0, 0), (0, 0), (0, R - row)))


@functools.partial(
    jax.jit, static_argnames=("window", "group", "interpret"))
def fused_union_gather(storage: jnp.ndarray, env: jnp.ndarray,
                       col0: jnp.ndarray, window: int,
                       group: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """out[b, w] = storage[env[b], (col0[b]+w) % T]  (B, window, R).

    storage: (E, T, R) padded rows (R % 1024 == 0 — see pad_rows; it
    is viewed as (E, T, 8, R/8) so the T axis stays untiled and any
    window length is DMA-sliceable). `col0` is the FIRST column of the
    union window (col - lookback; may be negative, wrapped here). B
    must divide by `group`.
    """
    E, T, R = storage.shape
    B = env.shape[0]
    assert R % 1024 == 0, "rows must be (8,128)-tile padded (pad_rows)"
    assert B % group == 0, "batch must divide by DMA group size"
    storage = storage.reshape(E, T, 8, R // 8)
    col0 = jnp.mod(col0, T).astype(jnp.int32)
    env = env.astype(jnp.int32)
    W = window

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // group,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
    )

    def kernel(env_ref, col_ref, storage_ref, out_ref, sems):
        g = pl.program_id(0)

        def dmas(i, b):
            """The (deterministic) copy set for sample b on sem i."""
            e = env_ref[b]
            c0 = col_ref[b]
            n1 = T - c0
            whole = pltpu.make_async_copy(
                storage_ref.at[e, pl.ds(c0, W)], out_ref.at[b],
                sems.at[i])
            rows = [pltpu.make_async_copy(
                storage_ref.at[e, jax.lax.rem(c0 + w, T)],
                out_ref.at[b, w], sems.at[i]) for w in range(W)]
            return n1, whole, rows

        # phase 1: start `group` samples' DMAs (all in flight at once)
        for i in range(group):
            b = g * group + i
            n1, whole, rows = dmas(i, b)

            @pl.when(n1 >= W)
            def _():
                whole.start()

            @pl.when(n1 < W)
            def _():
                for r in rows:
                    r.start()

        # phase 2: wait them (same descriptors, same order)
        for i in range(group):
            b = g * group + i
            n1, whole, rows = dmas(i, b)

            @pl.when(n1 >= W)
            def _():
                whole.wait()

            @pl.when(n1 < W)
            def _():
                for r in rows:
                    r.wait()

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W, 8, R // 8),
                                       storage.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
        interpret=interpret,
    )(env, col0, storage)
    return out.reshape(B, W, R)


def split_union(union: jnp.ndarray, frame_stack: int, n_step: int,
                obs_shape) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Union rows (B, F+n, R) -> (obs_t, obs_tn) each (B, F, *obs).

    Row w of the union is column col-F+1+w; obs_t's stack (oldest
    first) is rows [0, F), obs_tn's is rows [n, n+F). The 128-lane row
    pad is stripped here (one cheap contiguous slice per output)."""
    B = union.shape[0]
    row = int(np.prod(obs_shape))
    F = frame_stack
    obs_t = union[:, :F, :row].reshape((B, F) + tuple(obs_shape))
    obs_tn = union[:, n_step:n_step + F, :row].reshape(
        (B, F) + tuple(obs_shape))
    return obs_t, obs_tn
