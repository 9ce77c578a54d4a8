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

STATUS (measured on TPU v5e, B=256, win=4, 4KB rows): correct
(bit-equal to the jnp gather incl. ring-seam windows), 0.53 ms vs
XLA's 0.43 ms — XLA's native gather is already near this layout's
practical bandwidth, so the learner keeps the jnp path and this
kernel stays as the platform for future fused variants (e.g. stack +
n-step window in one pass). Two Mosaic constraints discovered and
documented for that work:
  * HBM memref slices must respect the (sublane, lane) tiling — raw
    84x84 uint8 frames are NOT DMA-sliceable; rows need padding to
    (8k, 128)-aligned shapes first;
  * per-grid-step start+wait serializes DMAs; overlapping requires
    double-buffering across grid steps (pallas_guide §Double
    Buffering), worthwhile only once the copy is the bottleneck.
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
