"""Experimental Pallas DMA row-gather kernel (NOT the default path).

Status: measured 2.9x SLOWER than XLA's native gather on v5e for the
triplane workload (38 ms vs 13 ms for 524k rows of 1KB from a 640k-row
table) — the per-row DMA issue loop runs on the scalar core at ~70 ns
per descriptor, while XLA's gather engine streams the same rows at
~20 ns each. Kept as (a) the reference implementation for Mosaic's DMA
alignment rules (HBM slices must be whole (1024,)-element tiles for
1-D f32 buffers; sub-tile random fetch is impossible), and (b) the
starting point for a future locality-bucketed design (PERF.md).

The kernel fetches aligned 1024-float groups (4 packed cells) and
selects the target 256-float cell with a one-hot contraction outside
the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_ELEMS = 1024          # Mosaic 1-D f32 HBM tile
BLOCK = 1024                # points per grid step (matches s32 tiling)
NSEM = 16                   # DMA pipeline depth


def _kernel(gidx_ref, table_ref, out_ref, sems):
    def copy(i, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(gidx_ref[i] * GROUP_ELEMS, GROUP_ELEMS)],
            out_ref.at[pl.ds(i * GROUP_ELEMS, GROUP_ELEMS)],
            sems.at[slot])

    def body(i, _):
        slot = jax.lax.rem(i, NSEM)

        @pl.when(i >= NSEM)
        def _():
            copy(i - NSEM, slot).wait()

        copy(i, slot).start()
        return ()

    jax.lax.fori_loop(0, BLOCK, body, ())

    def drain(s, _):
        i = BLOCK - NSEM + s
        copy(i, jax.lax.rem(i, NSEM)).wait()
        return ()

    jax.lax.fori_loop(0, NSEM, drain, ())


def gather_rows_dma(table, idx, *, interpret: bool = False):
    """Gather rows table[idx] via per-group DMAs.

    table: [HW, C] f32 with C dividing GROUP_ELEMS; idx: [N] int32 with
    N a multiple of BLOCK. Returns [N, C].
    """
    hw, c = table.shape
    assert GROUP_ELEMS % c == 0, "row width must divide the 1024-f32 tile"
    group = GROUP_ELEMS // c
    assert hw % group == 0
    n = idx.shape[0]
    assert n % BLOCK == 0, f"N must be a multiple of {BLOCK}"

    gidx = (idx // group).astype(jnp.int32)
    sub = idx % group
    flat = table.reshape(-1)

    fetched = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // BLOCK,),
            in_specs=[
                pl.BlockSpec((BLOCK,), lambda b: (b,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BLOCK * GROUP_ELEMS,), lambda b: (b,),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n * GROUP_ELEMS,), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gidx, flat)

    rows = fetched.reshape(n, group, c)
    onehot = (sub[:, None] == jnp.arange(group)).astype(table.dtype)
    return jnp.einsum("ng,ngc->nc", onehot, rows)
