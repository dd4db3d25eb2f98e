"""Correctness test for the experimental Pallas DMA gather (interpret
mode on CPU; the TPU measurement lives in PERF.md)."""

import numpy as np
import jax.numpy as jnp

from nvsr_tpu.ops.pallas.gather_dma import BLOCK, gather_rows_dma


def test_gather_rows_dma_interpret(rng):
    table = rng.standard_normal((512, 256)).astype(np.float32)
    idx = rng.integers(0, 512, size=(BLOCK,)).astype(np.int32)
    out = np.asarray(gather_rows_dma(jnp.asarray(table), jnp.asarray(idx),
                                     interpret=True))
    np.testing.assert_allclose(out, table[idx], atol=1e-6)
