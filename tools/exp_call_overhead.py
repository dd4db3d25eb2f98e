"""Measure the IN-PROGRAM fixed cost of a pallas call on this chip.

Hypothesis (PERF.md round 3): the fine megakernel runs ~255M rows/s
standalone (NC=4096-chunk calls) but ~149-157M in the frame, where it
executes as 78 small calls (NC=512 chunks, one per lax.map block). If
each in-program call carries a fixed ~2-4 ms (dispatch + the
fused-producer staging penalty), that alone explains the gap — and the
fix is fewer, larger calls (bigger ray_block), not a faster kernel.

Method: one jit that chains K independent pallas calls of a trivial
kernel (copy one [8, 128] block) back to back, K in {1, 8, 32, 96};
the slope of time vs K is the per-call fixed cost. The ~5 ms/jit
tunnel floor cancels in the slope. A second sweep chains K calls of
the REAL megakernel at the in-frame call size (NC=512) via
exp_mega_rate's CALLS mode for the end-to-end number.

Usage: python tools/exp_call_overhead.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_probe = jax.jit(lambda x: jnp.sum(x[0].astype(jnp.float32)))


def sync(x):
    return float(_probe(x))


def _tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def _tiny_call(x):
    return pl.pallas_call(
        _tiny_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


@functools.partial(jax.jit, static_argnames=("k",))
def chain(x, k: int):
    for _ in range(k):
        x = _tiny_call(x)
    return x


def main():
    x = jnp.zeros((8, 128), jnp.float32)
    times = {}
    for k in (1, 8, 32, 96):
        sync(chain(x, k))                       # compile
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            out = chain(x, k)
        sync(out)
        times[k] = (time.perf_counter() - t0) / reps
        print(f"K={k:3d}: {times[k] * 1e3:7.3f} ms/jit", flush=True)
    ks = sorted(times)
    slope = (times[ks[-1]] - times[ks[0]]) / (ks[-1] - ks[0])
    print(f"per-pallas-call fixed cost (in-program): "
          f"{slope * 1e6:.0f} us", flush=True)
    print("compare: 78 fine-pass calls/frame at this cost = "
          f"{78 * slope * 1e3:.1f} ms of the 411 ms fine pass",
          flush=True)


if __name__ == "__main__":
    main()
