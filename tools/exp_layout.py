"""Settle the [N, 1] layout question on real hardware.

Times, inside ONE jit each (scalar-probe synced, far above the ~5 ms
tunnel floor): producing a [N, 1] f32 array from fused elementwise
work vs the same values as [N/128, 128] — if XLA tile-pads [N, 1] to
128 lanes the first is ~128x the bytes and ~128x slower; if XLA picks
a compact layout they time the same. Also times a reshape round-trip
[3, NC, B] -> [3*NC*B, 1] (the v1 megakernel's descriptor boundary).

Usage: python tools/exp_layout.py [N_millions]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

_probe = jax.jit(lambda x: jnp.sum(x[:8, :].astype(jnp.float32)))


def timeit(fn, *a, reps=6):
    out = fn(*a)
    float(_probe(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(_probe(out))
    return (time.perf_counter() - t0) / reps


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    n = int(n_m * 1e6) // 128 * 128
    x = jnp.arange(n, dtype=jnp.float32).reshape(n // 128, 128)

    @jax.jit
    def narrow(x):
        y = x * 1.0001 + 3.0
        return y.reshape(n, 1)

    @jax.jit
    def wide(x):
        return x * 1.0001 + 3.0

    @jax.jit
    def narrow_plus_read(x):
        y = (x * 1.0001 + 3.0).reshape(n, 1)
        return (y * 2.0).reshape(n // 128, 128)

    t_w = timeit(wide, x)
    t_n = timeit(narrow, x)
    t_nr = timeit(narrow_plus_read, x)
    gb = n * 4 / 1e9
    print(f"N={n/1e6:.1f}M  logical bytes/side={gb:.2f} GB")
    print(f"wide   [N/128,128] write: {t_w*1e3:8.2f} ms "
          f"({2*gb/t_w:6.0f} GB/s apparent)")
    print(f"narrow [N,1]       write: {t_n*1e3:8.2f} ms "
          f"({2*gb/t_n:6.0f} GB/s apparent)")
    print(f"narrow write+read       : {t_nr*1e3:8.2f} ms")
    print(f"narrow/wide ratio: {t_n/t_w:.1f}x "
          f"(~1 = compact layout; ~100x = 128-lane tile padding)")


if __name__ == "__main__":
    main()
