"""Micro-benchmark: row-gather table layouts for the fused advance
sampling redesign (one packed row per (level, y, x) cell vs the current
many-small-gathers scheme).  Prints per-variant timings with bytes
moved per particle so the layout decision is volume-aware.

Run on the real chip:  python scripts/bench_rowtake.py [N_log2]
"""
import sys
import time

import jax
import jax.numpy as jnp


def timeit(f, *args, reps=5, warmup=1, label=""):
    t0 = time.perf_counter()
    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"  [{label}] compile+warmup {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    N = 2 ** n_log2
    nzp, ny, nx = 31, 181, 361
    R = nzp * ny * nx
    print("devices:", jax.devices(), "N:", N, "R:", R, flush=True)
    key = jax.random.PRNGKey(0)
    lin = jax.random.randint(key, (N,), 0, R - 1, jnp.int32)
    lin4 = jax.random.randint(key, (N, 4), 0, R - 1, jnp.int32)
    lin = jax.block_until_ready(lin)
    lin4 = jax.block_until_ready(lin4)

    for width in (8, 32, 128):
        tbl = jax.random.normal(jax.random.PRNGKey(1), (R, width),
                                jnp.float32)
        tbl = jax.block_until_ready(tbl)

        @jax.jit
        def take1(lin, tbl=tbl):
            return tbl[lin].sum(axis=1)

        t = timeit(take1, lin, label=f"take1 w{width}")
        print(f"row-take 1 idx (N,{width}):   {t*1e3:8.2f} ms  "
              f"{width*4}B/p", flush=True)

        @jax.jit
        def take4(lin4, tbl=tbl):
            return tbl[lin4].sum(axis=(1, 2))

        t = timeit(take4, lin4, label=f"take4 w{width}")
        print(f"row-take 4 idx (N,4,{width}): {t*1e3:8.2f} ms  "
              f"{4*width*4}B/p", flush=True)

    # current-style: minor-dim gather from (F, R) with F-slice per index
    for F in (5, 21):
        tblT = jax.random.normal(jax.random.PRNGKey(2), (F, R),
                                 jnp.float32)
        tblT = jax.block_until_ready(tblT)

        @jax.jit
        def minor4(lin4, tblT=tblT):
            return tblT[:, lin4].sum(axis=(1, 2))

        t = timeit(minor4, lin4, label=f"minor4 F{F}")
        print(f"minor-gather 4 idx ({F},N,4): {t*1e3:8.2f} ms  "
              f"{F*4*4}B/p", flush=True)


if __name__ == "__main__":
    main()
