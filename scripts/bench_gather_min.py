"""Minimal repro: why did (5,R) 4-index column gather time 13 ms in one
script and 0.04 ms in another?  Vary only the index source."""
import time

import jax
import jax.numpy as jnp


def timeit(f, *args, reps=10, warmup=2):
    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices())
    B = 2 ** 19
    nx, ny, nzp = 361, 181, 29
    R = nzp * ny * nx
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(jax.random.PRNGKey(1), (5, R), jnp.float32)

    @jax.jit
    def take(tbl, lin):
        return tbl[:, lin].sum(axis=(0, 1))

    # A: synthetic stride-37 indices (k=4 leading)
    lin1 = jax.random.randint(key, (B,), 0, R)
    linA = jnp.stack([(lin1 + 37 * i) % R for i in range(4)], 0)
    # B: realistic corner indices (4, N)
    x = jax.random.uniform(key, (B,), minval=30.0, maxval=330.0)
    y = jax.random.uniform(jax.random.PRNGKey(2), (B,),
                           minval=30.0, maxval=150.0)
    iz = jax.random.randint(jax.random.PRNGKey(3), (B,), 0, nzp - 1)
    ix = jnp.floor(x).astype(jnp.int32)
    jy = jnp.floor(y).astype(jnp.int32)
    base = iz * (ny * nx) + jy * nx + ix
    linB = jnp.stack([base, base + 1, base + nx, base + nx + 1], 0)
    # C: fully random independent (4, N)
    linC = jax.random.randint(jax.random.PRNGKey(4), (4, B), 0, R)
    # D: same as A but trailing shape (N, 4)
    linD = linA.T
    jax.block_until_ready((linA, linB, linC, linD))

    for name, lin in (("A stride37 (4,N)", linA), ("B corners (4,N)", linB),
                      ("C random  (4,N)", linC)):
        t = timeit(take, tbl, lin)
        print(f"{name}: {t*1e3:8.2f} ms")

    @jax.jit
    def takeT(tbl, lin):
        return tbl[:, lin].sum(axis=(0, 2))

    t = timeit(takeT, tbl, linD)
    print(f"D stride37 (N,4): {t*1e3:8.2f} ms")

    # row-gather with realistic cell ids, (R, 64)
    tblr = jax.random.normal(jax.random.PRNGKey(5), (R, 64), jnp.float32)

    @jax.jit
    def rtake(tbl, lin):
        return tbl[lin].sum(axis=-1)

    t = timeit(rtake, tblr, base)
    print(f"row L=64 cell ids: {t*1e3:8.2f} ms")
    t = timeit(rtake, tblr, lin1)
    print(f"row L=64 randint : {t*1e3:8.2f} ms")

    # and the big-output check: materialize the gathered rows
    @jax.jit
    def rtake_mat(tbl, lin):
        return tbl[lin]

    t = timeit(rtake_mat, tblr, base)
    print(f"row L=64 materialize: {t*1e3:8.2f} ms "
          f"({64*4*B/t/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
