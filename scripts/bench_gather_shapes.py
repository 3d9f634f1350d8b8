"""Compare the old (split) vs new (paired) gather layouts and slice
heights at bench sizes, to locate the paired-table regression."""
import time

import jax
import jax.numpy as jnp


def timeit(f, *args, reps=10, warmup=1, label=""):
    t0 = time.perf_counter()
    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"  [{label}] warmup {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    N = 2 ** 19
    nz, ny, nx = 30, 181, 361
    nzp = nz - 1
    R = nzp * ny * nx
    key = jax.random.PRNGKey(0)
    lin4 = jax.random.randint(key, (4, N), 0, R - 1, jnp.int32)
    p4 = jax.random.uniform(key, (4, N))
    jax.block_until_ready((lin4, p4))

    for F in (6, 8, 10, 15, 16):
        tbl = jax.random.normal(jax.random.PRNGKey(F), (F, R), jnp.float32)
        tbl = jax.block_until_ready(tbl)

        @jax.jit
        def g4(lin4, p4, tbl=tbl):
            g = tbl[:, lin4]                       # (F, 4, N)
            return jnp.sum(g * p4[None], axis=1)   # (F, N)

        t = timeit(g4, lin4, p4, label=f"slice{F} 4idx")
        print(f"slice-{F:2d} gather 4 idx:  {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
