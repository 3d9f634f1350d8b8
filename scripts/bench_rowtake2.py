"""Follow-up: verify the fast (N,32) row-gather result and time the
remaining candidate layouts for the packed-row advance sampling."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=20, warmup=1, label=""):
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
    N = 2 ** 19
    nzp, ny, nx = 31, 181, 361
    R = nzp * ny * nx
    print("N:", N, "R:", R, flush=True)
    key = jax.random.PRNGKey(0)
    lin = jax.random.randint(key, (N,), 0, R - 1, jnp.int32)
    lin4 = jax.random.randint(key, (N, 4), 0, R - 1, jnp.int32)
    jax.block_until_ready((lin, lin4))

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "w32"):
        tbl = jax.random.normal(jax.random.PRNGKey(1), (R, 32), jnp.float32)
        jax.block_until_ready(tbl)

        @jax.jit
        def take1(lin):
            return tbl[lin].sum(axis=1)

        t = timeit(take1, lin, label="take1 w32 again")
        print(f"row-take 1 idx (N,32):  {t*1e3:8.3f} ms", flush=True)
        # correctness: compare against explicit gather on 8 spots
        got = np.asarray(take1(lin[:8]))
        want = np.asarray(tbl)[np.asarray(lin[:8])].sum(axis=1)
        print("correct:", np.allclose(got, want), flush=True)

        @jax.jit
        def take4_32(lin4):
            return tbl[lin4].sum(axis=(1, 2))

        t = timeit(take4_32, lin4, label="take4 w32")
        print(f"row-take 4 idx (N,4,32):{t*1e3:8.3f} ms", flush=True)

        # weighted combine shaped like real interpolation:
        # rows (N,4,32) * w (N,4,1) -> sum over corners -> (N,32)
        w4 = jax.random.uniform(key, (N, 4))
        jax.block_until_ready(w4)

        @jax.jit
        def take4_w(lin4, w4):
            return jnp.einsum("ncl,nc->nl", tbl[lin4], w4)

        t = timeit(take4_w, lin4, w4, label="take4 w32 weighted")
        print(f"row-take 4 idx weighted:{t*1e3:8.3f} ms", flush=True)

    if which in ("all", "w128"):
        tbl128 = jax.random.normal(jax.random.PRNGKey(2), (R, 128),
                                   jnp.float32)
        jax.block_until_ready(tbl128)

        @jax.jit
        def take1_128(lin):
            return tbl128[lin].sum(axis=1)

        t = timeit(take1_128, lin, label="take1 w128")
        print(f"row-take 1 idx (N,128): {t*1e3:8.3f} ms", flush=True)

    if which in ("all", "w64"):
        tbl64 = jax.random.normal(jax.random.PRNGKey(3), (R, 64),
                                  jnp.float32)
        jax.block_until_ready(tbl64)

        @jax.jit
        def take1_64(lin):
            return tbl64[lin].sum(axis=1)

        t = timeit(take1_64, lin, label="take1 w64")
        print(f"row-take 1 idx (N,64):  {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
