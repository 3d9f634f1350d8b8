"""Sweep TPU gather cost vs (indices/particle, fetch height, layout).

Two layouts for the per-particle met stencil fetch:
  column-gather: table (F, R), gather along the MINOR dim -> (F, n_idx, N)
  row-gather:    table (R, L), gather along the MAJOR dim -> (N, n_idx, L)
Row-gather fetches L contiguous values per index (a lane row), which is
the natural unit the HBM likes; column-gather fetches a strided column.

Also measures the effect of index sortedness (particle spatial locality).
"""
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
    R = 29 * 181 * 361          # (nz-1) * ny * nx cell rows
    key = jax.random.PRNGKey(0)
    lin1 = jax.random.randint(key, (B,), 0, R)
    lin1s = jnp.sort(lin1)
    jax.block_until_ready((lin1, lin1s))

    print("\n-- column-gather: (F, R) table, k indices --")
    for F in (5, 8):
        for k in (1, 2, 4):
            tbl = jax.random.normal(jax.random.PRNGKey(F * 10 + k),
                                    (F, R), jnp.float32)
            lin = jnp.stack([(lin1 + 37 * i) % R for i in range(k)], 0)
            jax.block_until_ready(lin)

            @jax.jit
            def take(tbl, lin):
                return tbl[:, lin].sum(axis=(0, 1))

            t = timeit(take, tbl, lin)
            print(f"col  F={F:3d} k={k}: {t*1e3:8.2f} ms  "
                  f"{k*F*4*B/t/1e9:6.1f} GB/s useful")

    print("\n-- row-gather: (R, L) table, 1 index --")
    for L, dt in ((8, jnp.float32), (16, jnp.float32), (32, jnp.float32),
                  (64, jnp.float32), (128, jnp.float32),
                  (64, jnp.bfloat16), (128, jnp.bfloat16)):
        tbl = jax.random.normal(jax.random.PRNGKey(L), (R, L), dt)

        @jax.jit
        def rtake(tbl, lin):
            return tbl[lin].astype(jnp.float32).sum(axis=-1)

        t = timeit(rtake, tbl, lin1)
        bpr = L * (2 if dt == jnp.bfloat16 else 4)
        print(f"row  L={L:3d} {dt.__name__:9s}: {t*1e3:8.2f} ms  "
              f"{bpr*B/t/1e9:6.1f} GB/s useful")
        t = timeit(rtake, tbl, lin1s)
        print(f"row  L={L:3d} {dt.__name__:9s} sorted: {t*1e3:6.2f} ms")

    print("\n-- row-gather with 2 or 4 indices (smaller rows) --")
    for L, k in ((32, 2), (16, 4), (64, 2)):
        tbl = jax.random.normal(jax.random.PRNGKey(L + k), (R, L),
                                jnp.float32)
        lin = jnp.stack([(lin1 + 37 * i) % R for i in range(k)], 1)

        @jax.jit
        def rtake2(tbl, lin):
            return tbl[lin].sum(axis=(-1, -2))

        t = timeit(rtake2, tbl, lin)
        print(f"row  L={L:3d} k={k}: {t*1e3:8.2f} ms  "
              f"{k*L*4*B/t/1e9:6.1f} GB/s useful")

    print("\n-- realistic quad-corner row fetch + weight reduce --")
    # row = all 15 stencil quantities x 4 corners = 60 lanes (pad 64)
    tbl = jax.random.normal(jax.random.PRNGKey(7), (R, 64), jnp.float32)
    p4 = jax.random.uniform(jax.random.PRNGKey(8), (B, 4))
    dz1 = jax.random.uniform(jax.random.PRNGKey(9), (B,))

    @jax.jit
    def stencil(tbl, lin, p4, dz1):
        rows = tbl[lin]                         # (N, 64)
        quad = rows[:, :60].reshape(B, 15, 4)
        horiz = jnp.einsum("nfc,nc->nf", quad, p4)   # (N, 15)
        lev0 = horiz[:, 0:10:2]
        lev1 = horiz[:, 1:10:2]
        val = lev0 * (1 - dz1[:, None]) + lev1 * dz1[:, None]
        return val.sum(), horiz[:, 10:].sum()

    t = timeit(stencil, tbl, lin1, p4, dz1)
    print(f"quad-corner row L=64 + reduce: {t*1e3:8.2f} ms -> "
          f"{B/t/1e6:7.2f} M particles/s")

    # same but lanes-first reduce (transpose after gather)
    @jax.jit
    def stencil_t(tbl, lin, p4, dz1):
        rows = tbl[lin]                         # (N, 64)
        quad = rows[:, :60].reshape(B, 15, 4)
        horiz = jnp.sum(quad * p4[:, None, :], axis=-1)
        lev0 = horiz[:, 0:10:2]
        lev1 = horiz[:, 1:10:2]
        val = lev0 * (1 - dz1[:, None]) + lev1 * dz1[:, None]
        return val.sum(), horiz[:, 10:].sum()

    t = timeit(stencil_t, tbl, lin1, p4, dz1)
    print(f"quad-corner row (mul-reduce):  {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
