"""Check whether repeated identical executions are cached by the axon
relay: time the same gather with FIXED args vs VARYING args per rep."""
import time

import jax
import jax.numpy as jnp


def main():
    print("devices:", jax.devices())
    B = 2 ** 19
    nx, ny, nzp = 361, 181, 29
    R = nzp * ny * nx
    tbl = jax.random.normal(jax.random.PRNGKey(1), (5, R), jnp.float32)

    @jax.jit
    def take(tbl, lin):
        return tbl[:, lin].sum(axis=(0, 1))

    lins = [jax.random.randint(jax.random.PRNGKey(i), (4, B), 0, R)
            for i in range(12)]
    jax.block_until_ready(lins)

    # fixed args
    r = take(tbl, lins[0]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = take(tbl, lins[0])
    jax.block_until_ready(r)
    print(f"fixed args : {(time.perf_counter()-t0)/10*1e3:8.2f} ms")

    # varying args
    r = take(tbl, lins[1]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = []
    for i in range(2, 12):
        rs.append(take(tbl, lins[i]))
    jax.block_until_ready(rs)
    print(f"varying args: {(time.perf_counter()-t0)/10*1e3:8.2f} ms")

    # varying args, row gather L=64
    tblr = jax.random.normal(jax.random.PRNGKey(5), (R, 64), jnp.float32)

    @jax.jit
    def rtake(tbl, lin):
        return tbl[lin].sum(axis=-1)

    cells = [jax.random.randint(jax.random.PRNGKey(100 + i), (B,), 0, R)
             for i in range(11)]
    jax.block_until_ready(cells)
    r = rtake(tblr, cells[0]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [rtake(tblr, cells[i]) for i in range(1, 11)]
    jax.block_until_ready(rs)
    print(f"row L=64 varying: {(time.perf_counter()-t0)/10*1e3:8.2f} ms "
          f"({64*4*B/((time.perf_counter()-t0)/10)/1e9:6.1f} GB/s)")

    srt = [jnp.sort(c) for c in cells]
    jax.block_until_ready(srt)
    r = rtake(tblr, srt[0]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [rtake(tblr, srt[i]) for i in range(1, 11)]
    jax.block_until_ready(rs)
    print(f"row L=64 varying sorted: {(time.perf_counter()-t0)/10*1e3:8.2f} ms")

    # column gather heights with varying args
    for F in (5, 8, 10, 15):
        tblF = jax.random.normal(jax.random.PRNGKey(F), (F, R), jnp.float32)
        r = take_col(tblF, lins[0]) if False else None

        @jax.jit
        def takeF(tbl, lin):
            return tbl[:, lin].sum(axis=(0, 1))

        r = takeF(tblF, lins[0]); jax.block_until_ready(r)
        t0 = time.perf_counter()
        rs = [takeF(tblF, lins[i]) for i in range(1, 11)]
        jax.block_until_ready(rs)
        print(f"col F={F:3d} k=4 varying: {(time.perf_counter()-t0)/10*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
