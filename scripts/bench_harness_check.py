"""Validate the timing harness on this backend with known-cost ops."""
import time

import jax
import jax.numpy as jnp


def main():
    print("devices:", jax.devices())
    B = 2 ** 19
    R = 29 * 181 * 361

    # known-cost op: f32 4096^3 matmul = 137 GFLOP
    a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.float32)

    @jax.jit
    def mm(a, b):
        return a @ b

    r = mm(a, b); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = mm(a, b)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 10
    print(f"matmul 4096^3: {dt*1e3:8.2f} ms -> "
          f"{2*4096**3/dt/1e12:6.1f} TFLOP/s")

    # gather, blocking EVERY call
    tblr = jax.random.normal(jax.random.PRNGKey(5), (R, 64), jnp.float32)
    cells = [jax.random.randint(jax.random.PRNGKey(100 + i), (B,), 0, R)
             for i in range(11)]
    jax.block_until_ready(cells)

    @jax.jit
    def rtake(tbl, lin):
        return tbl[lin].sum(axis=-1)

    r = rtake(tblr, cells[0]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(1, 11):
        rtake(tblr, cells[i]).block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"row L=64 block-each: {dt*1e3:8.2f} ms "
          f"({64*4*B/dt/1e9:6.1f} GB/s)")

    # chained gathers (output feeds next input's index mix) so nothing
    # can overlap
    @jax.jit
    def chain(tbl, lin, n):
        def body(i, li):
            v = tbl[li].sum(axis=-1)
            return (li + v.astype(jnp.int32)) % R
        return jax.lax.fori_loop(0, n, body, lin)

    r = chain(tblr, cells[0], 10); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chain(tblr, cells[0], 10)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 10
    print(f"row L=64 chained x10: {dt*1e3:8.2f} ms "
          f"({64*4*B/dt/1e9:6.1f} GB/s)")

    # chained column gather height 15 vs 5
    for F in (5, 8, 15):
        tblF = jax.random.normal(jax.random.PRNGKey(F), (F, R), jnp.float32)

        @jax.jit
        def chainF(tbl, lin, n):
            def body(i, li):
                v = tbl[:, li].sum(axis=0)          # (4, B)
                return (li + v.astype(jnp.int32)) % R
            return jax.lax.fori_loop(0, n, body, lin)

        lin0 = jnp.stack([cells[0], cells[1], cells[2], cells[3]], 0)
        r = chainF(tblF, lin0, 10); jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = chainF(tblF, lin0, 10)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 10
        print(f"col F={F:3d} k=4 chained x10: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
