"""Force real completion with device-to-host fetches when timing."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices())
    B = 2 ** 19
    R = 29 * 181 * 361

    a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.float32)

    @jax.jit
    def mm_chain(a, b, n):
        def body(i, x):
            return (x @ b) * (1.0 / 64.0)
        return jax.lax.fori_loop(0, n, body, a)

    r = mm_chain(a, b, 2); _ = np.asarray(r)
    t0 = time.perf_counter()
    r = mm_chain(a, b, 52)
    _ = np.asarray(r)
    dt = (time.perf_counter() - t0 ) / 50  # subtract ~2 iters worth? no: 52 iters
    dt = (time.perf_counter() - t0) / 52
    print(f"matmul 4096^3 chained (d2h): {dt*1e3:8.2f} ms -> "
          f"{2*4096**3/dt/1e12:6.1f} TFLOP/s")

    tblr = jax.random.normal(jax.random.PRNGKey(5), (R, 64), jnp.float32)
    cell = jax.random.randint(jax.random.PRNGKey(100), (B,), 0, R)

    @jax.jit
    def chain(tbl, lin, n):
        def body(i, li):
            v = tbl[li].sum(axis=-1)
            return (li + v.astype(jnp.int32)) % R
        return jax.lax.fori_loop(0, n, body, lin)

    r = chain(tblr, cell, 2); _ = np.asarray(r)
    t0 = time.perf_counter()
    r = chain(tblr, cell, 102)
    _ = np.asarray(r)
    dt = (time.perf_counter() - t0) / 102
    print(f"row L=64 chained (d2h): {dt*1e3:8.2f} ms "
          f"({64*4*B/dt/1e9:6.1f} GB/s)")

    for F in (5, 8, 15):
        tblF = jax.random.normal(jax.random.PRNGKey(F), (F, R), jnp.float32)

        @jax.jit
        def chainF(tbl, lin, n):
            def body(i, li):
                v = tbl[:, li].sum(axis=0)
                return (li + v.astype(jnp.int32)) % R
            return jax.lax.fori_loop(0, n, body, lin)

        lin0 = jax.random.randint(jax.random.PRNGKey(7), (4, B), 0, R)
        r = chainF(tblF, lin0, 2); _ = np.asarray(r)
        t0 = time.perf_counter()
        r = chainF(tblF, lin0, 102)
        _ = np.asarray(r)
        dt = (time.perf_counter() - t0) / 102
        print(f"col F={F:3d} k=4 chained (d2h): {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
