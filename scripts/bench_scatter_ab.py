"""A/B the conccalc scatter forms at bench scale (10.5M particles,
720x360x3 output grid).  Chained through the accumulator + final d2h
fetch so the async relay can't elide or overlap the executions."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(name, fn, acc0, *args, ns=5):
    acc = fn(acc0, *args, jnp.float32(1.0))
    _ = np.asarray(acc)                      # warm + force
    acc = acc0
    t0 = time.perf_counter()
    for i in range(ns):
        acc = fn(acc, *args, jnp.float32(i))
    _ = np.asarray(acc)
    dt = (time.perf_counter() - t0) / ns
    N = args[0].shape[0]
    print(f"{name}: {dt*1e3:8.1f} ms/step -> {N/dt/1e6:6.2f} M p/s",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    N = 10 * 2 ** 20
    nxg, nyg, ncell = 720, 360, 3
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ix = jax.random.randint(k1, (N,), 1, nxg - 2)
    jy = jax.random.randint(k2, (N,), 1, nyg - 2)
    cell = jax.random.randint(k3, (N,), 0, ncell)
    wx = jax.random.uniform(k4, (N,), minval=0.0, maxval=1.0)
    wy = jax.random.uniform(jax.random.PRNGKey(9), (N,))
    jax.block_until_ready((ix, jy, cell, wx, wy))
    acc0 = jnp.zeros((ncell, nyg, nxg), jnp.float32)

    @jax.jit
    def orig(acc, ix, jy, cell, wx, wy, s):
        cx = jnp.stack([ix, ix, ix + 1, ix + 1], -1)
        cy = jnp.stack([jy, jy + 1, jy, jy + 1], -1)
        w4 = jnp.stack([wx * wy, wx * (1 - wy), (1 - wx) * wy,
                        (1 - wx) * (1 - wy)], -1)
        lin = (cell[:, None] * nyg + cy) * nxg + cx
        flat = acc.reshape(-1)
        flat = flat.at[lin.reshape(-1)].add(
            (w4 * 1e-9).reshape(-1) * (1.0 + s), mode="drop")
        return flat.reshape(acc.shape)

    run("orig 4-scalar-idx     ", orig, acc0, ix, jy, cell, wx, wy)

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2))

    @jax.jit
    def windowed(acc, ix, jy, cell, wx, wy, s):
        nchunk = 8
        b = N // nchunk

        def chunk(acc, args):
            ixc, jyc, cc, wxc, wyc = args
            w22 = jnp.stack([
                jnp.stack([wxc * wyc, (1 - wxc) * wyc], -1),
                jnp.stack([wxc * (1 - wyc), (1 - wxc) * (1 - wyc)],
                          -1)], -2) * (1e-9 * (1.0 + s))
            idx = jnp.stack([cc, jyc, ixc], -1)
            acc = jax.lax.scatter_add(
                acc, idx, w22, dnums,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
            return acc, 0.0

        args = jax.tree.map(lambda a: a.reshape(nchunk, b),
                            (ix, jy, cell, wx, wy))
        acc, _ = jax.lax.scan(chunk, acc, args)
        return acc

    run("windowed (2,2) chunked", windowed, acc0, ix, jy, cell, wx, wy)

    @jax.jit
    def four(acc, ix, jy, cell, wx, wy, s):
        flat = acc.reshape(-1)
        for dx, dy, w in ((0, 0, wx * wy), (0, 1, wx * (1 - wy)),
                          (1, 0, (1 - wx) * wy),
                          (1, 1, (1 - wx) * (1 - wy))):
            lin = (cell * nyg + jy + dy) * nxg + ix + dx
            flat = flat.at[lin].add(w * 1e-9 * (1.0 + s), mode="drop")
        return flat.reshape(acc.shape)

    run("four 1-idx scatters   ", four, acc0, ix, jy, cell, wx, wy)

    @jax.jit
    def direct(acc, ix, jy, cell, s):
        flat = acc.reshape(-1)
        lin = (cell * nyg + jy) * nxg + ix
        flat = flat.at[lin].add(jnp.full((N,), 1e-9) * (1.0 + s),
                                mode="drop")
        return flat.reshape(acc.shape)

    run("single 1-idx scatter  ", direct, acc0, ix, jy, cell)

    # sorted-by-cell single scatter (spatial locality effect)
    order = jnp.argsort((cell * nyg + jy) * nxg + ix)
    ixs, jys, cells = ix[order], jy[order], cell[order]
    jax.block_until_ready((ixs, jys, cells))
    run("single 1-idx sorted   ", direct, acc0, ixs, jys, cells)

    # how much does the argsort itself cost?
    @jax.jit
    def sortcost(acc, ix, jy, cell, s):
        o = jnp.argsort((cell * nyg + jy) * nxg + ix
                        + jnp.int32(s))
        flat = acc.reshape(-1)
        lin = (cell[o] * nyg + jy[o]) * nxg + ix[o]
        flat = flat.at[lin].add(jnp.full((N,), 1e-9), mode="drop")
        return flat.reshape(acc.shape)

    run("argsort + 1-idx       ", sortcost, acc0, ix, jy, cell)


if __name__ == "__main__":
    main()
