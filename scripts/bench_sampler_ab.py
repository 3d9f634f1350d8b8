"""A/B the two met-sampling layouts of the advance hot path on the chip.

Old (round-3) layout: StepTables — blended (5, nz, ny, nx) stack gathered
with 8 indices/particle (2 levels x 4 corners) + a packed (8, ny, nx) 2-D
table gathered with 4 indices.
New (round-4) layout: StepTablesPaired — level-paired (15, nz-1, ny, nx)
stack gathered with 4 indices/particle.

All tables are passed as ARGUMENTS (not closure constants) so nothing is
baked into the executable.
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
    from flexpart_tpu.core.interp import (
        build_step_tables, build_step_tables_paired, horiz_weights,
        interp_wind_blended, interp_wind_short_blended,
        interp_wind_short_paired, sample_2d_packed, sample_all_paired,
        vert_weights)
    from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                                  process_eta, uniform_wind_met)

    print("devices:", jax.devices())
    grid = make_grid(nx=361, ny=181, nlev=30, dx=1.0, dy=1.0,
                     xlon0=-180.0, ylat0=-90.0, xglobal=True)
    met = uniform_wind_met(grid, u=10.0, v=1.0)
    eta = met.fetch(0.0)
    height = jnp.asarray(compute_heights(grid, eta))
    z0 = process_eta(grid, eta, height)
    z0 = calcpar(grid, eta, z0)

    B = 2 ** 19
    key = jax.random.PRNGKey(0)
    kx, ky, kz = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (B,), minval=30.0, maxval=330.0)
    y = jax.random.uniform(ky, (B,), minval=30.0, maxval=150.0)
    z = jax.random.uniform(kz, (B,), minval=10.0, maxval=8000.0)

    half = jnp.float32(0.5)
    told = jax.jit(build_step_tables)(z0, z0, half, half, half, half)
    tnew = jax.jit(build_step_tables_paired)(z0, z0, half, half, half, half)
    jax.block_until_ready((told, tnew))

    @jax.jit
    def old_full(told, x, y, z):
        hw = horiz_weights(x, y, grid.nx, grid.ny, True)
        indz, dz1 = vert_weights(z, height)
        s2 = sample_2d_packed(told.pack2, hw, x, y)
        w = interp_wind_blended(told.f3dt, hw, indz, dz1)
        c = interp_wind_short_blended(told.f3de, hw, indz, dz1)
        return s2, w, c

    @jax.jit
    def new_full(tnew, x, y, z):
        hw = horiz_weights(x, y, grid.nx, grid.ny, True)
        indz, dz1 = vert_weights(z, height)
        s = sample_all_paired(tnew, hw, indz, dz1, x, y)
        c = interp_wind_short_paired(tnew.packE, hw, indz, dz1)
        return s, c

    t = timeit(old_full, told, x, y, z)
    print(f"OLD blended (8idx x5 + 8idx x3 + 4idx x8): {t*1e3:8.2f} ms "
          f"-> {B/t/1e6:7.2f} M/s")
    t = timeit(new_full, tnew, x, y, z)
    print(f"NEW paired  (4idx x15 + 4idx x6):          {t*1e3:8.2f} ms "
          f"-> {B/t/1e6:7.2f} M/s")

    # isolate: main sample only
    @jax.jit
    def old_main(told, x, y, z):
        hw = horiz_weights(x, y, grid.nx, grid.ny, True)
        indz, dz1 = vert_weights(z, height)
        s2 = sample_2d_packed(told.pack2, hw, x, y)
        w = interp_wind_blended(told.f3dt, hw, indz, dz1)
        return s2, w

    @jax.jit
    def new_main(tnew, x, y, z):
        hw = horiz_weights(x, y, grid.nx, grid.ny, True)
        indz, dz1 = vert_weights(z, height)
        return sample_all_paired(tnew, hw, indz, dz1, x, y)

    t = timeit(old_main, told, x, y, z)
    print(f"OLD main sample:                           {t*1e3:8.2f} ms")
    t = timeit(new_main, tnew, x, y, z)
    print(f"NEW main sample:                           {t*1e3:8.2f} ms")

    # raw gather cost by table height at fixed 4 indices/particle
    hw = jax.jit(lambda x, y: horiz_weights(x, y, grid.nx, grid.ny,
                                            True))(x, y)
    indz, _ = jax.jit(lambda z: vert_weights(z, height))(z)
    nzp = grid.nlev - 1
    ny_nx = grid.ny * grid.nx
    lin4 = indz[None] * ny_nx + hw.idx4.T                 # (4, N)
    lin8 = jnp.concatenate([lin4, lin4 + ny_nx], 0)       # (8, N)
    jax.block_until_ready((lin4, lin8))
    for F, name in ((5, "h5"), (8, "h8"), (10, "h10"), (15, "h15"),
                    (16, "h16")):
        tbl = jax.random.normal(jax.random.PRNGKey(F),
                                (F, nzp * ny_nx), jnp.float32)

        @jax.jit
        def take4(tbl, lin4):
            return tbl[:, lin4].sum(axis=(0, 1))

        t = timeit(take4, tbl, lin4)
        print(f"gather 4 idx, height {F:2d}: {t*1e3:8.2f} ms "
              f"({4*F*4*B/t/1e9:6.1f} GB/s)")
    tbl8 = jax.random.normal(jax.random.PRNGKey(99),
                             (5, (nzp + 1) * ny_nx), jnp.float32)

    @jax.jit
    def take8(tbl8, lin8):
        return tbl8[:, lin8].sum(axis=(0, 1))

    t = timeit(take8, tbl8, lin8)
    print(f"gather 8 idx, height  5: {t*1e3:8.2f} ms "
          f"({8*5*4*B/t/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
