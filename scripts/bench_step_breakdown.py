"""Break the bench step into advance vs conccalc vs RNG with multi-step
chained timing (the only harness the async relay can't elide)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from flexpart_tpu.config import OutGrid
    from flexpart_tpu.core import StepConfig, StepParams, advance_chunked
    from flexpart_tpu.core import rng
    from flexpart_tpu.core.state import empty_particles
    from flexpart_tpu.grid.conccalc import ConcConfig, make_conccalc
    from flexpart_tpu.grid.outgrid import (OutputGridGeometry,
                                           zero_accumulators)
    from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                                  process_eta, uniform_wind_met)

    grid = make_grid(nx=361, ny=181, nlev=30, dx=1.0, dy=1.0,
                     xlon0=-180.0, ylat0=-90.0, xglobal=True)
    met = uniform_wind_met(grid, u=10.0, v=1.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z0 = process_eta(grid, eta, height)
    z0 = calcpar(grid, eta, z0)

    n = 10 * 2 ** 20
    key = jax.random.PRNGKey(0)
    kx, ky, kz = jax.random.split(key, 3)
    p = empty_particles(n)
    p = p._replace(
        x_hi=jax.random.uniform(kx, (n,), minval=30.0, maxval=330.0),
        y_hi=jax.random.uniform(ky, (n,), minval=30.0, maxval=150.0),
        z=jax.random.uniform(kz, (n,), minval=10.0, maxval=8000.0),
        active=jnp.ones(n, bool), itra=jnp.zeros(n, jnp.int32),
        mass=jnp.full((n, 1), 1.0 / n),
    )
    cfg = StepConfig(nx=grid.nx, ny=grid.ny, nz=grid.nlev,
                     xglobal=True, ldirect=1, turbswitch=False, ifine=1,
                     method=0)
    prm = StepParams.make(dx=grid.dx, dy=grid.dy, ylat0=grid.ylat0,
                          dxconst=grid.dxconst, dyconst=grid.dyconst,
                          lsynctime=900, fine=1.0)
    og = OutGrid(outlon0=-180.0, outlat0=-90.0, numxgrid=720,
                 numygrid=360, dxout=0.5, dyout=0.5,
                 outheights=(100.0, 1000.0, 50000.0))
    geo = OutputGridGeometry(og, grid)
    ccfg = ConcConfig(nxg=geo.nxg, nyg=geo.nyg, nzg=geo.nzg,
                      npointspec=1, nclassunc=1, nage=1,
                      dxout=og.dxout, dyout=og.dyout,
                      xoutshift=geo.xoutshift, youtshift=geo.youtshift,
                      dx_met=grid.dx, dy_met=grid.dy, ind_samp=0)
    conccalc = make_conccalc(og.outheights)
    acc = zero_accumulators(geo, 1, 1, 1, 1)
    lage = jnp.asarray(np.asarray([999999999], np.int32))
    n_chunks = n // (2 ** 19)
    NS = 10

    def adv_only(p, itime, k):
        newp, diag = advance_chunked(p, z0, z0, itime, jnp.int32(0),
                                     jnp.int32(86400), k, cfg, prm,
                                     n_chunks)
        return newp

    def cc_only(p, acc, itime):
        return conccalc(acc, p, z0, itime + 900, lage,
                        jnp.float32(1.0), ccfg)

    # warm both
    p1 = adv_only(p, jnp.int32(0), jax.random.PRNGKey(1))
    acc1 = cc_only(p1, acc, jnp.int32(0))
    jax.block_until_ready((p1, acc1))

    t0 = time.perf_counter()
    pc = p
    for i in range(NS):
        pc = adv_only(pc, jnp.int32(i * 900),
                      jax.random.fold_in(jax.random.PRNGKey(2), i))
    jax.block_until_ready(pc)
    dt_adv = (time.perf_counter() - t0) / NS
    print(f"advance only: {dt_adv*1e3:8.1f} ms/step -> "
          f"{n/dt_adv/1e6:6.2f} M psteps/s")

    ac = acc
    t0 = time.perf_counter()
    for i in range(NS):
        ac = cc_only(p1, ac, jnp.int32(i * 900))
    jax.block_until_ready(ac)
    dt_cc = (time.perf_counter() - t0) / NS
    print(f"conccalc only: {dt_cc*1e3:8.1f} ms/step -> "
          f"{n/dt_cc/1e6:6.2f} M psteps/s")

    # rng cost inside advance: chained normals, itra-fed to create dep
    B = 2 ** 19

    @jax.jit
    def rng_chain(k, x, ns):
        def body(i, x):
            kk = jax.random.fold_in(k, i)
            a = rng.normals(kk, (6, B), tag=6)
            b = rng.normals(kk, (2, B), tag=1)
            c = rng.normals(kk, (1, B), tag=2)
            d = rng.normals(kk, (3, B), tag=3)
            e = rng.normals(kk, (3, B), tag=4)
            return x + a.sum(0) + b.sum(0) + c.sum(0) + d.sum(0) + e.sum(0)
        return jax.lax.fori_loop(0, ns, body, x)

    x = jnp.zeros(B)
    r = rng_chain(key, x, 2); _ = np.asarray(r)
    t0 = time.perf_counter()
    r = rng_chain(key, x, 42)
    _ = np.asarray(r)
    dt = (time.perf_counter() - t0) / 42
    print(f"rng 15 normals/chunk: {dt*1e3:8.2f} ms "
          f"(x{n_chunks} chunks = {dt*n_chunks*1e3:6.1f} ms/step)")


if __name__ == "__main__":
    main()
