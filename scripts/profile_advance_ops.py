"""Op-level profile of one advance step via jax.profiler.ProfileData."""
import collections
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import os
import tempfile

import jax
import jax.numpy as jnp


def main():
    from flexpart_tpu.core import StepConfig, StepParams, advance_chunked
    from flexpart_tpu.core.state import empty_particles
    from flexpart_tpu.met import (calcpar, compute_heights, make_grid,
                                  process_eta, uniform_wind_met)

    grid = make_grid(nx=361, ny=181, nlev=30, dx=1.0, dy=1.0,
                     xlon0=-180.0, ylat0=-90.0, xglobal=True)
    met = uniform_wind_met(grid, u=10.0, v=1.0)
    eta = met.fetch(0.0)
    height = compute_heights(grid, eta)
    z0 = process_eta(grid, eta, height)
    z0 = calcpar(grid, eta, z0)

    n = 2 ** 21
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

    def adv(p, i):
        newp, _ = advance_chunked(p, z0, z0, jnp.int32(i * 900),
                                  jnp.int32(0), jnp.int32(86400),
                                  jax.random.fold_in(key, i), cfg, prm, 4)
        return newp

    p1 = adv(p, 0)
    jax.block_until_ready(p1)

    tmp = tempfile.mkdtemp()
    with jax.profiler.trace(tmp):
        pc = p1
        for i in range(1, 4):
            pc = adv(pc, i)
        jax.block_until_ready(pc)

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    per_op = collections.Counter()
    meta = {}
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
                for st in ev.stats:
                    try:
                        if "source" in str(st.name).lower():
                            meta[ev.name] = str(st.value)[:90]
                    except Exception:
                        pass
    total = sum(per_op.values())
    print(f"sum of XLA Ops events: {total/1e6:.1f} ms over 3 steps "
          f"(2M particles, 4 chunks)")
    for name, dur in per_op.most_common(35):
        print(f"{dur/1e6:9.2f} ms  {name[:70]:70s} {meta.get(name, '')}")


if __name__ == "__main__":
    main()
