"""Particle release.

Re-design of /root/reference/src/releaseparticles.f90.  The reference
searches for free slots per released particle inside the time loop; here the
whole release schedule is *precomputed* at init: every particle slot is
assigned its release box, release time (sync-aligned), random in-box
position and per-species mass up front (deterministic given config+seed),
and "release" during time stepping is a pure mask flip on device
(`activate`).  This is equivalent for fixed release plans (the only kind the
RELEASES file can express: each box emits npart particles uniformly over
[start, end], releaseparticles.f90:108-127) and removes the only dynamic
allocation from the hot loop.  Splitting/domain-fill use prefix-sum slot
allocation instead (see grid/domainfill.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Command, Releases
from ..met.grid import MetGrid
from .state import ITRA_INACTIVE, Particles, empty_particles


def build_release_schedule(rel: Releases, cmd: Command, grid: MetGrid,
                           capacity: int | None = None,
                           nclassunc: int = 1,
                           seed: int = 42,
                           bkdep: int = 0) -> Particles:
    """Host-side: build the full particle population, all inactive, with
    itra = sync-aligned release time.

    bkdep: 3 (WETBKDEP) / 4 (DRYBKDEP) backward deposition modes force
    the release height to 0-20 km / 0-2*href (readcommand.f90:322-337)
    and mark the scavenging factor xscav = -1 (to be computed at the
    particle's first step, timemanager.f90:565-598)."""
    t0 = cmd.bdate
    lsync = cmd.lsynctime * cmd.ldirect
    total = rel.total_particles
    if capacity is None:
        capacity = total
    if capacity < total:
        raise ValueError(f"capacity {capacity} < total particles {total}")
    nspec = rel.nspec
    rng = np.random.default_rng(seed)

    xs = np.zeros(total, np.float32)
    ys = np.zeros(total, np.float32)
    zs = np.zeros(total, np.float32)
    itra = np.full(total, ITRA_INACTIVE, np.int64)
    npoint = np.zeros(total, np.int32)
    mass = np.zeros((total, nspec), np.float32)

    off = 0
    for b_idx, box in enumerate(rel.boxes):
        nparts = box.parts
        sl = slice(off, off + nparts)
        x1, y1 = grid.lonlat_to_grid(box.lon1, box.lat1)
        x2, y2 = grid.lonlat_to_grid(box.lon2, box.lat2)
        xs[sl] = x1 + rng.random(nparts) * (x2 - x1)
        ys[sl] = y1 + rng.random(nparts) * (y2 - y1)
        if bkdep == 3:          # wet dep sensitivity: full column
            bz1, bz2 = 0.0, 20000.0
        elif bkdep == 4:        # dry dep sensitivity: 2*href layer
            bz1, bz2 = 0.0, 30.0
        else:
            bz1, bz2 = box.z1, box.z2
        zs[sl] = bz1 + rng.random(nparts) * (bz2 - bz1)

        # release times: uniform spread over the window, aligned to sync
        # steps (releaseparticles.f90:108-127, uniform-midpoint variant)
        rt1 = int((box.start - t0).total_seconds()) * 1
        rt2 = int((box.end - t0).total_seconds()) * 1
        if cmd.ldirect < 0:
            rt1, rt2 = -rt2, -rt1  # backward runs count seconds backwards
        if rt2 <= rt1:
            tsec = np.full(nparts, rt1)
        else:
            tsec = rt1 + (np.arange(nparts) + 0.5) / nparts * (rt2 - rt1)
        step = np.floor_divide(tsec, abs(cmd.lsynctime)).astype(np.int64)
        itra[sl] = step * abs(cmd.lsynctime) * np.sign(lsync)

        npoint[sl] = b_idx
        for k in range(nspec):
            m = box.mass[k] if k < len(box.mass) else 0.0
            mass[sl, k] = m / nparts
        off += nparts

    p = empty_particles(capacity, nspec)
    idx = np.arange(total)
    nclass = rng.integers(0, nclassunc, size=total)
    # next-split time: release time + ldirect*itsplit
    # (releaseparticles.f90:187), clipped into i32
    itrasplit = np.clip(itra + cmd.ldirect * min(cmd.itsplit, 999999999),
                        -999999998, 999999999)
    return p._replace(
        x_hi=p.x_hi.at[idx].set(xs),
        y_hi=p.y_hi.at[idx].set(ys),
        z=p.z.at[idx].set(zs),
        itra=p.itra.at[idx].set(itra.astype(np.int32)),
        itramem=p.itramem.at[idx].set(itra.astype(np.int32)),
        itrasplit=p.itrasplit.at[idx].set(itrasplit.astype(np.int32)),
        npoint=p.npoint.at[idx].set(npoint),
        nclass=p.nclass.at[idx].set(nclass.astype(np.int32)),
        mass=p.mass.at[idx].set(mass),
        mass0=p.mass0.at[idx].set(mass),
        xscav=(p.xscav.at[idx].set(-1.0) if bkdep else p.xscav),
    )


@jax.jit
def activate(p: Particles, itime) -> Particles:
    """Flip scheduled releases live for this sync step.  Turbulent velocity
    memory starts at zero (the reference draws an initial value from local
    sigmas, initialize.f90:4-40; the OU chain equilibrates within a few TL —
    the difference decays in the first couple of substeps)."""
    newly = (~p.active) & (p.itra == itime) & (p.itra != ITRA_INACTIVE)
    return p._replace(
        active=p.active | newly,
        up=jnp.where(newly, 0.0, p.up),
        vp=jnp.where(newly, 0.0, p.vp),
        wp=jnp.where(newly, 0.0, p.wp),
        cbt=jnp.where(newly, 1, p.cbt).astype(jnp.int8),
    )
