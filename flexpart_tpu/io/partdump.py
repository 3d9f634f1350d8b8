"""Particle dumps + warm start + full checkpointing.

Two layers:
  * reference-compatible `partposit_*` files (Fortran unformatted
    little-endian records, exactly partoutput.f90:160-168's layout:
    itime record, then one record per live particle with
    (npoint, lon, lat, z, itramem, topo, pv, qv, rho, hmix, tropo, T,
    mass...), sentinel -99999 record) — readable by FLEXPART
    post-processing tools, and readable back for IPIN=1 warm starts
    (readpartpositions.f90:88-131), including dumps produced by the
    reference binary itself;
  * a native full checkpoint (.npz) carrying the complete SoA particle
    state, RNG key, accumulators and convective CBMF memory — resume is
    bit-exact, strictly stronger than the reference's warm start which
    loses turbulence memory and accumulated grids (SURVEY.md §5).
"""

from __future__ import annotations

import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.interp import (horiz_weights, interp_2d, vert_weights)
from ..core.state import ITRA_INACTIVE, Particles, empty_particles
from ..met.fields import (F2_HMIX, F2_ORO, F2_TROPO, F3_PV, F3_QV, F3_RHO,
                          F3_TT)


@jax.jit
def particle_diagnostics(p: Particles, z0, z1, tw0, tw1):
    """Met quantities at each particle for the dump record
    (partoutput.f90:90-158): topo, pv, qv, rho, hmix, tropopause, T."""
    ny, nx = z0.f2d.shape[1], z0.f2d.shape[2]
    hw = horiz_weights(p.x, p.y, nx, ny, False)
    f2_0 = interp_2d(z0.f2d, (F2_ORO, F2_HMIX, F2_TROPO), hw)
    f2_1 = interp_2d(z1.f2d, (F2_ORO, F2_HMIX, F2_TROPO), hw)
    topo, hmix, tropo = f2_0 * tw0 + f2_1 * tw1
    indz, dz1 = vert_weights(p.z, z0.height)

    def interp3(zf, fid):
        flat = zf.f3d[fid].reshape(zf.f3d.shape[1], -1)
        lo = jnp.einsum("nc,nc->n", flat[indz[:, None], hw.idx4], hw.p4)
        hi = jnp.einsum("nc,nc->n", flat[indz[:, None] + 1, hw.idx4], hw.p4)
        return lo * (1.0 - dz1) + hi * dz1

    pv = interp3(z0, F3_PV) * tw0 + interp3(z1, F3_PV) * tw1
    qv = interp3(z0, F3_QV) * tw0 + interp3(z1, F3_QV) * tw1
    rho = interp3(z0, F3_RHO) * tw0 + interp3(z1, F3_RHO) * tw1
    tt = interp3(z0, F3_TT) * tw0 + interp3(z1, F3_TT) * tw1
    return topo, pv, qv, rho, hmix, tropo, tt


def write_partposit(path, itime: int, p: Particles, grid, diag,
                    only_current: bool = True):
    """Write one reference-format particle dump.  diag = output of
    particle_diagnostics (host numpy ok)."""
    topo, pv, qv, rho, hmix, tropo, tt = (np.asarray(d) for d in diag)
    live = np.asarray(p.active)
    if only_current:
        live = live & (np.asarray(p.itra) == itime)
    x = np.asarray(p.x)
    y = np.asarray(p.y)
    z = np.asarray(p.z)
    npoint = np.asarray(p.npoint)
    itramem = np.asarray(p.itramem)
    mass = np.asarray(p.mass)
    nspec = mass.shape[1]

    def rec(payload: bytes):
        return struct.pack("<i", len(payload)) + payload \
            + struct.pack("<i", len(payload))

    with open(path, "wb") as f:
        f.write(rec(struct.pack("<i", int(itime))))
        idx = np.nonzero(live)[0]
        lon = grid.xlon0 + x * grid.dx
        lat = grid.ylat0 + y * grid.dy
        for i in idx:
            vals = [int(npoint[i]) + 1, float(lon[i]), float(lat[i]),
                    float(z[i]), int(itramem[i]), float(topo[i]),
                    float(pv[i]), float(qv[i]), float(rho[i]),
                    float(hmix[i]), float(tropo[i]), float(tt[i])] \
                + [float(m) for m in mass[i]]
            payload = struct.pack("<ifffi", *vals[:5]) \
                + struct.pack("<%df" % (7 + nspec), *vals[5:])
            f.write(rec(payload))
        sent = struct.pack("<ifffi", -99999, -9999.9, -9999.9, -9999.9,
                           -99999) \
            + struct.pack("<%df" % (7 + nspec), *([-9999.9] * (7 + nspec)))
        f.write(rec(sent))


def read_partposit(path, nspec: int):
    """Parse a partposit file (ours or the reference binary's).
    Returns (itime, dict of arrays)."""
    data = Path(path).read_bytes()
    off = 0

    def rec():
        nonlocal off
        (n,) = struct.unpack_from("<i", data, off)
        payload = data[off + 4: off + 4 + n]
        off += 8 + n
        return payload

    itime = struct.unpack("<i", rec())[0]
    rows = []
    while off < len(data):
        payload = rec()
        head = struct.unpack_from("<ifffi", payload, 0)
        if head[0] == -99999:
            break
        rest = struct.unpack_from("<%df" % (7 + nspec), payload, 20)
        rows.append(head + rest)
    if not rows:
        return itime, {}
    a = np.array(rows)
    return itime, dict(
        npoint=a[:, 0].astype(np.int32) - 1, lon=a[:, 1], lat=a[:, 2],
        z=a[:, 3], itramem=a[:, 4].astype(np.int32),
        mass=a[:, 12:12 + nspec])


def particles_from_partposit(path, nspec: int, grid, capacity: int,
                             nclassunc: int = 1, seed: int = 7):
    """Warm start (IPIN=1): rebuild the SoA particle state from a dump
    (readpartpositions.f90:100-131).  Turbulence memory restarts at zero
    (the reference re-draws it via `initialize`)."""
    itime, d = read_partposit(path, nspec)
    n = len(d["z"]) if d else 0
    if capacity < n:
        raise ValueError(f"capacity {capacity} < dumped particles {n}")
    p = empty_particles(capacity, nspec)
    if n == 0:
        return itime, p
    rng = np.random.default_rng(seed)
    x = (d["lon"] - grid.xlon0) / grid.dx
    y = (d["lat"] - grid.ylat0) / grid.dy
    idx = np.arange(n)
    return itime, p._replace(
        x_hi=p.x_hi.at[idx].set(x.astype(np.float32)),
        y_hi=p.y_hi.at[idx].set(y.astype(np.float32)),
        z=p.z.at[idx].set(d["z"].astype(np.float32)),
        itra=p.itra.at[idx].set(0),
        itramem=p.itramem.at[idx].set(d["itramem"]),
        npoint=p.npoint.at[idx].set(d["npoint"]),
        nclass=p.nclass.at[idx].set(
            rng.integers(0, nclassunc, size=n).astype(np.int32)),
        mass=p.mass.at[idx].set(d["mass"].astype(np.float32)),
        mass0=p.mass0.at[idx].set(d["mass"].astype(np.float32)),
        active=p.active.at[idx].set(True),
    )


# ---------------------------------------------------------------------------
# native full checkpoint
# ---------------------------------------------------------------------------

def save_checkpoint(path, sim, itime: int):
    """Full state: particles + accumulators + RNG + CBMF (SURVEY.md §5:
    strictly better than the reference warm start)."""
    state = {"itime": np.int64(itime),
             "key": np.asarray(sim._key)}
    for name, arr in sim.particles._asdict().items():
        state["p_" + name] = np.asarray(arr)
    for name, arr in sim.acc._asdict().items():
        state["acc_" + name] = np.asarray(arr)
    if getattr(sim, "use_convection", False):
        state["cbmf"] = np.asarray(sim.cbmf)
    if sim._height is not None:
        # the fixed vertical grid is derived from the FIRST met field
        # seen (verttransform_ecmwf.f90:153-165 one-time init); persist
        # it so a resumed run interpolates on the identical grid
        state["height"] = np.asarray(sim._height)
    np.savez_compressed(path, **state)


def load_checkpoint(path, sim):
    """Restore a checkpoint into a Simulation; returns resume itime."""
    d = np.load(path)
    sim.particles = Particles(**{
        name: jnp.asarray(d["p_" + name])
        for name in Particles._fields})
    from ..grid.outgrid import Accumulators
    sim.acc = Accumulators(**{
        name: jnp.asarray(d["acc_" + name])
        for name in Accumulators._fields})
    sim._key = jnp.asarray(d["key"])
    if "height" in d:
        sim._height = jnp.asarray(d["height"])
    if "cbmf" in d and getattr(sim, "use_convection", False):
        sim.cbmf = jnp.asarray(d["cbmf"])
    return int(d["itime"])
