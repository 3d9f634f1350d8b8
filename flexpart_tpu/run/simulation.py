"""The simulation driver — scheduler equivalent of timemanager.f90.

Host-side control loop; ALL per-particle compute stays on device in jitted
kernels.  Per sync interval (timemanager.f90:152-712):

  1. keep two processed wind fields buffered around itime (getfields.f90
     double buffer; here: backend fetch + jitted process_eta/calcpar);
  2. activate scheduled releases (mask flip, core/release.py);
  3. sample concentrations into the device accumulator (conccalc) on the
     loutsample cadence with the reference's half-weight edge rule
     (timemanager.f90:350-365);
  4. at averaging-interval end: normalize (factor3d, concoutput.f90:210-221),
     copy to host, write, zero accumulators;
  5. advance all particles one lsynctime (core/advance.py);
  6. apply decay/terminations.
"""

from __future__ import annotations

import dataclasses
import logging
import time as _time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AgeClasses, Command, OutGrid, Releases
from ..core import (StepConfig, StepParams, activate, advance_all,
                    build_release_schedule)
from ..core.state import Particles
from ..grid.conccalc import ConcConfig, make_conccalc
from ..grid.outgrid import (Accumulators, OutputGridGeometry,
                            zero_accumulators)
from ..io.writer import OutputWriter
from ..met import calcpar, compute_heights, process_eta
from ..met.grid import MetGrid
from ..utils.dates import add_seconds

log = logging.getLogger("flexpart_tpu")


@dataclasses.dataclass
class Simulation:
    cmd: Command
    releases: Releases
    grid: MetGrid
    met_backend: Any              # .fetch(time_seconds) -> EtaFields
    outgrid: OutGrid
    ageclasses: AgeClasses = AgeClasses()
    outdir: str = "output"
    capacity: int | None = None
    nclassunc: int = 1
    seed: int = 1234
    wind_interval: int = 3600     # seconds between met fields
    use_clwc: bool = False
    write_netcdf: bool = True
    write_npz: bool = True

    def __post_init__(self):
        cmd = self.cmd
        self.nspec = self.releases.nspec
        self.numpoint = self.releases.numpoint
        self.geo = OutputGridGeometry(self.outgrid, self.grid)
        nage = self.ageclasses.nageclass

        sp0 = self.releases.species[0]
        sc = sp0.size_classes()
        self.step_cfg = StepConfig(
            nx=self.grid.nx, ny=self.grid.ny, nz=self.grid.nlev,
            xglobal=self.grid.xglobal,
            ldirect=cmd.ldirect,
            turbswitch=cmd.turbswitch, ifine=cmd.ifine_eff,
            method=cmd.method,
            nspec=self.nspec,
            settling=sc is not None and sp0.density > 0.0,
        )
        self.step_prm = StepParams.make(
            dx=self.grid.dx, dy=self.grid.dy, ylat0=self.grid.ylat0,
            dxconst=self.grid.dxconst, dyconst=self.grid.dyconst,
            lsynctime=cmd.lsynctime, fine=cmd.fine,
            ctl=cmd.ctl_eff, lwindinterv=self.wind_interval,
            sp_density=max(sp0.density, -1.0),
            sp_dquer=sp0.dquer,
            sp_cunningham=sc.cunningham if sc else 0.0,
            sp_vsetaver=sc.vsetaver if sc else 0.0,
        )
        self.conc_cfg = ConcConfig(
            nxg=self.geo.nxg, nyg=self.geo.nyg, nzg=self.geo.nzg,
            npointspec=self.numpoint if cmd.ioutputforeachrelease else 1,
            nclassunc=self.nclassunc, nage=nage,
            dxout=self.outgrid.dxout, dyout=self.outgrid.dyout,
            xoutshift=self.geo.xoutshift, youtshift=self.geo.youtshift,
            dx_met=self.grid.dx, dy_met=self.grid.dy,
            ind_samp=cmd.ind_samp,
            ioutputforeachrelease=bool(cmd.ioutputforeachrelease),
        )
        self.conccalc = make_conccalc(self.outgrid.outheights)
        self.lage = jnp.asarray(
            np.asarray(self.ageclasses.lage or (999999999,), np.int32))

        self.particles: Particles = build_release_schedule(
            self.releases, cmd, self.grid, capacity=self.capacity,
            nclassunc=self.nclassunc, seed=self.seed)
        self.acc: Accumulators = zero_accumulators(
            self.geo, self.nspec, self.conc_cfg.npointspec,
            self.nclassunc, nage)
        self.writer = OutputWriter(
            outdir=self.outdir,
            outlon0=self.outgrid.outlon0, outlat0=self.outgrid.outlat0,
            dxout=self.outgrid.dxout, dyout=self.outgrid.dyout,
            outheights=self.outgrid.outheights,
            species_names=tuple(s.name for s in self.releases.species),
            start=cmd.bdate, iout=cmd.iout_eff,
            write_netcdf=self.write_netcdf, write_npz=self.write_npz)

        self._height = None
        self._buf: dict[int, Any] = {}   # met_time -> ZFields
        self._key = jax.random.PRNGKey(self.seed)
        self.timings: dict[str, float] = {}

    # ----- met double buffer (getfields.f90:93-196 analog) -----
    def _get_field(self, tsec: int):
        if tsec not in self._buf:
            t0 = _time.perf_counter()
            eta = self.met_backend.fetch(float(tsec))
            if self._height is None:
                self._height = compute_heights(self.grid, eta)
            z = process_eta(self.grid, eta, self._height,
                            use_clwc=self.use_clwc)
            z = calcpar(self.grid, eta, z,
                        lsubgrid=bool(self.cmd.lsubgrid))
            # keep at most 3 buffered fields
            while len(self._buf) >= 3:
                oldest = min(self._buf)
                del self._buf[oldest]
            self._buf[tsec] = z
            self.timings["getfields"] = self.timings.get(
                "getfields", 0.0) + _time.perf_counter() - t0
        return self._buf[tsec]

    def _fields_for(self, itime: int):
        wi = self.wind_interval
        t0 = (itime // wi) * wi
        if itime % wi == 0 and self.cmd.ldirect < 0:
            t0 = itime - wi
        t1 = t0 + wi
        return self._get_field(t0), self._get_field(t1), t0, t1

    # ----- main loop -----
    def run(self, progress: bool = False):
        cmd = self.cmd
        lsync = cmd.lsynctime * cmd.ldirect
        ideltas = cmd.ideltas
        loutnext = cmd.loutstep * cmd.ldirect
        loutaver = cmd.loutaver * cmd.ldirect
        loutstart = loutnext - loutaver // 2
        loutend = loutnext + loutaver // 2
        loutsample = cmd.loutsample * cmd.ldirect

        nsteps = abs(ideltas) // abs(lsync)
        t_wall0 = _time.perf_counter()
        particle_steps = 0

        for istep in range(nsteps + 1):
            itime = istep * lsync
            z0, z1, mt0, mt1 = self._fields_for(itime)

            # releases
            self.particles = activate(self.particles, jnp.int32(itime))

            # sampling (timemanager.f90:350-365)
            ld = cmd.ldirect
            if (ld * itime >= ld * loutstart and ld * itime <= ld * loutend
                    and (itime - loutstart) % loutsample == 0):
                weight = 0.5 if itime in (loutstart, loutend) else 1.0
                self.acc = self.conccalc(
                    self.acc, self.particles, z1, jnp.int32(itime),
                    self.lage, jnp.float32(weight), self.conc_cfg)

            # output (timemanager.f90:376-464)
            if itime == loutend and float(self.acc.outnum) > 0:
                self._write_output(itime)
                loutnext = loutnext + cmd.loutstep * ld
                loutstart = loutnext - loutaver // 2
                loutend = loutnext + loutaver // 2
                if itime == loutstart:
                    self.acc = self.conccalc(
                        self.acc, self.particles, z1, jnp.int32(itime),
                        self.lage, jnp.float32(0.5), self.conc_cfg)

            if itime == ideltas:
                break

            # advance
            t0 = _time.perf_counter()
            key = jax.random.fold_in(self._key, istep)
            self.particles, diag = advance_all(
                self.particles, z0, z1, jnp.int32(itime),
                jnp.int32(mt0), jnp.int32(mt1), key, self.step_cfg,
                self.step_prm)
            n_act = int(diag.n_active)
            particle_steps += n_act
            self.timings["advance"] = self.timings.get(
                "advance", 0.0) + _time.perf_counter() - t0

            # age-class termination (timemanager.f90:701-707)
            max_age = self.ageclasses.max_age
            if max_age is not None:
                age = jnp.abs(jnp.int32(itime + lsync)
                              - self.particles.itramem)
                self.particles = self.particles._replace(
                    active=self.particles.active & (age <= max_age))

            if progress and istep % 10 == 0:
                log.info("t=%8d s  particles=%8d", itime, n_act)

        self.timings["wall"] = _time.perf_counter() - t_wall0
        self.timings["particle_steps"] = particle_steps
        return self.particles

    # ----- output (concoutput.f90 analog) -----
    def _write_output(self, itime: int):
        acc = jax.device_get(self.acc)
        outnum = float(acc.outnum)
        g = np.asarray(acc.gridunc)  # (nage,nclass,kp,nz,ny,nx,ks)
        # sum over uncertainty classes = total; std over classes = uncertainty
        total = g.sum(axis=1)
        if g.shape[1] > 1:
            unc = g.std(axis=1, ddof=1) * g.shape[1]
        else:
            unc = np.zeros_like(total)
        vol = self.geo.volume  # (nz,ny,nx)
        if self.cmd.ldirect == 1:
            factor = 1.0e12 / vol / outnum
        else:
            factor = np.full_like(vol, abs(self.cmd.loutaver) / outnum)
        conc = total * factor[None, None, :, :, :, None]
        unc = unc * factor[None, None, :, :, :, None]
        # reorder to (nspec, npoint, nage, nz, ny, nx)
        conc = np.moveaxis(conc, -1, 0).transpose(0, 2, 1, 3, 4, 5)
        unc = np.moveaxis(unc, -1, 0).transpose(0, 2, 1, 3, 4, 5)
        when = add_seconds(self.cmd.bdate, itime)
        self.writer.write(when, conc, unc)
        self.acc = zero_accumulators(
            self.geo, self.nspec, self.conc_cfg.npointspec,
            self.nclassunc, self.ageclasses.nageclass)
        log.info("output written at %s (outnum=%.1f)", when, outnum)
