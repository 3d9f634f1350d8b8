"""Command-line entry point: the FLEXPART.f90 analog.

`python -m flexpart_tpu [pathnames] [-v] [--met synthetic]` reads the
reference's input layout — a `pathnames` file naming the options/,
output/, met-data/ dirs and the AVAILABLE index (readpaths.f90) — parses
COMMAND / RELEASES / SPECIES / OUTGRID / AGECLASSES / RECEPTORS from
options/ (FLEXPART.f90:135-304 call order), builds the Simulation, runs
the time manager, and ends with the reference's success banner
(FLEXPART.f90:471) so downstream tooling that greps for it keeps
working.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

log = logging.getLogger("flexpart_tpu")


def build_simulation(pathnames: str, met: str = "auto",
                     capacity: int | None = None, seed: int = 1234):
    from .config import (AgeClasses, Command, OutGrid, Pathnames, Releases,
                         read_available)
    from .run.simulation import Simulation

    pn = Pathnames.from_file(pathnames)
    opts = pn.options
    cmd = Command.from_file(opts / "COMMAND")
    releases = Releases.from_file(opts / "RELEASES",
                                  species_dir=opts / "SPECIES")
    outgrid = OutGrid.from_file(opts / "OUTGRID")
    age_path = opts / "AGECLASSES"
    ageclasses = (AgeClasses.from_file(age_path) if age_path.exists()
                  else AgeClasses())

    wind_interval = 3600
    if met == "synthetic":
        from .met import SyntheticMet, make_grid
        grid = make_grid(nx=73, ny=37, nlev=28, dx=5.0, dy=5.0)
        backend = SyntheticMet(grid)
    else:
        entries = read_available(pn.available)
        if not entries:
            raise SystemExit(f"AVAILABLE index {pn.available} is empty — "
                             "convert met data or pass --met synthetic")
        first = Path(pn.metdata) / entries[0].filename
        if str(first).endswith(".npz"):
            from .met.npzmet import NpzMet
            backend = NpzMet(metdata=pn.metdata, entries=entries,
                             bdate=cmd.bdate)
        else:
            # GRIB via the native decoder; probe the producing model like
            # detectformat.f90 (ECMWF hybrid-eta vs NCEP isobaric)
            from .met.gfsmet import GfsMet, looks_like_gfs
            if looks_like_gfs(first):
                backend = GfsMet(metdata=pn.metdata, entries=entries,
                                 bdate=cmd.bdate)
            else:
                from .met.gribmet import GribMet
                backend = GribMet(metdata=pn.metdata, entries=entries,
                                  bdate=cmd.bdate)
        grid = backend.grid()
        wind_interval = backend.wind_interval

    sim = Simulation(
        cmd=cmd, releases=releases, grid=grid, met_backend=backend,
        outgrid=outgrid, ageclasses=ageclasses, outdir=str(pn.output),
        capacity=capacity, seed=seed, wind_interval=wind_interval,
        use_clwc=bool(getattr(backend, "sumclouds", False)),
        options_dir=str(opts) if (opts / "IGBP_int1.dat").exists() else None)
    return sim


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="flexpart_tpu",
        description="TPU-native Lagrangian particle dispersion model "
                    "(FLEXPART-compatible inputs)")
    ap.add_argument("pathnames", nargs="?", default="pathnames",
                    help="pathnames file (default: ./pathnames)")
    ap.add_argument("-v", "--verbose", action="count", default=0,
                    help="-v info, -vv debug (FLEXPART.f90 -v/-v2)")
    ap.add_argument("--met", default="auto",
                    choices=("auto", "synthetic"),
                    help="met backend: AVAILABLE-indexed .npz (auto) or "
                         "the built-in synthetic atmosphere")
    ap.add_argument("--capacity", type=int, default=None,
                    help="particle slot capacity (default: total released)")
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=(logging.DEBUG if args.verbose > 1
               else logging.INFO if args.verbose else logging.WARNING),
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    t0 = time.perf_counter()
    sim = build_simulation(args.pathnames, met=args.met,
                           capacity=args.capacity, seed=args.seed)
    npart = (sim.particles.capacity if sim.particles is not None
             else -1)   # domain-filling builds particles at run start
    log.info("simulation configured: %d particles, grid %dx%dx%d",
             npart, sim.grid.nx, sim.grid.ny, sim.grid.nlev)
    sim.run(progress=args.verbose > 0)
    wall = time.perf_counter() - t0
    psteps = sim.timings.get("particle_steps", 0)
    print(f"Simulated {abs(sim.cmd.ideltas)} s, "
          f"{psteps} particle-steps in {wall:.1f} s wall "
          f"({psteps / max(wall, 1e-9):,.0f} psteps/s)")
    print("CONGRATULATIONS: YOU HAVE SUCCESSFULLY COMPLETED A FLEXPART "
          "MODEL RUN!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
