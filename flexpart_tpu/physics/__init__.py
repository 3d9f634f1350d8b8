"""Physics: deposition, decay, chemistry, convection."""
from .landuse import (assign_landuse, read_landuse_inventory, read_surfdata,
                      read_surfdepo, seasonal_category)
from .drydepo import DrydepTables, build_drydep_tables, make_vdep_kernel
from .wetdepo import WetSpecies, make_depokernel, wetscav_all
from .massupdate import (MassSpecies, apply_decay_drydep, apply_wetdepo,
                         decay_deposition_grids)


def setup_drydep(options_dir, grid, species, lsm, mmdd: int):
    """Load landuse + Wesely tables from an options/ dir (IGBP_int1.dat,
    surfdata.t, surfdepo.t — the reference's input data files) and build
    the static dry-deposition tables for this run."""
    import numpy as np
    from pathlib import Path
    d = Path(options_dir)
    inv = read_landuse_inventory(d / "IGBP_int1.dat")
    z0 = read_surfdata(d / "surfdata.t")
    tables = read_surfdepo(d / "surfdepo.t")
    xlanduse = assign_landuse(grid.nx, grid.ny, grid.dx, grid.dy,
                              grid.xlon0, grid.ylat0,
                              np.asarray(lsm), inv)
    return build_drydep_tables(species, xlanduse, z0, tables, mmdd,
                               grid.ylat0, grid.dy, grid.ny)
from .convection import (convect_columns, make_convection_kernel,
                         nconvlev_from_grid, redist_particles)
