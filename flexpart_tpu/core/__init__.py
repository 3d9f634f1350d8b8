"""Core particle engine: state, RNG, interpolation, turbulence, advance."""
from .state import Particles, empty_particles, ITRA_INACTIVE, ds_add
from .advance import StepConfig, StepParams, advance_all, advance_chunked
from .release import build_release_schedule, activate
from .split import split_particles
