"""Multi-chip parallelism: particle sharding, partial accumulators."""
from .sharding import (PARTICLE_AXIS, make_sharded_advance,
                       make_sharded_conccalc, make_sharded_depo_scatter,
                       pad_particles, particle_mesh,
                       particle_sharding, reduce_acc_partials, replicate,
                       shard_particles, zero_acc_partials)
