"""Particle splitting (timemanager.f90:473-504).

At every output time with ldirect*itime >= ldirect*itsplit, every live
particle whose next-split time has passed is duplicated: parent and child
each get half the parent's mass, all other state is copied, and the
next-split interval doubles (itrasplit = 2*(itrasplit-itramem)+itramem).

The reference appends children at the end of the growing particle arrays
and silently stops splitting at maxpart; here children are scattered into
free slots of the fixed-capacity SoA state by prefix-sum rank matching
(k-th due parent -> k-th free slot), and parents without a free slot keep
their full mass (same behavior as the reference's maxpart guard).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .state import ITRA_INACTIVE, Particles


@partial(jax.jit, static_argnames=("ldirect",))
def split_particles(p: Particles, itime, ldirect: int = 1) -> Particles:
    n = p.capacity
    due = (p.active & (p.itrasplit != ITRA_INACTIVE)
           & (ldirect * itime >= ldirect * p.itrasplit))

    # a slot is free if inactive and not a scheduled future release
    # (not-yet-released slots still have itra == itramem == release time)
    free = (~p.active) & ((p.itra == ITRA_INACTIVE) | (p.itra != p.itramem))

    free_rank = jnp.cumsum(free) - 1                       # rank among free
    n_free = free_rank[-1] + 1
    # slot index of the r-th free slot
    slot_of_rank = jnp.full(n, n, jnp.int32).at[
        jnp.where(free, free_rank, n)].set(jnp.arange(n, dtype=jnp.int32),
                                           mode="drop")
    due_rank = jnp.cumsum(due) - 1
    granted = due & (due_rank < n_free)
    child = jnp.where(granted,
                      slot_of_rank[jnp.clip(due_rank, 0, n - 1)], n)

    # doubled split interval for both parent and child
    # (timemanager.f90:479: itrasplit = 2*(itrasplit-itramem)+itramem)
    # clip the interval before doubling so 2*dt + itramem stays in i32
    dt_split = jnp.clip(p.itrasplit - p.itramem, -499999999, 499999999)
    new_split = jnp.clip(2 * dt_split + p.itramem, -999999998, 999999999)
    half_mass = jnp.where(granted[:, None], p.mass * 0.5, p.mass)

    def copy(field, parent_val):
        return field.at[child].set(parent_val, mode="drop")

    out = {}
    for name in Particles._fields:
        arr = getattr(p, name)
        if name == "mass":
            out[name] = copy(half_mass, half_mass)
        elif name == "mass0":
            out[name] = copy(arr, arr)
        elif name == "itrasplit":
            parent_split = jnp.where(granted, new_split, p.itrasplit)
            out[name] = copy(parent_split, new_split)
        elif name == "active":
            out[name] = copy(arr, jnp.ones_like(arr))
        else:
            out[name] = copy(arr, arr)
    return Particles(**out)
