"""Named-section timing for the simulation loop.

The reference instruments its phases with mpif_mtime('sectionname')
pairs (mpi_mod.f90:2396-2464) and prints a per-section table at run end
(timemanager_mpi.f90 + FLEXPART_MPI.f90:465-480).  Here each section
optionally SYNCS on its device outputs (jax.block_until_ready) so the
measured wall time includes the asynchronously-dispatched device work
of that phase — without sync, JAX's async dispatch would attribute
almost everything to whichever section happens to block first.

Zero overhead when disabled: sections only accumulate host wall time at
the existing granularity and never force a device sync.  Use
``Simulation(profile=True)`` / CLI ``--profile``; a jax.profiler trace
(for xprof/tensorboard) can additionally be captured with
``trace_dir=...``.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class SectionTimers:
    def __init__(self, device_sync: bool = False):
        self.device_sync = device_sync
        self.seconds: dict[str, float] = {}
        self.calls: dict[str, int] = {}

    @contextmanager
    def section(self, name: str, sync=None):
        """Time a phase.  `sync` is a pytree of device values produced
        by the phase (a lambda returning it is also accepted, evaluated
        at exit); with device_sync the timer blocks on it so the device
        time lands in this section."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.device_sync and sync is not None:
                import jax
                v = sync() if callable(sync) else sync
                jax.block_until_ready(v)
            self.seconds[name] = (self.seconds.get(name, 0.0)
                                  + time.perf_counter() - t0)
            self.calls[name] = self.calls.get(name, 0) + 1

    def add(self, name: str, dt: float):
        self.seconds[name] = self.seconds.get(name, 0.0) + dt
        self.calls[name] = self.calls.get(name, 0) + 1

    def report(self, extra: dict | None = None) -> str:
        """Per-section table like the reference's end-of-run timing
        output (FLEXPART_MPI.f90:465-480)."""
        total = sum(self.seconds.values())
        lines = [f"{'section':<14} {'seconds':>10} {'calls':>8} {'%':>6}"]
        for name, s in sorted(self.seconds.items(),
                              key=lambda kv: -kv[1]):
            pct = 100.0 * s / total if total > 0 else 0.0
            lines.append(f"{name:<14} {s:>10.3f} {self.calls[name]:>8d}"
                         f" {pct:>6.1f}")
        lines.append(f"{'TOTAL':<14} {total:>10.3f}")
        for k, v in (extra or {}).items():
            lines.append(f"{k:<14} {v}")
        return "\n".join(lines)
