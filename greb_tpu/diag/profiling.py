"""Tracing / profiling / runtime-health subsystem.

The reference has no observability beyond an unused gprof flag and three
timer variables (Makefile:10, src/greb.f90:126; SURVEY §5).  Here:

- ``phase_timer``   : wall-clock per-phase timing with derived throughput
                      (sim-yr/s, grid-point-steps/s).
- ``trace``         : context manager around ``jax.profiler`` producing a
                      TensorBoard-loadable device trace.
- ``check_finite``  : runtime NaN/Inf detection over a pytree (the TPU
                      equivalent of the reference debug build's
                      ``-ffpe-trap``), raising with the offending leaf names.
- ``RunMetrics``    : accumulates per-year scalars (global-mean Ts, CO2,
                      wall time) and serializes to JSONL for dashboards.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


@dataclass
class PhaseStats:
    name: str
    wall_s: float
    sim_years: int = 0
    grid_points: int = 0
    steps_per_year: int = 0

    @property
    def sim_yr_per_s(self) -> float:
        return self.sim_years / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def point_steps_per_s(self) -> float:
        return (self.grid_points * self.steps_per_year * self.sim_years
                / self.wall_s) if self.wall_s > 0 else 0.0


class phase_timer(contextlib.AbstractContextManager):
    """with phase_timer("scenario", sim_years=50, num=num) as t: ...
    -> t.stats has throughput numbers after the block."""

    def __init__(self, name: str, sim_years: int = 0, num=None,
                 verbose: bool = False):
        self.name = name
        self.sim_years = sim_years
        self.num = num
        self.verbose = verbose
        self.stats: Optional[PhaseStats] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        wall = time.perf_counter() - self._t0
        gp = (self.num.xdim * self.num.ydim) if self.num else 0
        spy = self.num.nstep_yr if self.num else 0
        self.stats = PhaseStats(self.name, wall, self.sim_years, gp, spy)
        if self.verbose:
            s = self.stats
            print(f"% [{s.name}] {s.wall_s:.2f}s"
                  + (f" | {s.sim_yr_per_s:.2f} sim-yr/s"
                     f" | {s.point_steps_per_s:.3e} point-steps/s"
                     if s.sim_years else ""))
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_finite(tree, name: str = "state") -> None:
    """Raise FloatingPointError naming every non-finite leaf.  The runtime
    analog of the reference debug build's FPE traps (Makefile:10)."""
    bad: List[str] = []
    leaves, treedef = jax.tree.flatten_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            n = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}{jax.tree_util.keystr(path)}: {n} non-finite")
    if bad:
        raise FloatingPointError("; ".join(bad))


@dataclass
class RunMetrics:
    """Per-year scalar metrics, serializable to JSONL."""
    records: List[Dict] = field(default_factory=list)

    def log_year(self, year: int, co2: float, global_mean_ts: float,
                 wall_s: float, **extra) -> None:
        rec = dict(year=year, co2=float(co2),
                   global_mean_ts=float(global_mean_ts),
                   wall_s=float(wall_s), **extra)
        self.records.append(rec)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")

    @classmethod
    def load(cls, path: str) -> "RunMetrics":
        with open(path) as f:
            return cls(records=[json.loads(line) for line in f if line.strip()])
