"""Checkpoint/resume.

The reference has NO checkpointing (a crash loses the run; SURVEY §5).
Here a checkpoint captures everything needed for a bit-exact restart of the
scenario phase (cf. the state the Fortran keeps in module variables):

  - prognostic ModelState (ts, ta, to, q, cap_surf)
  - the 730-slot Corrections tables
  - scalar cursor: (phase, year_index, co2)

Orbax (async, sharded-array aware) is used when available; a NumPy .npz
fallback keeps the feature dependency-free.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np

from ..forcing import Corrections, ModelState


_PHASES = ("flux", "control", "scenario")


@dataclass
class RunCursor:
    phase: str = "scenario"     # "flux" | "control" | "scenario"
    year_index: int = 0
    co2: float = 680.0


def _tree_to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, state: ModelState, corr: Corrections,
                    cursor: RunCursor) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = {}
    for name, v in [("ts", state.ts), ("ta", state.ta), ("to", state.to),
                    ("q", state.q), ("cap_surf", state.cap_surf),
                    ("tf", corr.tf), ("tof", corr.tof), ("qf", corr.qf)]:
        arrays[name] = np.asarray(v)
    np.savez(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "cursor.json"), "w") as f:
        json.dump({"phase": cursor.phase, "year_index": cursor.year_index,
                   "co2": cursor.co2}, f)


def load_checkpoint(path: str) -> Tuple[ModelState, Corrections, RunCursor]:
    z = np.load(os.path.join(path, "state.npz"))
    import jax.numpy as jnp
    state = ModelState(ts=jnp.asarray(z["ts"]), ta=jnp.asarray(z["ta"]),
                       to=jnp.asarray(z["to"]), q=jnp.asarray(z["q"]),
                       cap_surf=jnp.asarray(z["cap_surf"]))
    corr = Corrections(tf=jnp.asarray(z["tf"]), tof=jnp.asarray(z["tof"]),
                       qf=jnp.asarray(z["qf"]))
    with open(os.path.join(path, "cursor.json")) as f:
        c = json.load(f)
    return state, corr, RunCursor(**c)


class Checkpointer:
    """Periodic checkpointing helper with retention.

    Uses Orbax when importable (multi-host-safe, async); otherwise the
    npz path above.
    """

    def __init__(self, directory: str, every_years: int = 10, keep: int = 3):
        self.dir = directory
        self.every = max(1, every_years)
        self.keep = keep
        # device->host snapshot cache for the correction tables: corr is
        # CONSTANT across the scenario phase (learned once in spin-up,
        # src/greb.f90:344-355), but its ~40 MB device->host copy dominated
        # the save cost on tunnelled devices (measured 1.4 s of the 1.7 s
        # save; PERF.md round-5 IO notes) — snapshot once per corr object
        self._corr_ref = None
        self._corr_np = None
        self._mgr = None
        try:
            import orbax.checkpoint as ocp
            self._ocp = ocp
            opts = ocp.CheckpointManagerOptions(max_to_keep=keep)
            self._mgr = ocp.CheckpointManager(os.path.abspath(directory),
                                              options=opts)
        except Exception:
            self._ocp = None

    def maybe_save(self, year_index: int, state: ModelState,
                   corr: Corrections, cursor: RunCursor) -> bool:
        if (year_index + 1) % self.every != 0:
            return False
        self.save(year_index, state, corr, cursor)
        return True

    def save(self, step: int, state: ModelState, corr: Corrections,
             cursor: RunCursor) -> None:
        """Snapshot to host (synchronous, so the caller may mutate state
        freely afterwards) and commit ASYNCHRONOUSLY under orbax: the file
        write overlaps the next chunk's device work, fenced at the next
        save (VERDICT r3 task 6 — the old unconditional wait serialized
        ~10%% of the 1000-yr run).  Orbax commits atomically (tmp dir +
        rename), so a crash mid-write resumes from the previous complete
        checkpoint.  Call ``wait_until_finished`` before process exit (the
        long-run driver does)."""
        if corr is not self._corr_ref:   # identity, not id(): holds a ref
            self._corr_np = {k: np.asarray(getattr(corr, k))
                             for k in ("tf", "tof", "qf")}
            self._corr_ref = corr
        if self._mgr is not None:
            payload = {
                "state": {k: np.asarray(getattr(state, k))
                          for k in ("ts", "ta", "to", "q", "cap_surf")},
                "corr": self._corr_np,
                # orbax StandardSave has no string support: encode phase
                "cursor": {"phase": _PHASES.index(cursor.phase),
                           "year_index": cursor.year_index,
                           "co2": cursor.co2},
            }
            self._mgr.save(step, args=self._ocp.args.StandardSave(payload))
        else:
            save_checkpoint(os.path.join(self.dir, f"ckpt_{step:06d}"),
                            state, corr, cursor)

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save is durably committed."""
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            self._mgr.wait_until_finished()      # surface any pending save
            return self._mgr.latest_step()
        if not os.path.isdir(self.dir):
            return None
        steps = [int(d.split("_")[1]) for d in os.listdir(self.dir)
                 if d.startswith("ckpt_")]
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None
                ) -> Tuple[ModelState, Corrections, RunCursor]:
        step = step if step is not None else self.latest_step()
        assert step is not None, "no checkpoint found"
        if self._mgr is not None:
            try:
                meta = self._mgr.item_metadata(step)
                out = self._mgr.restore(
                    step, args=self._ocp.args.StandardRestore(meta))
            except Exception:
                out = self._mgr.restore(step)
            import jax.numpy as jnp
            state = ModelState(**{k: jnp.asarray(v)
                                  for k, v in out["state"].items()})
            corr = Corrections(**{k: jnp.asarray(v)
                                  for k, v in out["corr"].items()})
            c = out["cursor"]
            cursor = RunCursor(phase=_PHASES[int(c["phase"])],
                               year_index=int(c["year_index"]),
                               co2=float(c["co2"]))
            return state, corr, cursor
        return load_checkpoint(os.path.join(self.dir, f"ckpt_{step:06d}"))
