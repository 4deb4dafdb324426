"""Rank-gated printing and training metrics.

Counterpart of the reference observability layer (SURVEY.md §5):
``main_print`` (fastvideo/utils/logging_.py:8-10, LOCAL_RANK<=0 gate) and
the rank-0 wandb stream (train_grpo_flux.py:753-760,867-887).  wandb is
optional here (not in the image); metrics always append to a JSONL file so
runs are inspectable offline, and a rolling step-time average mirrors the
reference's deque(100) (:801,855-857).
"""

from __future__ import annotations

import collections
import json
import os
import pdb
import sys
import time
from typing import Dict, Optional

import jax


def main_print(*args, **kwargs) -> None:
    if jax.process_index() == 0:
        print(*args, **kwargs)


class ForkedPdb(pdb.Pdb):
    """Pdb usable from a forked multiprocessing child (e.g. a dataloader
    worker): reopens the controlling terminal's stdin for the interaction.
    Counterpart of fastvideo/utils/logging_.py:14-26.
    """

    def interaction(self, *args, **kwargs):
        _stdin = sys.stdin
        try:
            sys.stdin = open("/dev/stdin")
            pdb.Pdb.interaction(self, *args, **kwargs)
        finally:
            sys.stdin = _stdin


class MetricLogger:
    def __init__(
        self,
        output_dir: str,
        run_name: str = "run",
        wandb_key: Optional[str] = None,
        wandb_project: str = "mixgrpo_tpu",
        resume_id: Optional[str] = None,
    ):
        self.enabled = jax.process_index() == 0
        self._wandb = None
        self._step_times = collections.deque(maxlen=100)
        self._last_tick: Optional[float] = None
        if not self.enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{run_name}_metrics.jsonl")
        self._f = open(self.path, "a")
        if wandb_key:
            try:
                import wandb

                wandb.login(key=wandb_key)
                self._wandb = wandb.init(
                    project=wandb_project, name=run_name, id=resume_id,
                    resume="allow" if resume_id else None,
                )
            except Exception as e:  # wandb genuinely optional
                print(f"wandb disabled: {e}")

    def tick(self) -> Dict[str, float]:
        """Record a step boundary; returns step_time / avg_step_time."""
        now = time.time()
        out = {}
        if self._last_tick is not None:
            dt = now - self._last_tick
            self._step_times.append(dt)
            out = {
                "step_time": dt,
                "avg_step_time": sum(self._step_times) / len(self._step_times),
            }
        self._last_tick = now
        return out

    def log(self, step: int, metrics: Dict) -> None:
        if not self.enabled:
            return
        clean = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }
        clean["step"] = step
        self._f.write(json.dumps(clean) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def close(self) -> None:
        if self.enabled:
            self._f.close()
            if self._wandb is not None:
                self._wandb.finish()
