"""Lightweight experiment logging (the reference's W&B plane, offline).

The reference logs scalars/tables/images to Weights & Biases throughout
training and evaluation (SURVEY 5).  This zero-egress environment gets a
local equivalent: JSONL scalar streams + saved figures under the run dir,
with the same call shape (`log({...}, step=...)`), so swapping in wandb later
is a one-line change.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


class RunLogger:
    def __init__(self, run_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, filename)
        self._f = open(self.path, "a")

    def log(self, metrics: Mapping[str, Any], step: int | None = None):
        rec = {"_time": time.time()}
        if step is not None:
            rec["_step"] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def log_figure(self, name: str, fig, step: int | None = None):
        d = os.path.join(os.path.dirname(self.path), "figures")
        os.makedirs(d, exist_ok=True)
        suffix = f"_{step}" if step is not None else ""
        fig.savefig(os.path.join(d, f"{name}{suffix}.png"), dpi=100)

    def close(self):
        self._f.close()
