"""JSONL experiment logging (rebuilds main_vg.py:419-421's log.txt writer)
and rank-0-only printing (util/misc.py:336-348)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict

from reftr_tpu.core.distributed import is_main_process


def log_stats(output_dir: str, stats: Dict[str, Any],
              filename: str = "log.txt") -> None:
    """Append one JSON line of epoch stats; rank-0 only."""
    if not output_dir or not is_main_process():
        return
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, filename), "a") as f:
        f.write(json.dumps(stats) + "\n")


def master_print(*args, **kwargs):
    if is_main_process():
        print(*args, **kwargs)
