"""Weights & Biases facade (host Framework.wandb equivalent,
reference usage: Trainer.py:210-214).

Uses the real wandb package when installed and configured; otherwise falls
back to appending JSONL metric records so runs stay observable offline.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_wandb = None
_jsonl_path: Optional[str] = None
_active = False


def init(project: str = 'fastergs_tpu', entity: Optional[str] = None,
         output_dir: str = '.', **kwargs) -> bool:
    """Returns True if real wandb is active, False for the JSONL fallback."""
    global _wandb, _jsonl_path, _active
    _active = True
    try:
        import wandb as real_wandb
        real_wandb.init(project=project, entity=entity, **kwargs)
        _wandb = real_wandb
        return True
    except Exception:
        _wandb = None
        _jsonl_path = os.path.join(output_dir, 'metrics.jsonl')
        return False


def log(metrics: dict, step: Optional[int] = None) -> None:
    if not _active:
        return
    if _wandb is not None:
        _wandb.log(metrics, step=step)
        return
    record = dict(metrics)
    if step is not None:
        record['step'] = step
    with open(_jsonl_path, 'a') as f:
        f.write(json.dumps(record, default=float) + '\n')


def finish() -> None:
    global _active
    if _wandb is not None:
        _wandb.finish()
    _active = False
