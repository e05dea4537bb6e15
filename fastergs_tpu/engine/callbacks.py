"""Prioritized iteration-callback engine.

Equivalent of the host framework's GuiTrainer callback system consumed by the
reference trainer (reference: Trainer.py:81-227 and SURVEY.md §2.3):
decorators declare `priority` (higher runs first), `start_iteration`,
`end_iteration`, `iteration_stride`, and `active` — each either a literal or
a dotted config-attribute NAME resolved on the trainer instance at loop time
(e.g. start_iteration='DENSIFICATION_START_ITERATION', Trainer.py:117).
The driver loop iterates NUM_ITERATIONS calling due callbacks with
(iteration, dataset).
"""

from __future__ import annotations

import functools
from typing import Any, Callable


def _callback(kind: str, priority: int = 0, start_iteration: Any = None,
              end_iteration: Any = None, iteration_stride: Any = None,
              active: Any = None):
    def decorator(fn: Callable) -> Callable:
        fn._callback_meta = dict(
            kind=kind, priority=priority, start_iteration=start_iteration,
            end_iteration=end_iteration, iteration_stride=iteration_stride,
            active=active)
        return fn
    return decorator


pre_training_callback = functools.partial(_callback, 'pre')
training_callback = functools.partial(_callback, 'training')
post_training_callback = functools.partial(_callback, 'post')


class CallbackEngine:
    """Collects decorated methods from an instance and runs them by phase."""

    def __init__(self, owner: Any) -> None:
        self.owner = owner
        self.callbacks = {'pre': [], 'training': [], 'post': []}
        for name in dir(type(owner)):
            fn = getattr(type(owner), name, None)
            meta = getattr(fn, '_callback_meta', None)
            if meta is not None:
                self.callbacks[meta['kind']].append((meta, getattr(owner, name)))
        for kind in self.callbacks:
            # higher priority first (reference convention)
            self.callbacks[kind].sort(key=lambda t: -t[0]['priority'])

    def _resolve(self, value: Any, default: Any) -> Any:
        if value is None:
            return default
        return self.owner.resolve_config(value)

    def run_pre(self, dataset) -> None:
        for _, fn in self.callbacks['pre']:
            fn(0, dataset)

    def run_post(self, iteration: int, dataset) -> None:
        for _, fn in self.callbacks['post']:
            fn(iteration, dataset)

    def due_training_callbacks(self, iteration: int):
        """Yields callbacks due at `iteration` in priority order."""
        for meta, fn in self.callbacks['training']:
            if not self._resolve(meta['active'], True):
                continue
            start = self._resolve(meta['start_iteration'], 0)
            end = self._resolve(meta['end_iteration'], None)
            stride = self._resolve(meta['iteration_stride'], 1)
            if iteration < start:
                continue
            if end is not None and iteration > end:
                continue
            if stride and stride > 0 and (iteration - start) % stride != 0:
                continue
            if stride is not None and stride <= 0:
                continue  # disabled periodic callback (e.g. BACKUP.INTERVAL=-1)
            yield fn

    def run_training(self, iteration: int, dataset) -> None:
        for fn in self.due_training_callbacks(iteration):
            fn(iteration, dataset)
