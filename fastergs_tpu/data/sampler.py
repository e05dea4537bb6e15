"""Dataset samplers (host Optim.Samplers.DatasetSamplers equivalent,
reference usage: Trainer.py:13,85,177)."""

from __future__ import annotations

import numpy as np


class DatasetSampler:
    """Random-without-replacement view sampler: each epoch is a permutation
    of the training views, reshuffled when exhausted."""

    def __init__(self, dataset, random: bool = True, seed: int = 0) -> None:
        self.dataset = dataset
        self.random = random
        self._rng = np.random.default_rng(seed)
        self._order: np.ndarray | None = None
        self._cursor = 0

    def _refresh(self) -> None:
        n = len(self.dataset.train_views)
        self._order = (self._rng.permutation(n) if self.random
                       else np.arange(n))
        self._cursor = 0

    def get_index(self) -> int:
        if self._order is None or self._cursor >= len(self._order):
            self._refresh()
        idx = int(self._order[self._cursor])
        self._cursor += 1
        return idx

    def get(self, dataset=None) -> dict:
        ds = dataset or self.dataset
        return {'view': ds.train_views[self.get_index()]}
