"""Running metric accumulation for the trainer epoch loops.

The reference ships a dead `utils/AverageMeter.py` (no caller); here the
meter is live: every trainer feeds its per-step loss dicts — scalars or
[S]-stacked `lax.scan` outputs — into a `MeterDict` and reads back
sample-weighted means for the epoch report.
"""

from __future__ import annotations

import numpy as np


class AverageMeter:
    """Sample-weighted running mean of one scalar metric."""

    __slots__ = ("val", "sum", "count")

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.val = 0.0  # most recent value
        self.sum = 0.0
        self.count = 0.0

    def update(self, value: float, n: float = 1.0) -> None:
        self.val = float(value)
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class MeterDict:
    """One `AverageMeter` per metric name, fed from step metric dicts.

    `update` accepts scalars or [S]-shaped arrays (metrics stacked over
    a scanned chunk of S train steps); each scalar entry is weighted by
    `n` samples.
    """

    def __init__(self):
        self._meters: dict[str, AverageMeter] = {}

    def __getitem__(self, name: str) -> AverageMeter:
        return self._meters[name]

    def __contains__(self, name: str) -> bool:
        return name in self._meters

    def update(self, metrics: dict, n: float = 1.0) -> None:
        for name, v in metrics.items():
            arr = np.asarray(v, dtype=np.float64).reshape(-1)
            # mean weighted by (steps * n) == per-step values each
            # weighted by n samples.
            self._meters.setdefault(name, AverageMeter()).update(
                float(arr.mean()), n * arr.size
            )

    def averages(self) -> dict[str, float]:
        return {name: m.avg for name, m in self._meters.items()}
