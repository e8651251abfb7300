"""Multi-item running average (parity with `utils/AverageMeter.py`)."""

from __future__ import annotations


class AverageMeter:
    def __init__(self, items: int | None = None):
        self.items = items
        self.n = 1 if items is None else items
        self.reset()

    def reset(self):
        self._val = [0.0] * self.n
        self._sum = [0.0] * self.n
        self._count = [0] * self.n

    def update(self, values):
        if self.items is None:
            values = [values]
        for i, v in enumerate(values):
            self._val[i] = float(v)
            self._sum[i] += float(v)
            self._count[i] += 1

    def val(self, idx=None):
        if self.items is None:
            return self._val[0]
        return self._val if idx is None else self._val[idx]

    def count(self, idx=None):
        if self.items is None:
            return self._count[0]
        return self._count if idx is None else self._count[idx]

    def avg(self, idx=None):
        avgs = [s / c if c else 0.0 for s, c in zip(self._sum, self._count)]
        if self.items is None:
            return avgs[0]
        return avgs if idx is None else avgs[idx]
