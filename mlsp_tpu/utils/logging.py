"""Experiment logging: timestamped stdout + run.log file.

Parity with `utils/log.py:10-59` (`IOStream`), without torch: model
saving goes through :mod:`mlsp_tpu.utils.checkpoint`.
"""

from __future__ import annotations

import datetime
import os


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class IOStream:
    """Multi-host aware: only process 0 owns the experiment files
    (run.log / metrics.jsonl / confusion CSVs) — other ranks still print
    to their own stdout (rank-prefixed) but never race on shared paths.
    """

    def __init__(self, out_path: str, exp_name: str):
        self.path = os.path.join(out_path, exp_name)
        self.primary = _process_index() == 0
        self._rank = _process_index()
        if self.primary:
            os.makedirs(self.path, exist_ok=True)
            self._f = open(os.path.join(self.path, "run.log"), "a")
        else:
            self._f = None

    def cprint(self, text: str) -> None:
        stamp = datetime.datetime.now().strftime("%d-%m-%y %H:%M:%S")
        prefix = "" if self.primary else f"[rank {self._rank}] "
        line = f"{stamp}: {prefix}{text}"
        print(line)
        if self._f is not None:
            self._f.write(line + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()

    def print_progress(self, domain_set, partition, epoch, print_losses,
                       true=None, pred=None):
        """Format an epoch progress line; returns accuracy when labels given."""
        from mlsp_tpu.utils import metrics as M

        out = f"{partition} - {domain_set} {epoch}"
        acc = 0.0
        if true is not None and pred is not None:
            acc = M.accuracy(true, pred)
            bal = M.balanced_accuracy(true, pred)
            out += f", acc: {acc:.4f}, avg acc: {bal:.4f}"
        if print_losses is not None:
            for k, v in print_losses.items():
                out += f", {k} loss: {v:.4f}"
        self.cprint(out)
        return acc

    def log_metrics(self, record: dict, fname: str = "metrics.jsonl") -> None:
        """Append one JSON line of metrics to `{exp_dir}/{fname}`.

        Machine-readable counterpart of `print_progress` (the reference
        only has the human `run.log` plus SPST's one-off
        `finetune_convergence.json`, `train_spst.py:520-521`). Numpy
        scalars/arrays are converted; nested dicts are preserved.
        """
        import json

        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if hasattr(v, "tolist"):  # numpy / jax scalar or array
                return v.tolist()
            return v

        if not self.primary:
            return
        with open(os.path.join(self.path, fname), "a") as f:
            f.write(json.dumps(conv(record)) + "\n")

    def trim_metrics(self, below: int, key: str = "epoch",
                     fname: str = "metrics.jsonl") -> None:
        """Keep only records with `record[key] < below` (one record per
        epoch contract): a fresh run in a reused exp dir truncates the
        file (`below=0`), a `--resume` run drops the records the resumed
        epochs will re-emit."""
        import json

        path = os.path.join(self.path, fname)
        if not self.primary or not os.path.exists(path):
            return
        kept = []
        with open(path) as f:
            for line in f:
                try:
                    if json.loads(line).get(key, below) < below:
                        kept.append(line)
                except json.JSONDecodeError:
                    pass
        with open(path, "w") as f:
            f.writelines(kept)

    def save_conf_mat(self, conf_matrix, fname: str, domain_set: str,
                      class_names=None) -> None:
        import csv

        if not self.primary:
            return
        n = conf_matrix.shape[0]
        names = class_names or [str(i) for i in range(n)]
        with open(os.path.join(self.path, f"{domain_set}_{fname}"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([""] + list(names))
            for name, row in zip(names, conf_matrix):
                w.writerow([name] + list(map(int, row)))
