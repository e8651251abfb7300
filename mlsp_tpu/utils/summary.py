"""Model parameter summary (parity with the torchsummary printout at
`PointSegDA/trainer.py:199`)."""

from __future__ import annotations

import numpy as np


def model_summary(params, max_depth: int = 1) -> str:
    """Per-top-level-module parameter counts + total, as a printable table."""
    import jax

    lines = ["-" * 46, f"{'Module':<30}{'Params':>14}", "-" * 46]
    total = 0
    for name, sub in sorted(params.items()):
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(sub))
        total += n
        lines.append(f"{name:<30}{n:>14,}")
    lines += ["-" * 46, f"{'Total params':<30}{total:>14,}", "-" * 46]
    return "\n".join(lines)
