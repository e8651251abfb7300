"""Failure detection: non-finite loss abort with a post-mortem state.

The reference has no failure handling (SURVEY §5 — a NaN loss there
trains on silently and every subsequent metric is garbage). Here every
trainer checks the epoch's averaged loss terms; on the first non-finite
value it saves the state for post-mortem inspection and aborts, naming
the offending loss terms. Together with `--resume` (restart from the
last good checkpoint) this is the framework's crash story.
"""

from __future__ import annotations

import os

import numpy as np

from mlsp_tpu.utils import checkpoint


def check_finite_losses(meters_avg: dict, state, epoch: int, io) -> None:
    """Raise FloatingPointError if any averaged loss term is non-finite.

    Saves the (already-poisoned, but diagnostic) train state to
    `{exp_dir}/nonfinite_crash.ckpt` first, so the divergence point can
    be inspected offline. The epoch average is checked because the
    trainers fetch metrics to host every step/chunk anyway and NaN/inf
    propagate through the mean.
    """
    bad = sorted(k for k, v in meters_avg.items() if not np.isfinite(v))
    if not bad:
        return
    path = os.path.join(io.path, "nonfinite_crash.ckpt")
    try:
        checkpoint.save_train_state(path, state, epoch,
                                    {"nonfinite_terms": ",".join(bad)})
        saved = f"; state saved to {path}"
    except Exception as e:  # the crash report must not mask the crash
        saved = f"; state save failed ({e})"
    msg = (f"non-finite loss at epoch {epoch}: "
           f"{', '.join(bad)} (training diverged — lower the lr or check "
           f"the input data){saved}")
    io.cprint(msg)
    raise FloatingPointError(msg)
