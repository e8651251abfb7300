"""Train state + optimizer factory (torch-parity Adam/SGD + cosine).

Optimizer semantics match the reference exactly
(`PointDA/trainer.py:258-260`): torch Adam applies L2 weight decay by
adding wd*param to the gradient *before* the moment updates —
`optax.add_decayed_weights` placed first in the chain reproduces that —
and `CosineAnnealingLR(T_max=epochs)` steps once per epoch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


# Head name (the static `heads` tuple vocabulary) -> flax module name in
# the params tree.  Consistent across every model family.
HEAD_MODULES = {"defrec": "DefRec", "normal": "NormPred",
                "scan": "RecScan", "density": "DensityCls"}


def head_exclusive_modules(model, sample_input, heads, untrained_heads):
    """Top-level param modules owned EXCLUSIVELY by `untrained_heads`.

    Derived from the model itself, not a name table: the abstract param
    tree (`jax.eval_shape`, no compute) is built once with all `heads`
    and once without the untrained ones — the difference is exactly the
    modules only those heads instantiate. This catches head-private
    auto-named submodules a static table misses (hengshuang's defrec
    branch owns an `UpDecoder_0`; the seg variant's decoder is shared
    with the always-trained seg head and correctly stays out), and it
    fails loudly on drift: if an expected head module doesn't drop out
    of the tree, the freeze would silently not happen, so we raise.
    """
    unknown = set(untrained_heads) - set(heads)
    if unknown:
        raise ValueError(f"untrained heads {sorted(unknown)} not in the "
                         f"model's head tuple {heads}")
    rng = jax.random.key(0)

    def top(active):
        v = jax.eval_shape(
            lambda r, x: model.init({"params": r}, x, train=False,
                                    heads=active), rng, sample_input)
        return set(v["params"])

    trained = tuple(h for h in heads if h not in untrained_heads)
    exclusive = top(tuple(heads)) - top(trained)
    expected = {HEAD_MODULES[h] for h in untrained_heads if h in HEAD_MODULES}
    missing = expected - exclusive
    if missing:
        raise ValueError(
            f"head modules {sorted(missing)} did not drop out of the param "
            f"tree when heads {sorted(untrained_heads)} were removed — the "
            f"freeze mask would silently miss them (model/head-name drift?)")
    return exclusive


def untrained_decay_mask(module_names):
    """Weight-decay mask excluding the given top-level param modules.

    torch optimizers skip params whose grad is None entirely — in SPST
    fine-tune the SSL heads exist in the param tree (checkpoint
    compatibility with the pretrain stage) but never appear in the loss
    (`train_spst.py:472-498` trains cls only), so torch leaves them
    byte-identical to the loaded checkpoint.  With zero grads our
    Adam/SGD moments stay zero too; the only nonzero update would be the
    L2 decay term, so masking `add_decayed_weights` for those modules
    reproduces torch's skip exactly (and keeps opt_state structure
    unchanged — the decay transform is stateless).
    """
    mods = frozenset(module_names)

    def mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: getattr(path[0], "key", None) not in mods, params)

    return mask


def _decayed_weights(wd: float, decay_mask=None):
    """`optax.add_decayed_weights`, but masking without `optax.masked`:
    the wrapper would change the opt_state tree (MaskedState), breaking
    checkpoint structure compatibility with unmasked states.  This
    transform is stateless either way, so the mask lives in the update
    rule only."""
    if decay_mask is None:
        return optax.add_decayed_weights(wd)

    def update_fn(updates, state, params):
        keep = decay_mask(params)
        updates = jax.tree_util.tree_map(
            lambda u, p, k: u + wd * p if k else u, updates, params, keep)
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def cosine_per_epoch(base_lr: float, epochs: int, steps_per_epoch: int):
    """lr(step) = base_lr * (1 + cos(pi * epoch/epochs)) / 2, epoch-stepped."""

    def sched(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), epochs)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return sched


def torch_cosine_lr(base_lr: float, t_max: int, epoch: int) -> float:
    """torch `CosineAnnealingLR(T_max=t_max)` closed form at scheduler
    step `epoch` — deliberately NOT clamped at t_max: torch's recursion
    is periodic, so stepping past T_max makes the LR rise back toward
    `base_lr` (period 2*T_max). SPST creates the scheduler once with
    T_max=epochs and steps it every epoch of every round
    (`train_spst.py:163,501`), so round 2's LR climbs again."""
    import math

    return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / t_max))


def set_learning_rate(state, lr: float):
    """Set the LR of a `make_epoch_lr_optimizer` train state (functional).

    The opt-state pytree keeps its structure (the LR is a traced array
    leaf), so jitted steps do NOT retrace on LR changes."""
    os_ = state.opt_state
    hp = dict(os_.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=os_._replace(hyperparams=hp))


def make_epoch_lr_optimizer(name: str, lr: float, wd: float, momentum: float,
                            decay_mask=None):
    """Optimizer whose LR is an injected hyperparameter set explicitly
    per epoch via `set_learning_rate` — for trainers whose reference
    steps a torch scheduler once per EPOCH regardless of iteration count
    (SPST: `train_spst.py:163,501`). A step-count schedule can't
    reproduce that when the per-epoch iteration count varies (SPST's
    does: it equals the pseudo-label selection size)."""
    name = name.upper()

    def inner(learning_rate):
        if name == "SGD":
            return optax.chain(
                _decayed_weights(wd, decay_mask),
                optax.trace(decay=momentum),
                optax.scale_by_learning_rate(learning_rate),
            )
        return optax.chain(
            _decayed_weights(wd, decay_mask),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(inner)(learning_rate=lr)


def step_schedule(base_lr: float, decay_epochs: int, decay_rate: float,
                  steps_per_epoch: int):
    """StepLR-style schedule (reference `build_opti_sche` StepLR path)."""

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * decay_rate ** (epoch // decay_epochs)

    return sched


def make_optimizer(
    name: str,
    lr: float,
    wd: float,
    momentum: float,
    epochs: int,
    steps_per_epoch: int,
    scheduler: str = "cos",
    decay_epochs: int = 50,
    decay_rate: float = 0.5,
    decay_mask=None,
) -> optax.GradientTransformation:
    """Optimizer + scheduler factory.

    Covers the live path (Adam/SGD + CosineAnnealingLR,
    `PointDA/trainer.py:258-260`) and the reference's richer dead
    factory (`utils/optimizer.py:10-72`): AdamW (decoupled decay,
    skipping biases/1-d params like its `add_weight_decay` groups) and a
    StepLR schedule.
    """
    if scheduler == "cos":
        sched = cosine_per_epoch(lr, epochs, steps_per_epoch)
    elif scheduler == "step":
        sched = step_schedule(lr, decay_epochs, decay_rate, steps_per_epoch)
    else:
        sched = lr

    name = name.upper()
    if name == "SGD":
        return optax.chain(
            _decayed_weights(wd, decay_mask),
            optax.trace(decay=momentum),
            optax.scale_by_learning_rate(sched),
        )
    if name == "ADAMW":
        def no_decay_mask(params):
            nd = jax.tree_util.tree_map(lambda p: p.ndim > 1, params)
            if decay_mask is None:
                return nd
            return jax.tree_util.tree_map(lambda a, b: a and b,
                                          nd, decay_mask(params))

        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(wd, mask=no_decay_mask),
            optax.scale_by_learning_rate(sched),
        )
    return optax.chain(
        _decayed_weights(wd, decay_mask),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(sched),
    )


def create_train_state(
    model,
    rng,
    sample_input,
    *,
    optimizer: str = "ADAM",
    lr: float = 1e-3,
    wd: float = 5e-5,
    momentum: float = 0.9,
    epochs: int = 150,
    steps_per_epoch: int = 100,
    heads: tuple[str, ...] = (),
    epoch_lr: bool = False,
    untrained_heads: tuple[str, ...] = (),
) -> TrainState:
    # Jit the init: eager init dispatches every layer op individually,
    # which is pathologically slow through a remote-TPU relay.
    init_fn = jax.jit(
        lambda r, x: model.init({"params": r}, x, train=False, heads=heads)
    )
    variables = init_fn(rng, sample_input)
    # Heads present in the tree but absent from the loss recipe get
    # grad None in torch (optimizer skips them wholesale); mask our
    # decay term so they stay frozen too (see untrained_decay_mask).
    decay_mask = None
    if untrained_heads:
        mods = head_exclusive_modules(model, sample_input, heads,
                                      untrained_heads)
        absent = mods - set(variables["params"])
        if absent:  # drift guard: a mask over missing names is a no-op
            raise ValueError(f"frozen-head modules {sorted(absent)} not in "
                             f"the initialized params tree")
        decay_mask = untrained_decay_mask(mods)
    if epoch_lr:
        tx = make_epoch_lr_optimizer(optimizer, lr, wd, momentum,
                                     decay_mask=decay_mask)
    else:
        tx = make_optimizer(optimizer, lr, wd, momentum, epochs,
                            steps_per_epoch, decay_mask=decay_mask)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
