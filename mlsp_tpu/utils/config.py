"""Experiment configuration: frozen dataclasses (hashable -> usable as
static jit arguments) + YAML/CLI loading.

Field names and defaults mirror the reference argparse surfaces
(`PointDA/trainer.py:44-99`, `train_spst.py:56-100`,
`PointSegDA/trainer.py:93-135`) plus the per-target overrides hardcoded
at `PointDA/trainer.py:103-111` / `PointSegDA/trainer.py:139-150`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


# Per-target density radius tables (trainer.py:103-111, seg trainer:139-150).
POINTDA_RADIUS = {"shapenet": 0.12, "modelnet": 0.13, "scannet": 0.135}
POINTSEGDA_RADIUS = {"adobe": 0.0872, "faust": 0.091, "mit": 0.124, "scape": 0.115}


@dataclass(frozen=True)
class PointDAConfig:
    """PointDA-10 classification DA experiment."""

    exp_name: str = "MLSP"
    out_path: str = "./experiments"
    dataroot: str = "./data"
    src_dataset: str = "shapenet"
    trgt_dataset: str = "scannet"
    epochs: int = 150
    model: str = "dgcnn"
    seed: int = 1
    num_class: int = 10
    num_points: int = 1024

    batch_size: int = 32
    test_batch_size: int = 32
    optimizer: str = "ADAM"
    lr: float = 1e-3
    momentum: float = 0.9
    wd: float = 5e-5
    dropout: float = 0.5

    # SSL recipe flags (defaults = reference defaults; train.sh recipe
    # turns on Density_normal_viainput + Normal_ondef + Density_ondef).
    DefRec_dist: str = "volume_based_voxels"
    num_regions: int = 3
    DefRec_on_src: bool = False
    DefRec_on_trgt: bool = False
    DefRec_weight: float = 0.5
    apply_PCM: bool = True
    mixup_params: float = 1.0
    Norm_on_trgt: bool = False
    normal_pred_weight: float = 0.5
    Scan_on_trgt: bool = False
    Scan_Rec_weight: float = 0.5
    Density_on_trgt: bool = False
    Density_weight: float = 0.05
    density_num_class: int = 16
    pergroup: float = 2.0
    radius: float = 0.1
    Density_normal_viainput: bool = False
    Density_normal_viachamfer: bool = False
    Density_normal_defpart: bool = False
    Density_ondef: bool = False
    Normal_ondef: bool = False
    Density_normal_viainput_onsrc: bool = False
    near: int = 20  # normal-estimation k

    # SPL (inline pseudo-labeling; SPST is a separate stage/config)
    apply_SPL: bool = False
    gamma: float = 0.1
    apply_SPL_v2: bool = False
    gamma_v2: float = 1.6366

    # runtime
    knn_backend: str = "auto"
    edge_impl: str = "auto"  # EdgeConv core (dgcnn): "auto" = per-chip
    # measured A/B cached in .jax_cache/chipcal.json (utils/chipcal.py),
    # else force "moments" | "fused" | "direct"
    # "bf16" is ~13% faster on the dev chip but measurably hurts DGCNN
    # convergence (kNN graphs from rounded features) — opt-in only.
    compute_dtype: str = "f32"
    # Finer mixed-precision knobs (dgcnn only; "" = follow compute_dtype):
    # the per-point heads carry most of the step's FLOPs and have no
    # kNN-graph dependency, and gather_dtype rounds only the gathered
    # neighbour bytes while the graph itself stays f32 — both dodge the
    # full-bf16 convergence failure mode. head_dtype defaults to bf16:
    # the round-3 multi-seed A/B (3 seeds x 30 epochs,
    # scripts/ab_mixed_precision.py) shows it matches f32 convergence
    # (src val 0.9948 both; trgt 0.9625+-0.053 vs 0.9375+-0.027); the
    # round-2 single-seed 11-epoch deficit was a short-horizon artifact.
    # On THIS chip the flip is perf-neutral (f32 matmul = bf16 rate and
    # SplitDense already removed the head traffic); on full-rate silicon
    # bf16 heads halve head matmul/memory cost. head_dtype="f32"
    # restores full-f32 heads.
    head_dtype: str = "bf16"
    gather_dtype: str = ""
    scan_steps: int = 16  # train steps fused per device dispatch (1 = off)
    # NB: debug_* fields are TEST-ONLY and constructor-only — from_dict
    # (the YAML/CLI funnel) rejects them, so no user config can enable
    # eval-mode-BN training or the aux taps by accident.
    debug_aux: bool = False  # train step also returns its internal
    # transform draws + raw grads in the metrics dict ("aux_*") — used by
    # the torch trajectory differential, which must feed the reference
    # the BIT-EXACT augmented/deformed arrays the jitted step consumed
    # (an eager replay of the same PRNG keys can flip voxel-boundary
    # region choices and diverge discretely)
    debug_bn_eval: bool = False  # train step forwards use RUNNING BN
    # stats (eval-mode BN, no stat updates). Test-only: isolates
    # optimizer/branch composition from train-mode BN's 1/sigma chaos
    # amplification (scan clouds are ~25% exact zeros, driving some
    # batch variances toward 0 — see the scan trajectory differential)
    resume: str = ""  # checkpoint path to resume from (params+opt+epoch)
    save_every: int = 0  # also write last.ckpt every N epochs (preemption
    # tolerance: --resume last.ckpt loses at most N-1 epochs; 0 = off —
    # the reference only checkpoints on a new best source-val accuracy)
    synthetic: bool = False  # use in-memory synthetic data (tests/bench)

    def resolved(self) -> "PointDAConfig":
        """Apply the per-target radius/class table (trainer.py:103-111)."""
        r = POINTDA_RADIUS.get(self.trgt_dataset, self.radius)
        return dataclasses.replace(self, radius=r, density_num_class=16)

    @property
    def paper_recipe(self) -> "PointDAConfig":
        """The train.sh headline configuration."""
        return dataclasses.replace(
            self.resolved(),
            Density_normal_viainput=True,
            Normal_ondef=True,
            Density_ondef=True,
            DefRec_weight=0.5,
            Density_weight=0.05,
        )


@dataclass(frozen=True)
class SPSTConfig:
    """Self-paced self-training stage (`train_spst.py:56-100`)."""

    exp_name: str = "SPST"
    out_path: str = "./experiments"
    dataroot: str = "./data"
    src_dataset: str = "shapenet"
    trgt_dataset: str = "scannet"
    model: str = "dgcnn"
    model_file: str = "./experiments/MLSP/model.ckpt"
    from_torch: bool = False  # model_file is a reference torch model.pt
    seed: int = 1
    num_class: int = 10
    num_points: int = 1024
    batch_size: int = 32
    test_batch_size: int = 32
    optimizer: str = "ADAM"
    lr: float = 1e-4
    momentum: float = 0.9
    wd: float = 5e-5
    dropout: float = 0.5
    apply_PCM: bool = False  # reference train_spst.py:78 default
    mixup_params: float = 1.0
    DefRec_weight: float = 0.5
    epochs: int = 10
    rounds: int = 5
    threshold: float = 1.5492  # entropy threshold (v2 selection)
    use_entropy_selection: bool = True  # select_target_by_conf_v2
    spl_weight: float = 1.0
    cls_weight: float = 1.0
    weight_decay_per_epoch: float = 5e-3  # train_spst.py:499-500
    density_num_class: int = 16
    pergroup: float = 2.0
    knn_backend: str = "auto"
    edge_impl: str = "auto"  # EdgeConv core: "auto" = per-chip measured
    # A/B (utils/chipcal.py), else "moments" | "fused" | "direct"
    compute_dtype: str = "f32"
    head_dtype: str = "bf16"  # see PointDAConfig
    gather_dtype: str = ""
    scan_steps: int = 8  # train steps fused per device dispatch (1 = off)
    synthetic: bool = False


@dataclass(frozen=True)
class PointSegDAConfig:
    """PointSegDA segmentation DA (`PointSegDA/trainer.py:93-135`)."""

    exp_name: str = "DefRec_PCM"
    out_path: str = "./experiments"
    dataroot: str = "./data/PointSegDAdataset"
    src_dataset: str = "adobe"
    trgt_dataset: str = "faust"
    model: str = "dgcnn_seg"  # "dgcnn_seg" | "hengshuang_seg"
    epochs: int = 200
    seed: int = 1
    num_class: int = 8
    num_points: int = 2048
    batch_size: int = 16
    test_batch_size: int = 32
    optimizer: str = "ADAM"
    lr: float = 1e-3
    momentum: float = 0.9
    wd: float = 5e-5
    dropout: float = 0.5

    DefRec_dist: str = "volume_based_voxels"
    num_regions: int = 3
    # DEAD FLAG, kept for argparse-surface parity: the reference's own
    # --min_pts (`PointSegDA/trainer.py:112`) is never read either —
    # `mlsp.deform_input` hardcodes min_pts=40 (`MLSP/mlsp.py:27`), and
    # so does our `transforms.deform.MIN_PTS`. Changing this field has
    # no effect, exactly like the reference.
    min_pts: int = 20
    apply_PCM: bool = False
    mixup_params: float = 1.0
    DefRec_weight: float = 0.02
    DefRec_on_trgt: bool = True
    Norm_on_trgt: bool = False
    normal_pred_weight: float = 0.02
    Density_on_trgt: bool = False
    Density_weight: float = 0.02
    density_num_class: int = 16
    pergroup: float = 5.0
    Density_normal_viainput: bool = False
    Density_normal_viachamfer: bool = False
    Density_normal_defpart: bool = False
    Density_ondef: bool = False
    Normal_ondef: bool = False
    near: int = 10
    shift: int = 10
    debug_aux: bool = False  # see PointDAConfig (torch trajectory test)
    density_radius: float = 0.081
    knn_backend: str = "auto"
    compute_dtype: str = "f32"
    scan_steps: int = 8  # train steps fused per device dispatch (1 = off)
    synthetic: bool = False

    def resolved(self) -> "PointSegDAConfig":
        r = POINTSEGDA_RADIUS.get(self.trgt_dataset, self.density_radius)
        return dataclasses.replace(self, density_radius=r, density_num_class=16)


@dataclass(frozen=True)
class EvalConfig:
    """Standalone checkpoint evaluation (`mlsp-tpu eval`).

    The reference has no equivalent entry point — its `test()` lives
    inside the trainers (`PointDA/trainer.py:298-331`); loading a saved
    `model.pt` requires running `train_spst.py`.
    """

    exp_name: str = "EVAL"
    out_path: str = "./experiments"
    dataroot: str = "./data"
    task: str = "pointda"  # "pointda" | "pointsegda"
    dataset: str = "scannet"
    split: str = "test"  # "train" | "val" | "test"
    model: str = "dgcnn"  # pointda: any make_model name; seg: dgcnn_seg
    model_file: str = ""  # native .ckpt, or reference model.pt with --from_torch
    from_torch: bool = False  # import a reference torch state_dict
    seed: int = 1
    num_class: int = 10
    num_points: int = 1024
    test_batch_size: int = 32
    dropout: float = 0.5
    density_num_class: int = 16
    pergroup: float = 2.0
    knn_backend: str = "auto"
    compute_dtype: str = "f32"
    head_dtype: str = ""
    gather_dtype: str = ""
    synthetic: bool = False
    output: str = ""  # `infer` predictions .npz (default {exp_dir}/predictions.npz)

    # Fields whose PointDA defaults are wrong for the seg task, with the
    # seg trainer's values (`PointSegDA/trainer.py:124-125` pergroup 5,
    # 8 classes / 2048 points at `:196-199`).
    _SEG_DEFAULTS = {
        "model": "dgcnn_seg",
        "num_class": 8,
        "num_points": 2048,
        "pergroup": 5.0,
        "dataset": "faust",
    }

    def resolved(self) -> "EvalConfig":
        """Task-conditional defaults: with `task=pointsegda`, any field
        still at its PointDA default flips to the seg trainer's value
        (an explicitly-set field is kept)."""
        if self.task != "pointsegda":
            return self
        defaults = {f.name: f.default for f in dataclasses.fields(self)}
        repl = {k: v for k, v in self._SEG_DEFAULTS.items()
                if getattr(self, k) == defaults[k]}
        return dataclasses.replace(self, **repl)


def model_heads(model: str) -> tuple[str, ...]:
    """SSL heads a backbone provides (cf. the reference's activate_*
    flags: only DGCNN carries normal/scan/density heads)."""
    return (
        ("defrec", "normal", "scan", "density") if model == "dgcnn"
        else ("defrec",)
    )


def seg_model_heads(model: str) -> tuple[str, ...]:
    """Heads a PointSegDA backbone provides: the reference DGCNN_DefRec
    carries all four (`PointSegDA/Models.py:213-242`); the hengshuang
    seg variant has seg + DefRec only (`hengshuang_model.py:99-139`)."""
    return (
        ("seg", "defrec", "normal", "density") if model == "dgcnn_seg"
        else ("seg", "defrec")
    )


def trained_heads(cfg) -> tuple[str, ...]:
    """PointDA heads that actually receive gradients under the recipe —
    i.e. some loss term reads their output.

    torch optimizers skip grad-None params wholesale
    (`PointDA/trainer.py:571` only steps what got grads), so heads
    outside this set stay byte-identical to init even though the
    combined branches *forward* through them (a forwarded-but-lossless
    head still gets grad None in torch; only its BN running stats move).
    The trainers freeze the complement via
    `create_train_state(untrained_heads=...)`.
    """
    combined = (cfg.Density_normal_viainput or cfg.Density_normal_viachamfer
                or cfg.Density_normal_viainput_onsrc)
    t = set()
    if cfg.DefRec_on_src or cfg.DefRec_on_trgt or combined:
        t.add("defrec")
    if cfg.Norm_on_trgt or (combined and cfg.Normal_ondef):
        t.add("normal")
    if cfg.Scan_on_trgt:
        t.add("scan")
    if cfg.Density_on_trgt or (combined and cfg.Density_ondef):
        t.add("density")
    return tuple(h for h in model_heads(cfg.model) if h in t)


def trained_seg_heads(cfg) -> tuple[str, ...]:
    """PointSegDA heads with gradients under the recipe (cf.
    `trained_heads`); seg CE always trains the seg head
    (`PointSegDA/trainer.py:311-323`)."""
    t = {"seg"}
    if cfg.DefRec_on_trgt or cfg.Density_normal_viainput:
        t.add("defrec")
    if cfg.Norm_on_trgt or (cfg.Density_normal_viainput and cfg.Normal_ondef):
        t.add("normal")
    if cfg.Density_on_trgt or (cfg.Density_normal_viainput and cfg.Density_ondef):
        t.add("density")
    return tuple(h for h in seg_model_heads(cfg.model) if h in t)


def validate_seg_heads(cfg) -> tuple[str, ...]:
    """`validate_heads` for the seg task (cf. `_seg_step_inner`)."""
    available = seg_model_heads(cfg.model)
    needed = {"seg"}
    if cfg.DefRec_on_trgt:
        needed.add("defrec")
    if cfg.Norm_on_trgt:
        needed.add("normal")
    if cfg.Density_on_trgt:
        needed.add("density")
    # The combined branch forwards through all three heads regardless of
    # the *_ondef flags (`_seg_step_inner` -> `_apply(..., ("defrec",
    # "normal", "density"), ...)`).
    if cfg.Density_normal_viainput:
        needed.update({"defrec", "normal", "density"})
    missing = needed - set(available)
    if missing:
        raise ValueError(
            f"seg model {cfg.model!r} has no {sorted(missing)} head(s) but "
            f"the config enables SSL branches that need them — use "
            f"--model dgcnn_seg or disable those flags"
        )
    return available


def validate_heads(cfg) -> tuple[str, ...]:
    """Check the SSL branches the config enables against the heads the
    chosen backbone provides; returns the backbone's head tuple.

    Raises a clear ValueError instead of letting the train step die on
    a KeyError mid-forward.
    """
    available = model_heads(cfg.model)
    needed = {"defrec"}
    if getattr(cfg, "Norm_on_trgt", False) or getattr(cfg, "Normal_ondef", False):
        needed.add("normal")
    if getattr(cfg, "Scan_on_trgt", False):
        needed.add("scan")
    if (getattr(cfg, "Density_on_trgt", False)
            or getattr(cfg, "Density_ondef", False)):
        needed.add("density")
    # The combined branches forward through all three heads regardless
    # of the *_ondef flags (steps.py `_apply(..., ("defrec", "normal",
    # "density"), ...)`).
    if (getattr(cfg, "Density_normal_viainput", False)
            or getattr(cfg, "Density_normal_viachamfer", False)
            or getattr(cfg, "Density_normal_viainput_onsrc", False)):
        needed.update({"normal", "density"})
    missing = needed - set(available)
    if missing:
        raise ValueError(
            f"model {cfg.model!r} has no {sorted(missing)} head(s) but the "
            f"config enables SSL branches that need them — use --model dgcnn "
            f"or disable those flags"
        )
    return available


def dgcnn_dtype_kwargs(cfg) -> dict:
    """DGCNN mixed-precision kwargs from the config's *_dtype strings."""
    import jax.numpy as jnp

    def conv(s: str):
        return jnp.bfloat16 if s == "bf16" else None

    kw = {"dtype": conv(cfg.compute_dtype)}
    if getattr(cfg, "head_dtype", ""):
        kw["head_dtype"] = conv(cfg.head_dtype)
    if getattr(cfg, "gather_dtype", ""):
        kw["gather_dtype"] = conv(cfg.gather_dtype)
    if getattr(cfg, "edge_impl", ""):
        kw["edge_impl"] = cfg.edge_impl
    return kw


def from_dict(cls, d: dict):
    """User-facing config funnel (YAML + CLI land here).

    ``debug_*`` fields are test-only instrumentation — ``debug_bn_eval``
    silently CHANGES training semantics (eval-mode BN inside the train
    step) — so they are constructor-only: a YAML/CLI config naming one
    is rejected, not adopted."""
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    debug = sorted(k for k in d if k.startswith("debug_"))
    if debug:
        raise ValueError(
            f"{debug} are test-only instrumentation fields and cannot be "
            f"set from YAML/CLI (construct {cls.__name__} directly in a "
            f"test if you need them)")
    return cls(**d)


def _load_yaml_dict(path: str) -> dict:
    """YAML with `_base_` inheritance (parity with `utils/config.py:21-48`
    `merge_new_config`): the child overrides the recursively-merged base."""
    import os

    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base_rel = cfg.pop("_base_", None)
    if base_rel:
        base = _load_yaml_dict(os.path.join(os.path.dirname(path), base_rel))
        merged = dict(base)
        for k, v in cfg.items():
            if isinstance(v, dict) and isinstance(merged.get(k), dict):
                merged[k] = {**merged[k], **v}
            else:
                merged[k] = v
        return merged
    return cfg


def load_yaml_dict(path: str) -> dict:
    """Public `_base_`-resolving YAML loader (used by the CLI merge)."""
    return _load_yaml_dict(path)


def load_yaml(cls, path: str):
    return from_dict(cls, _load_yaml_dict(path))
