"""Command-line entry points.

Mirrors the reference's three trainer scripts as subcommands with the
same flag names (`PointDA/trainer.py:44-99`, `train_spst.py:56-100`,
`PointSegDA/trainer.py:93-135`):

    python -m mlsp_tpu.cli trainer --src_dataset shapenet --trgt_dataset scannet \
        --Density_normal_viainput True --Normal_ondef True --Density_ondef True
    python -m mlsp_tpu.cli spst --model_file experiments/MLSP/model.ckpt
    python -m mlsp_tpu.cli seg --src_dataset adobe --trgt_dataset faust

Every dataclass field is exposed automatically; booleans accept
true/false/1/0/yes/no like the reference's str2bool. `--config FILE`
(YAML, `_base_` inheritance) composes with flags: precedence is
dataclass defaults < YAML < explicitly-passed flags, so
`--config configs/pointda/modelnet2scannet.yaml --epochs 3` runs the
recipe with 3 epochs (the reference's train.sh override UX).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

# Sentinel default: flag absent from the command line. Must NOT be a
# str — argparse runs `type` conversion on string defaults.
_UNSET = object()


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def _add_config_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if f.name.startswith("debug_"):
            continue  # test-only instrumentation: no CLI surface
        arg = f"--{f.name}"
        if f.type in ("bool", bool):
            parser.add_argument(arg, type=_str2bool, default=_UNSET)
        elif f.type in ("int", int):
            parser.add_argument(arg, type=int, default=_UNSET)
        elif f.type in ("float", float):
            parser.add_argument(arg, type=float, default=_UNSET)
        else:
            parser.add_argument(arg, type=str, default=_UNSET)
    parser.add_argument("--config", type=str, default="",
                        help="YAML config (supports _base_ inheritance); "
                             "explicitly-passed flags override its values")


def _to_config(cls, args: argparse.Namespace):
    """defaults < YAML (--config) < explicit flags."""
    from mlsp_tpu.utils.config import from_dict, load_yaml_dict

    names = {f.name for f in dataclasses.fields(cls)}
    merged = load_yaml_dict(args.config) if getattr(args, "config", "") else {}
    for k, v in vars(args).items():
        if k in names and v is not _UNSET:
            merged[k] = v
    return from_dict(cls, merged)


def main(argv=None) -> int:
    from mlsp_tpu.utils.cache import enable as enable_cache
    from mlsp_tpu.utils.config import (
        EvalConfig, PointDAConfig, PointSegDAConfig, SPSTConfig,
    )

    parser = argparse.ArgumentParser(
        prog="mlsp_tpu", description="TPU-native MLSP point-cloud DA framework"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("trainer", help="PointDA-10 classification DA")
    _add_config_args(p_train, PointDAConfig)
    p_train.add_argument("--paper_recipe", type=_str2bool, default=False,
                         help="apply the train.sh headline flag set")
    p_train.add_argument("--mesh_data", type=int, default=0,
                         help="data-parallel mesh axis size (0 = no mesh; "
                              "replaces the reference's nn.DataParallel)")
    p_train.add_argument("--mesh_points", type=int, default=1,
                         help="points-sharding mesh axis size (shards the "
                              "O(N^2) distance intermediates)")

    p_spst = sub.add_parser("spst", help="SPST pseudo-label self-training")
    _add_config_args(p_spst, SPSTConfig)
    p_spst.add_argument("--mesh_data", type=int, default=0,
                        help="data-parallel mesh axis size (0 = no mesh)")
    p_spst.add_argument("--mesh_points", type=int, default=1,
                        help="points-sharding mesh axis size")

    p_seg = sub.add_parser("seg", help="PointSegDA segmentation DA")
    _add_config_args(p_seg, PointSegDAConfig)
    p_seg.add_argument("--mesh_data", type=int, default=0,
                       help="data-parallel mesh axis size (0 = no mesh)")
    p_seg.add_argument("--mesh_points", type=int, default=1,
                       help="points-sharding mesh axis size")

    for p in (p_train, p_spst, p_seg):
        p.add_argument("--profile_dir", type=str, default="",
                       help="capture an XLA profiler trace of the run into "
                            "this directory (view in TensorBoard/Perfetto); "
                            "use with a short --epochs run")

    p_eval = sub.add_parser(
        "eval", help="evaluate a checkpoint (native .ckpt or reference "
                     "model.pt via --from_torch) on a dataset split")
    _add_config_args(p_eval, EvalConfig)

    p_infer = sub.add_parser(
        "infer", help="batch inference: write per-sample predictions + "
                      "class probabilities for a dataset split to .npz")
    _add_config_args(p_infer, EvalConfig)

    p_export = sub.add_parser(
        "export", help="export a checkpoint as a reference-loadable torch "
                       "model.pt (inverse of --from_torch; dgcnn/pointnet/"
                       "dgcnn_seg/point_transformer/hengshuang)")
    _add_config_args(p_export, EvalConfig)

    p_aot = sub.add_parser(
        "aot", help="freeze a checkpoint into an AOT serving bundle "
                    "(StableHLO eval program + weights; loads and runs "
                    "with NO model code)")
    _add_config_args(p_aot, EvalConfig)

    p_dl = sub.add_parser(
        "download", help="fetch + extract a benchmark dataset "
                         "(parity with the reference download scripts; "
                         "needs network + gdown)")
    p_dl.add_argument("--task", choices=("pointda", "pointsegda"),
                      default="pointda")
    p_dl.add_argument("--dataroot", default="./data")

    p_cal = sub.add_parser(
        "calibrate", help="measure this chip's EdgeConv moments-vs-fused "
                          "A/B over the shape grid and cache the per-shape "
                          "verdicts (resolves edge_impl='auto')")
    p_cal.add_argument("--force", action="store_true",
                       help="re-measure even if a cached record exists")

    args = parser.parse_args(argv)
    enable_cache()

    # Multi-host: same jit programs over DCN once the distributed runtime
    # is up (the reference has no multi-node path at all, SURVEY §2.2).
    import os

    if os.environ.get("MLSP_MULTIHOST"):
        from mlsp_tpu.parallel import init_distributed

        init_distributed()  # fail-fast heartbeat (dead peer -> abort)

    def _mesh_from_args():
        if not (args.mesh_data or args.mesh_points > 1):
            return None
        from mlsp_tpu.parallel import make_mesh

        return make_mesh(data=args.mesh_data or None, points=args.mesh_points)

    import contextlib

    if getattr(args, "profile_dir", ""):
        from mlsp_tpu.utils.profiling import device_trace

        trace = device_trace(args.profile_dir)
    else:
        trace = contextlib.nullcontext()

    if args.command == "trainer":
        from mlsp_tpu.train.pointda_trainer import train_pointda

        cfg = _to_config(PointDAConfig, args)
        if args.paper_recipe:
            cfg = cfg.paper_recipe
        with trace:
            train_pointda(cfg, mesh=_mesh_from_args())
    elif args.command == "spst":
        from mlsp_tpu.train.spst import train_spst

        with trace:
            train_spst(_to_config(SPSTConfig, args), mesh=_mesh_from_args())
    elif args.command == "seg":
        from mlsp_tpu.train.pointsegda_trainer import train_pointsegda

        with trace:
            train_pointsegda(_to_config(PointSegDAConfig, args),
                             mesh=_mesh_from_args())
    elif args.command == "eval":
        from mlsp_tpu.train.evaluation import run_eval

        run_eval(_to_config(EvalConfig, args))
    elif args.command == "infer":
        from mlsp_tpu.train.evaluation import run_infer

        run_infer(_to_config(EvalConfig, args))
    elif args.command == "export":
        from mlsp_tpu.train.evaluation import run_export

        run_export(_to_config(EvalConfig, args))
    elif args.command == "aot":
        from mlsp_tpu.train.evaluation import run_aot_export

        run_aot_export(_to_config(EvalConfig, args))
    elif args.command == "download":
        from mlsp_tpu.data import download

        fetch = (download.download_pointda if args.task == "pointda"
                 else download.download_pointsegda)
        print(f"dataset extracted under {fetch(args.dataroot)}")
    elif args.command == "calibrate":
        import json as _json

        from mlsp_tpu.utils import chipcal

        records = chipcal.edge_calibration(force=args.force)
        if not records:
            print("calibration unavailable (non-TPU backend and no cache)")
            return 1
        print(_json.dumps(records, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
