"""Command-line entrypoints (reference: main_pcn.py / main_55.py /
main_geospec.py:22-48 — flags ``--test`` / ``--inference``, plus
``--weights`` / ``--run_id`` overrides on the geospec track; both --test and
--inference route to evaluation, as in main_pcn.py:40-46).

Usage (thin wrappers at the repo root):
    python main_pcn.py [--test|--inference] [--weights PATH]
    python main_55.py [--test|--inference] [--mode easy|median|hard]
    python main_geospec.py [--test|--inference] [--weights PATH] [--run_id N]
    python main_pointsea.py [--test|--inference] [--weights PATH]
"""

from __future__ import annotations

import argparse
import logging
from pprint import pprint

from svdformer_pointsea_tpu.configs import (
    Config,
    geospec_config,
    kitti_config,
    pcn_config,
    pointsea_config,
    shapenet55_config,
)


def _parser(track: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"SVDFormer/PointSea TPU — {track}")
    p.add_argument("--test", action="store_true", help="Test neural networks")
    p.add_argument(
        "--inference", action="store_true", help="Inference for benchmark"
    )
    p.add_argument("--weights", default=None, help="checkpoint to load")
    p.add_argument("--out", default=None, help="output directory override")
    p.add_argument(
        "--complete", default=None, metavar="PATH",
        help="standalone completion: a .pcd/.npy/.h5/.txt file or a "
        "directory of them — each scan is resampled to the model's input "
        "size, completed through the jitted forward, and written as "
        "<stem>_completion.pcd (beyond-reference: the reference only "
        "completes samples routed through its dataset classes)",
    )
    p.add_argument(
        "--no-normalize", action="store_true",
        help="with --complete: skip mapping scans into the PCN frame "
        "(centroid->origin, max radius 0.5) before the model and back after",
    )
    p.add_argument(
        "--epochs", type=int, default=None, help="override number of epochs"
    )
    p.add_argument(
        "--precision", default=None, choices=["f32", "bf16"],
        help="training compute precision (bf16 = TPU mixed precision: "
        "bf16 image-trunk compute + bf16 flash-attention inputs; default f32 "
        "is the reference-faithful path)",
    )
    p.add_argument(
        "--sp", type=int, default=None,
        help="sequence-parallel axis size (>1 shards SDG tokens over a 2-D "
        "(data, sp) mesh; must divide the device count; default 1 = pure DP)",
    )
    p.add_argument(
        "--progress", action="store_true",
        help="live per-batch loss line (the reference's tqdm postfix, "
        "core/train_pcn.py:129-130) via a one-step-lag pipelined metric "
        "fetch — the device stays a dispatch ahead, so it costs nothing",
    )
    p.add_argument(
        "--dp", default=None, choices=["gspmd", "shard_map"],
        help="DP implementation: gspmd (XLA partitions the jitted graph; "
        "default) or shard_map (per-chip step body — keeps the Pallas fast "
        "paths active on a multi-chip pod)",
    )
    if track == "55":
        p.add_argument(
            "--mode", default=None, choices=["easy", "median", "hard"],
            help="eval crop difficulty",
        )
        p.add_argument(
            "--dataset", default="55", choices=["55", "34", "unseen21"],
            help="index-file preset: ShapeNet-55, ShapeNet-34 (train on 34 "
            "seen categories), or ShapeNet-Unseen21 (eval a 34-trained "
            "model on the 21 held-out ones). The reference switches these "
            "purely via CATEGORY_FILE_PATH (README:61-63).",
        )
    if track == "geospec":
        p.add_argument("--run_id", type=int, default=0, help="run id tag")
    return p


def _apply_overrides(cfg: Config, args) -> Config:
    if args.weights:
        cfg = cfg.replace(weights=args.weights)
    if args.out:
        cfg = cfg.replace(out_path=args.out)
    if args.epochs is not None:
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, n_epochs=args.epochs))
    if getattr(args, "precision", None):
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, precision=args.precision))
    if getattr(args, "sp", None):
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, sp=args.sp))
    if getattr(args, "dp", None):
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, dp=args.dp))
    if getattr(args, "progress", False):
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, progress=True))
    return cfg


def _dispatch(cfg: Config, args, mode=None) -> None:
    from svdformer_pointsea_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from svdformer_pointsea_tpu.train import test_net, train_net
    from svdformer_pointsea_tpu.train.gan import train_net_gan

    print("Use config:")
    pprint(cfg)
    if getattr(args, "complete", None):
        if cfg.weights is None:
            raise SystemExit(
                "--complete needs a trained checkpoint (--weights)!"
            )
        if int(getattr(cfg.train, "sp", 1)) > 1:
            # Same policy as the eval path below: never let a user believe
            # an inapplicable flag took effect. --precision IS honored
            # (infer_files calls set_mixed_precision like test_net).
            raise SystemExit(
                "--sp applies to training only; --complete runs single-"
                "program inference."
            )
        from svdformer_pointsea_tpu.train.infer import infer_files

        outs = infer_files(
            cfg, args.complete, out_dir=args.out,
            normalize=not getattr(args, "no_normalize", False),
        )
        print(f"wrote {len(outs)} completions")
        return
    if not args.test and not args.inference:
        if cfg.network.model == "geospecnet":
            if int(getattr(cfg.train, "sp", 1)) > 1:
                raise SystemExit(
                    "--sp is wired for train_net tracks only (PCN/55/"
                    "PointSea); the GeoSpec GAN trainer runs pure DP."
                )
            # GeoSpec two-optimizer GAN trainer (core/train_geospec.py).
            train_net_gan(cfg)
        else:
            # train_net handles the optional inline adversarial branch of
            # the 55 track (core/train_55.py:115-122) via cfg.train.adv_enabled.
            train_net(cfg)
    else:
        if cfg.weights is None:
            raise SystemExit(
                "Please specify the path to a checkpoint (--weights)!"
            )
        if int(getattr(cfg.train, "sp", 1)) > 1:
            # Sequence parallelism is wired only for training (train_net
            # builds the 2-D mesh); silently ignoring it on eval would let
            # a user believe tokens were sharded.
            raise SystemExit(
                "--sp applies to training only; evaluation runs pure DP."
            )
        test_net(cfg, mode=mode)


def main_pcn(argv=None) -> None:
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.DEBUG
    )
    args = _parser("pcn").parse_args(argv)
    _dispatch(_apply_overrides(pcn_config(), args), args)


def main_55(argv=None) -> None:
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.DEBUG
    )
    args = _parser("55").parse_args(argv)
    if args.dataset == "55":
        cfg = shapenet55_config(mode=args.mode or "easy")
    else:
        from svdformer_pointsea_tpu.configs import shapenet34_config

        cfg = shapenet34_config(
            unseen=args.dataset == "unseen21", mode=args.mode or "easy"
        )
    _dispatch(_apply_overrides(cfg, args), args, mode=args.mode)


def main_kitti(argv=None) -> None:
    """KITTI cars zero-shot eval (no trainer — eval-only track; the
    reference ships only the index, datasets/KITTI.json). Requires
    --weights of a PCN-trained model; always evaluates."""
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.DEBUG
    )
    args = _parser("kitti").parse_args(argv)
    args.test = True  # eval-only track
    _dispatch(_apply_overrides(kitti_config(), args), args)


def main_pointsea(argv=None) -> None:
    """PointSea on PCN data (first-class trainer — the reference ships
    PointSea as a model package only, models_PointSea/PointSea.py:250-285,
    with no core/ driver; here it rides the PCN orchestration with the
    realistic voxel renderer selected by configs.pointsea_config)."""
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.DEBUG
    )
    args = _parser("pointsea").parse_args(argv)
    _dispatch(_apply_overrides(pointsea_config(), args), args)


def main_geospec(argv=None) -> None:
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.DEBUG
    )
    args = _parser("geospec").parse_args(argv)
    cfg = geospec_config()
    if args.run_id:
        cfg = cfg.replace(out_path=f"{cfg.out_path}_{args.run_id}")
    _dispatch(_apply_overrides(cfg, args), args)
