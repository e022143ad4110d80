"""Configuration dataclasses for the three workload tracks.

Values mirror config_pcn.py, config_55.py and config_geospec.py from the
reference; fields are immutable dataclasses rather than a mutable easydict
tree, with ``replace``-style overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Model hyperparameters (config_pcn.py:54-60 / config_55.py:53-59)."""

    step1: int = 4
    step2: int = 8
    merge_points: int = 512
    local_points: int = 512
    view_distance: float = 0.7
    use_pcsa: bool = True
    n_input_points: int = 2048
    # 'sdg' (PCN-style SDG_Decoder) or 'attn' (ShapeNet-55 plain attention).
    decoder: str = "sdg"
    # Which model family: 'svdformer' | 'geospecnet' | 'pointsea'.
    model: str = "svdformer"
    # Self-view depth-image resolution. The reference hard-codes 224
    # (models/model_utils.py:1179-1234, RESOLUTION=224); exposed here so
    # tests/micro-runs can shrink the raster. PointSea's realistic
    # renderer keeps its own fixed 224 grid (mv_utils_zs.py PARAMS).
    resolution: int = 224


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset paths and parameters (config_pcn.py:9-15 / config_55.py:9-13)."""

    name: str = "ShapeNet"  # 'ShapeNet' (PCN) | 'ShapeNet55' | 'KITTI'
    category_file: str = "datasets/ShapeNet.json"
    n_renderings: int = 8
    n_points: int = 2048
    partial_points_path: str = "./dataset/PCN/%s/partial/%s/%s/%02d.pcd"
    complete_points_path: str = "./dataset/PCN/%s/complete/%s/%s.pcd"
    # KITTI cars zero-shot track only (datasets/KITTI.json): per-car bbox
    # txt used by NormalizeObjectPose (utils/data_transforms.py:248-272).
    bbox_path: str = "./dataset/KITTI/bboxes/%s.txt"
    gt_points: int = 16384  # complete cloud size (8192 for ShapeNet-55)
    # ShapeNet-55 eval crop mode: 'easy' | 'median' | 'hard'.
    mode: str = "easy"
    num_workers: int = 4


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (config_pcn.py:65-75 / config_55.py:64-81)."""

    batch_size: int = 12
    n_epochs: int = 400
    save_freq: int = 50
    learning_rate: float = 1e-4
    # MultiStepLR epochs (PCN) or a single step size int (ShapeNet-55 StepLR).
    lr_decay_step: Sequence[int] | int = (40, 80, 120, 160, 200, 240, 280, 320, 360)
    warmup_steps: int = 300
    gamma: float = 0.7
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.0
    # Loss variant: True -> chamfer_sqrt (PCN), False -> squared (ShapeNet-55).
    sqrt_loss: bool = True
    partial_matching: bool = False  # get_loss_PM (ShapeNet-55 / GeoSpec)
    # Adversarial training (config_55.py:76-81 / config_geospec.py:52).
    adv_enabled: bool = False
    adv_lambda_g: float = 0.05
    adv_d_lr: float = 1e-4
    adv_d_steps: int = 1
    gan_weight: float = 0.05  # GeoSpec GAN loss weight
    # Sequence-parallel axis size (parallel/sp.py): >1 builds a 2-D
    # (data, sp) mesh and shards the SDG token axes over sp chips. Must
    # divide the device count. Default 1 = pure data parallelism (the
    # reference-equivalent strategy).
    sp: int = 1
    # Training compute precision: "f32" (reference-faithful default) or
    # "bf16" (TPU mixed precision: bf16 image-trunk compute + bf16
    # flash-attention inputs, params/optimizer f32 — nn/precision.py).
    precision: str = "f32"
    # Live per-batch loss display (the reference's tqdm postfix,
    # core/train_pcn.py:100,129-130). TPU-pipelined: after dispatching
    # step N the host fetches step N-1's metrics, which the device has
    # already finished — live losses without serializing dispatch.
    progress: bool = False
    # DP implementation: "gspmd" (jit + shardings; XLA partitions the
    # graph) or "shard_map" (each chip runs the whole step body on its
    # local batch shard — keeps the Pallas fast paths active per-chip on a
    # real multi-chip pod, where GSPMD would all-gather around every
    # pallas_call). Numerically equivalent (tests/test_shard_map.py);
    # supported by all trainers (incl. GAN tracks); mutually exclusive
    # with sp>1 (which relies on GSPMD).
    dp: str = "gspmd"


@dataclasses.dataclass(frozen=True)
class Config:
    network: NetworkConfig = NetworkConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    out_path: str = "out/svdformer_pcn"
    weights: Optional[str] = None  # checkpoint to resume/test from
    seed: int = 1

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def pcn_config() -> Config:
    """SVDFormer on PCN (config_pcn.py)."""
    return Config()


def shapenet55_config(mode: str = "easy", adv: bool = False) -> Config:
    """SVDFormer on ShapeNet-55 (config_55.py): online crops, 8,192-pt gt.

    ``adv=True`` enables the optional adversarial branch
    (config_55.py:64-81): a SimplePointDiscriminator trained alongside with
    a BCE generator term.
    """
    return Config(
        network=NetworkConfig(
            step1=2,
            step2=4,
            merge_points=1024,
            local_points=1024,
            view_distance=1.5,
            use_pcsa=True,
            decoder="attn",
        ),
        data=DataConfig(
            name="ShapeNet55",
            category_file="datasets/ShapeNet55",
            complete_points_path="./shapenet_pc/%s",
            gt_points=8192,
            mode=mode,
        ),
        train=TrainConfig(
            batch_size=16,
            n_epochs=300,
            save_freq=5,
            lr_decay_step=2,
            gamma=0.98,
            weight_decay=5e-4,  # train_55.py:86-88 AdamW wd
            sqrt_loss=False,
            partial_matching=True,
            adv_enabled=adv,
        ),
        out_path="out/svdformer_55",
    )


def shapenet34_config(unseen: bool = False, mode: str = "easy", adv: bool = False) -> Config:
    """SVDFormer on ShapeNet-34 (or its Unseen-21 test split).

    Identical to the 55 track except for the index-file directory — the
    reference switches splits purely via CATEGORY_FILE_PATH
    (README:61-63): ShapeNet34 trains on 34 seen categories;
    ShapeNet-Unseen21 evaluates that model on the 21 held-out ones.
    """
    cfg = shapenet55_config(mode=mode, adv=adv)
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            category_file=(
                "datasets/ShapeNet-Unseen21" if unseen else "datasets/ShapeNet34"
            ),
        ),
        out_path="out/svdformer_34",
    )


def kitti_config() -> Config:
    """KITTI cars zero-shot evaluation (datasets/KITTI.json, 2,401 real
    LiDAR car scans; no ground truth). Uses a PCN-trained model: partial in
    -> completion out, with the reference's NormalizeObjectPose bbox
    normalization (utils/data_transforms.py:248-272). The reference ships
    the index and the transform but no loader (SURVEY.md §2 #31); this
    track completes the path.
    """
    return Config(
        data=DataConfig(
            name="KITTI",
            category_file="datasets/KITTI.json",
            partial_points_path="./dataset/KITTI/cars/%s.pcd",
            bbox_path="./dataset/KITTI/bboxes/%s.txt",
            n_renderings=1,
        ),
        out_path="out/svdformer_kitti",
    )


def pointsea_config() -> Config:
    """PointSea on PCN data.

    The reference ships PointSea as a model package only — no core/ trainer
    imports it (SURVEY.md §1) — so this config goes beyond the reference:
    it reuses the PCN orchestration with the realistic voxel renderer
    (models_PointSea/mv_utils_zs.py) selected by ``make_renderer``.
    """
    return Config(
        network=NetworkConfig(model="pointsea"),
        out_path="out/pointsea_pcn",
    )


def geospec_config() -> Config:
    """GeoSpecNet + GAN on PCN data (config_geospec.py)."""
    return Config(
        network=NetworkConfig(model="geospecnet"),
        train=TrainConfig(
            sqrt_loss=True,
            partial_matching=True,
        ),
        out_path="out/geospecnet_pcn",
    )
