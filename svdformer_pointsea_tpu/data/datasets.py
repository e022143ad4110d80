"""Dataset index parsing + sample loading (utils/data_loaders.py surface).

Index files are consumed in the reference's formats — ShapeNet.json for the
PCN track, ShapeNet55/34/Unseen-21 ``{train,test}.txt`` lists for the 55
track — from paths given in ``DataConfig`` (point them at your dataset
install; the formats are documented in the reference README:61-63).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from svdformer_pointsea_tpu.configs import Config
from svdformer_pointsea_tpu.data.io import IO
from svdformer_pointsea_tpu.data.transforms import Compose, pc_norm

SUBSETS = ("train", "val", "test")

# PCN taxonomy label mapping (utils/data_loaders.py:14-23).
LABEL_MAPPING = {
    3: "03001627",
    6: "04379243",
    5: "04256520",
    1: "02933112",
    4: "03636649",
    2: "02958343",
    0: "02691156",
    7: "04530566",
}


@dataclasses.dataclass
class Sample:
    taxonomy_id: str
    model_id: str
    partial_paths: Optional[List[str]]  # None for ShapeNet-55 (online crops)
    gt_path: str


class PCNDataset:
    """PCN-track dataset: on-disk partial scans + complete clouds.

    Mirrors utils/data_loaders.py:86-203: at train time one of
    ``n_renderings`` partial scans is picked at random; transforms upsample
    the partial to ``n_points`` and (train only) mirror both clouds.
    """

    def __init__(self, cfg: Config, subset: str, seed: int = 0):
        assert subset in SUBSETS
        self.cfg = cfg
        self.subset = subset
        self.rng = np.random.RandomState(seed)
        self.samples = self._index(cfg, subset)
        steps = [
            {
                "callback": "UpSamplePoints",
                "parameters": {"n_points": cfg.data.n_points},
                "objects": ["partial_cloud"],
            }
        ]
        if subset == "train":
            steps.append(
                {"callback": "RandomMirrorPoints", "objects": ["partial_cloud", "gtcloud"]}
            )
        steps.append(
            {"callback": "ToArray", "objects": ["partial_cloud", "gtcloud"]}
        )
        self.transforms = Compose(steps, self.rng)

    @staticmethod
    def _index(cfg: Config, subset: str) -> List[Sample]:
        with open(cfg.data.category_file) as f:
            categories = json.load(f)
        n_rend = cfg.data.n_renderings if subset == "train" else 1
        samples = []
        for dc in categories:
            tax = dc["taxonomy_id"]
            for s in dc[subset]:
                if subset == "test":
                    # Reference test path surgery (utils/data_loaders.py:186):
                    # single rendering '00' under the partial tree.
                    gt = cfg.data.complete_points_path % (subset, tax, s)
                    part = gt.replace("complete", "partial")
                    partials = [part[:-4] + "/00" + part[-4:]]
                else:
                    partials = [
                        cfg.data.partial_points_path % (subset, tax, s, i)
                        for i in range(n_rend)
                    ]
                    gt = cfg.data.complete_points_path % (subset, tax, s)
                samples.append(Sample(tax, s, partials, gt))
        logging.info("Indexed %d %s samples", len(samples), subset)
        return samples

    def __len__(self) -> int:
        return len(self.samples)

    # Loader passes a per-(epoch, index) rng for deterministic threaded
    # prefetch (data/pipeline.py); direct indexing uses the shared stream.
    per_sample_rng = True

    def __getitem__(self, idx: int, rng=None):
        s = self.samples[idx]
        r = self.rng if rng is None else rng
        if self.subset == "train" and len(s.partial_paths) > 1:
            ri = r.randint(0, len(s.partial_paths))
        else:
            ri = 0
        data = {
            "partial_cloud": IO.get(s.partial_paths[ri]).astype(np.float32),
            "gtcloud": IO.get(s.gt_path).astype(np.float32),
        }
        data = self.transforms(data, rng=rng)
        return s.taxonomy_id, s.model_id, data


class ShapeNet55Dataset:
    """ShapeNet-55/34/Unseen-21 dataset: complete clouds only, unit-sphere
    normalized; partials are synthesized online (utils/data_loaders.py:206-294).

    The 55 / 34 / Unseen-21 splits differ only by the index-file directory
    (reference README:61-63).
    """

    def __init__(self, cfg: Config, subset: str, seed: int = 0):
        subset = "train" if subset == "train" else "test"
        self.cfg = cfg
        self.subset = subset
        self.rng = np.random.RandomState(seed)
        index = os.path.join(cfg.data.category_file, subset + ".txt")
        self.samples: List[Sample] = []
        with open(index) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                tax = line.split("-")[0]
                model_id = line.split("-")[1].split(".")[0]
                self.samples.append(
                    Sample(tax, model_id, None, cfg.data.complete_points_path % line)
                )
        logging.info("Indexed %d %s samples", len(self.samples), subset)

    def __len__(self) -> int:
        return len(self.samples)

    per_sample_rng = True  # no draws in __getitem__, accepted for uniformity

    def __getitem__(self, idx: int, rng=None):
        s = self.samples[idx]
        gt = pc_norm(IO.get(s.gt_path).astype(np.float32)).astype(np.float32)
        return s.taxonomy_id, s.model_id, {"gtcloud": gt}


class KITTIDataset:
    """KITTI cars zero-shot evaluation set (datasets/KITTI.json — 2,401 real
    LiDAR car scans, no ground truth).

    The reference ships the index and the NormalizeObjectPose transform
    (utils/data_transforms.py:248-272) but no loader; the layout follows the
    PCN-paper KITTI release: ``cars/<id>.pcd`` partial scans +
    ``bboxes/<id>.txt`` 8-corner boxes. Each sample is pose-normalized into
    the canonical frame, then sampled to ``n_points`` — ready for a
    PCN-trained model.
    """

    def __init__(self, cfg: Config, subset: str = "test", seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        with open(cfg.data.category_file) as f:
            categories = json.load(f)
        self.samples: List[Sample] = []
        for dc in categories:
            for s in dc.get("test", []):
                self.samples.append(
                    Sample(
                        dc["taxonomy_id"],
                        s,
                        [cfg.data.partial_points_path % s],
                        cfg.data.bbox_path % s,  # gt_path slot carries the bbox
                    )
                )
        logging.info("Indexed %d KITTI samples", len(self.samples))
        self.transforms = Compose(
            [
                {
                    "callback": "NormalizeObjectPose",
                    "parameters": {
                        "input_keys": {
                            "ptcloud": "partial_cloud",
                            "bbox": "bounding_box",
                        }
                    },
                    "objects": ["partial_cloud", "bounding_box"],
                },
                {
                    "callback": "RandomSamplePoints",
                    "parameters": {"n_points": cfg.data.n_points},
                    "objects": ["partial_cloud"],
                },
                {"callback": "ToArray", "objects": ["partial_cloud"]},
            ],
            self.rng,
        )

    def __len__(self) -> int:
        return len(self.samples)

    per_sample_rng = True

    def __getitem__(self, idx: int, rng=None):
        s = self.samples[idx]
        data = {
            "partial_cloud": IO.get(s.partial_paths[0]).astype(np.float32),
            "bounding_box": IO.get(s.gt_path).astype(np.float32),
        }
        data = self.transforms(data, rng=rng)
        data.pop("bounding_box", None)
        return s.taxonomy_id, s.model_id, data


DATASET_MAPPING = {
    "ShapeNet": PCNDataset,
    "ShapeNet55": ShapeNet55Dataset,
    "KITTI": KITTIDataset,
}


def make_dataset(cfg: Config, subset: str, seed: int = 0):
    return DATASET_MAPPING[cfg.data.name](cfg, subset, seed=seed)
