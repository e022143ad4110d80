"""Host-side numpy data transforms (utils/data_transforms.py equivalents).

Keyed-compose semantics preserved: transforms in a pipeline share one random
draw per sample (Compose draws ``rnd_value`` once per transform application,
utils/data_transforms.py:31-40), so mirroring is applied consistently to the
partial and complete clouds.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def up_sample_points(ptcloud: np.ndarray, n_points: int, rng: np.random.RandomState) -> np.ndarray:
    """Tile + permute to exactly ``n_points`` (utils/data_transforms.py:153-172)."""
    curr = ptcloud.shape[0]
    need = n_points - curr
    if need < 0:
        return ptcloud[rng.permutation(n_points)]
    while curr <= need:
        ptcloud = np.tile(ptcloud, (2, 1))
        need -= curr
        curr *= 2
    choice = rng.permutation(need)
    return np.concatenate([ptcloud, ptcloud[choice]])


def random_sample_points(ptcloud: np.ndarray, n_points: int, rng: np.random.RandomState) -> np.ndarray:
    """Random subset, zero-padded (utils/data_transforms.py:175-186)."""
    choice = rng.permutation(ptcloud.shape[0])
    ptcloud = ptcloud[choice[:n_points]]
    if ptcloud.shape[0] < n_points:
        zeros = np.zeros((n_points - ptcloud.shape[0], 3), ptcloud.dtype)
        ptcloud = np.concatenate([ptcloud, zeros])
    return ptcloud


_MIRROR_X = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
_MIRROR_Z = np.diag([1.0, 1.0, -1.0]).astype(np.float32)


def random_mirror_matrix(rnd_value: float) -> np.ndarray:
    """Mirror transform by quartile (utils/data_transforms.py:228-245)."""
    m = np.eye(3, dtype=np.float32)
    if rnd_value <= 0.25:
        m = _MIRROR_Z @ _MIRROR_X @ m
    elif rnd_value <= 0.5:
        m = _MIRROR_X @ m
    elif rnd_value <= 0.75:
        m = _MIRROR_Z @ m
    return m


def random_mirror_points(ptcloud: np.ndarray, rnd_value: float) -> np.ndarray:
    m = random_mirror_matrix(rnd_value)
    out = ptcloud.copy()
    out[:, :3] = ptcloud[:, :3] @ m.T
    return out


def random_rotate_points(ptcloud: np.ndarray, rnd_value: float) -> np.ndarray:
    """Rotation about +y by 2*pi*rnd (utils/data_transforms.py:203-211)."""
    angle = 2 * np.pi * rnd_value
    c, s = np.cos(angle), np.sin(angle)
    rot = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    out = ptcloud.copy()
    out[:, :3] = ptcloud[:, :3] @ rot.T
    return out


def scale_points(ptcloud: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Random uniform scale in [0.85, 0.95) (utils/data_transforms.py:214-225)."""
    return ptcloud * (rng.randint(85, 95) * 0.01)


def pc_norm(pc: np.ndarray) -> np.ndarray:
    """Center + unit-sphere normalize (utils/data_loaders.py:221-227)."""
    centroid = np.mean(pc, axis=0)
    pc = pc - centroid
    m = np.max(np.sqrt(np.sum(pc**2, axis=1)))
    return pc / m


def normalize_object_pose(ptcloud: np.ndarray, bbox: np.ndarray) -> np.ndarray:
    """KITTI-style bbox pose normalization (utils/data_transforms.py:248-272)."""
    bbox = bbox.copy()
    center = (bbox.min(0) + bbox.max(0)) / 2
    bbox -= center
    yaw = np.arctan2(bbox[3, 1] - bbox[0, 1], bbox[3, 0] - bbox[0, 0])
    rotation = np.asarray(
        [
            [np.cos(yaw), -np.sin(yaw), 0],
            [np.sin(yaw), np.cos(yaw), 0],
            [0, 0, 1],
        ]
    )
    bbox = bbox @ rotation
    scale = bbox[3, 0] - bbox[0, 0]
    ptcloud = (ptcloud - center) @ rotation / scale
    return ptcloud @ np.asarray([[1, 0, 0], [0, 0, 1], [0, 1, 0]], ptcloud.dtype)


class Compose:
    """Pipeline of {callback, objects} steps over a sample dict, with one
    shared random draw per step (utils/data_transforms.py:14-42 semantics)."""

    def __init__(self, steps: Sequence[Dict], rng: np.random.RandomState):
        self.steps = steps
        self.rng = rng

    def __call__(self, data: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        for step in self.steps:
            cb = step["callback"]
            params = step.get("parameters", {})
            objects = step["objects"]
            rnd_value = self.rng.uniform(0, 1)
            for k in list(data.keys()):
                if k not in objects:
                    continue
                if cb == "UpSamplePoints":
                    data[k] = up_sample_points(data[k], params["n_points"], self.rng)
                elif cb == "RandomSamplePoints":
                    data[k] = random_sample_points(data[k], params["n_points"], self.rng)
                elif cb == "RandomMirrorPoints":
                    data[k] = random_mirror_points(data[k], rnd_value)
                elif cb == "RandomRotatePoints":
                    data[k] = random_rotate_points(data[k], rnd_value)
                elif cb == "ScalePoints":
                    data[k] = scale_points(data[k], self.rng)
                elif cb == "ToArray":
                    data[k] = np.ascontiguousarray(data[k], np.float32)
                else:
                    raise ValueError(f"unknown transform {cb}")
        return data
