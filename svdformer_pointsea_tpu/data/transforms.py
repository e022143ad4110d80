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


def normalize_object_pose(
    ptcloud: np.ndarray, bbox: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """KITTI-style bbox pose normalization (utils/data_transforms.py:248-272).

    Returns (normalized ptcloud, normalized bbox). Deliberate delta from the
    reference: there, only the *centering* writes back to the sample's bbox —
    ``bbox = np.dot(bbox, rotation)`` rebinds the local, so the rotation and
    unit-scale are silently dropped from the stored bbox (an accidental
    rebind; nothing downstream reads the bbox, so it is unobservable there).
    We store the fully normalized bbox, which is what the code plainly
    intends. The returned *point cloud* matches the reference exactly.
    """
    bbox = bbox.copy().astype(np.float64)
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
    bbox /= scale
    ptcloud = (ptcloud - center) @ rotation / scale
    ptcloud = ptcloud @ np.asarray([[1, 0, 0], [0, 0, 1], [0, 1, 0]], ptcloud.dtype)
    return ptcloud.astype(np.float32), bbox.astype(np.float32)


def random_clip_points(
    ptcloud: np.ndarray,
    rng: np.random.RandomState,
    sigma: float = 0.01,
    clip: float = 0.05,
) -> np.ndarray:
    """Clipped gaussian jitter (utils/data_transforms.py:190-197)."""
    noise = np.clip(sigma * rng.randn(*ptcloud.shape), -clip, clip)
    return ptcloud + noise.astype(np.float32)


# --- image transforms (utils/data_transforms.py:58-150) -------------------
# Capability parity for the reference's 2D-image pipelines (unused by the
# three shipped tracks, which consume point clouds only). Resizes are
# bilinear in pure numpy (the reference relies on cv2.resize's default).


def normalize_image(img: np.ndarray, mean, std) -> np.ndarray:
    """(img / std) - mean, matching the reference's (unusual) operation
    order (utils/data_transforms.py:58-68)."""
    img = img.astype(np.float32)
    return img / std - mean


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    img = img.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def _crop_resize(
    img: np.ndarray, crop_h: int, crop_w: int, out_h: int, out_w: int, frac: float
) -> np.ndarray:
    img_w, img_h = img.shape[0], img.shape[1]  # reference's (w, h) naming
    x_left = int((img_w - crop_w) * frac)
    y_top = int((img_h - crop_h) * frac)
    patch = img[y_top : y_top + crop_h, x_left : x_left + crop_w]
    out = _bilinear_resize(patch, out_h, out_w)
    return out[..., None] if out.ndim == 2 else out


def center_crop(img, img_size, crop_size) -> np.ndarray:
    """Centered crop + resize (utils/data_transforms.py:71-89)."""
    return _crop_resize(img, crop_size[0], crop_size[1], img_size[0], img_size[1], 0.5)


def random_crop(img, img_size, crop_size, rnd_value: float) -> np.ndarray:
    """Shared-draw random crop + resize (utils/data_transforms.py:92-110)."""
    return _crop_resize(
        img, crop_size[0], crop_size[1], img_size[0], img_size[1], rnd_value
    )


def random_flip(img: np.ndarray, rnd_value: float) -> np.ndarray:
    """Horizontal flip at p=0.5 (utils/data_transforms.py:113-121)."""
    return np.fliplr(img) if rnd_value > 0.5 else img


def random_permute_rgb(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Random channel permutation (utils/data_transforms.py:124-130)."""
    return img[..., rng.permutation(3)]


def random_background(
    img: np.ndarray, bg_color_range, rng: np.random.RandomState
) -> np.ndarray:
    """Composite RGBA onto a random solid background
    (utils/data_transforms.py:133-150)."""
    if img.shape[2] != 4:
        return img
    rgb = [
        rng.randint(bg_color_range[i][0], bg_color_range[i][1] + 1)
        for i in range(3)
    ]
    alpha = (img[:, :, 3:4] == 0).astype(np.float32)
    return alpha * (np.asarray([[rgb]], np.float32) / 255.0) + (1 - alpha) * img[:, :, :3]


class Compose:
    """Pipeline of {callback, objects} steps over a sample dict, with one
    shared random draw per step (utils/data_transforms.py:14-42 semantics)."""

    def __init__(self, steps: Sequence[Dict], rng: np.random.RandomState):
        self.steps = steps
        self.rng = rng

    def __call__(
        self,
        data: Dict[str, np.ndarray],
        rng: "np.random.RandomState | None" = None,
    ) -> Dict[str, np.ndarray]:
        # ``rng`` overrides the shared stream: the Loader passes a
        # per-(epoch, index) RandomState so threaded prefetch stays
        # run-to-run deterministic (a shared stream consumed from worker
        # threads races on interleaving order).
        r = self.rng if rng is None else rng
        for step in self.steps:
            cb = step["callback"]
            params = step.get("parameters", {})
            objects = step.get("objects", ())
            rnd_value = r.uniform(0, 1)
            if cb == "NormalizeObjectPose":
                # Applied once to the whole sample, not per object key
                # (utils/data_transforms.py:30-31); ``input_keys`` names the
                # cloud and bbox entries, and the bbox is normalized too.
                keys = params["input_keys"]
                pt, bbox = normalize_object_pose(
                    data[keys["ptcloud"]], data[keys["bbox"]]
                )
                data[keys["ptcloud"]] = pt
                data[keys["bbox"]] = bbox
                continue
            for k in list(data.keys()):
                if k not in objects:
                    continue
                if cb == "UpSamplePoints":
                    data[k] = up_sample_points(data[k], params["n_points"], r)
                elif cb == "RandomSamplePoints":
                    data[k] = random_sample_points(data[k], params["n_points"], r)
                elif cb == "RandomMirrorPoints":
                    data[k] = random_mirror_points(data[k], rnd_value)
                elif cb == "RandomRotatePoints":
                    data[k] = random_rotate_points(data[k], rnd_value)
                elif cb == "ScalePoints":
                    data[k] = scale_points(data[k], r)
                elif cb == "RandomClipPoints":
                    data[k] = random_clip_points(
                        data[k],
                        r,
                        sigma=params.get("sigma", 0.01),
                        clip=params.get("clip", 0.05),
                    )
                elif cb == "Normalize":
                    data[k] = normalize_image(data[k], params["mean"], params["std"])
                elif cb == "CenterCrop":
                    data[k] = center_crop(data[k], params["img_size"], params["crop_size"])
                elif cb == "RandomCrop":
                    data[k] = random_crop(
                        data[k], params["img_size"], params["crop_size"], rnd_value
                    )
                elif cb == "RandomFlip":
                    data[k] = random_flip(data[k], rnd_value)
                elif cb == "RandomPermuteRGB":
                    data[k] = random_permute_rgb(data[k], r)
                elif cb == "RandomBackground":
                    data[k] = random_background(data[k], params["bg_color"], self.rng)
                elif cb == "ToArray":
                    data[k] = np.ascontiguousarray(data[k], np.float32)
                else:
                    raise ValueError(f"unknown transform {cb}")
        return data
