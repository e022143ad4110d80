"""Data layer tests: native PCD IO, transforms, crop synthesis, loader."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.data import (
    FIXED_CORNERS,
    IO,
    Loader,
    crop_fixed,
    crop_random_resampled,
    make_dataset,
    random_crop_params,
    read_pcd,
    write_pcd,
)
from svdformer_pointsea_tpu.data.io import _load_native, _read_pcd_python
from svdformer_pointsea_tpu.data.transforms import (
    pc_norm,
    random_mirror_points,
    up_sample_points,
)
from svdformer_pointsea_tpu.configs import pcn_config


def test_native_lib_builds():
    assert _load_native() is not None, "native pcdio failed to build"


def test_pcd_ascii_roundtrip(tmp_path, rng):
    pts = rng.rand(100, 3).astype(np.float32)
    path = str(tmp_path / "a.pcd")
    write_pcd(path, pts)
    got = read_pcd(path)
    np.testing.assert_allclose(got, pts, atol=1e-5)
    # Python fallback agrees with the native parser.
    np.testing.assert_allclose(_read_pcd_python(path), pts, atol=1e-5)


def _write_binary_pcd(path, pts, extra_field=False):
    n = len(pts)
    fields = "x y z" + (" rgb" if extra_field else "")
    sizes = "4 4 4" + (" 4" if extra_field else "")
    types = "F F F" + (" U" if extra_field else "")
    counts = "1 1 1" + (" 1" if extra_field else "")
    header = (
        "VERSION 0.7\n"
        f"FIELDS {fields}\nSIZE {sizes}\nTYPE {types}\nCOUNT {counts}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if extra_field:
            rec = np.zeros((n, 4), np.float32)
            rec[:, :3] = pts
            f.write(rec.astype("<f4").tobytes())
        else:
            f.write(pts.astype("<f4").tobytes())


def test_pcd_binary(tmp_path, rng):
    pts = rng.rand(64, 3).astype(np.float32)
    path = str(tmp_path / "b.pcd")
    _write_binary_pcd(path, pts)
    np.testing.assert_allclose(read_pcd(path), pts, atol=1e-6)
    np.testing.assert_allclose(_read_pcd_python(path), pts, atol=1e-6)
    # With an extra interleaved field.
    path2 = str(tmp_path / "b2.pcd")
    _write_binary_pcd(path2, pts, extra_field=True)
    np.testing.assert_allclose(read_pcd(path2), pts, atol=1e-6)


def _lzf_literal_compress(raw: bytes) -> bytes:
    """Valid LZF stream using only literal runs (ctrl < 32)."""
    out = bytearray()
    for i in range(0, len(raw), 32):
        chunk = raw[i : i + 32]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)


def test_pcd_binary_compressed(tmp_path, rng):
    pts = rng.rand(50, 3).astype(np.float32)
    n = len(pts)
    # field-major (SoA) storage
    raw = b"".join(pts[:, i].astype("<f4").tobytes() for i in range(3))
    comp = _lzf_literal_compress(raw)
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        "DATA binary_compressed\n"
    )
    path = str(tmp_path / "c.pcd")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(np.asarray([len(comp), len(raw)], "<u4").tobytes())
        f.write(comp)
    np.testing.assert_allclose(read_pcd(path), pts, atol=1e-6)


def test_upsample_points(rng):
    pts = rng.rand(700, 3).astype(np.float32)
    out = up_sample_points(pts, 2048, np.random.RandomState(0))
    assert out.shape == (2048, 3)
    # Downsampling path.
    out2 = up_sample_points(rng.rand(4000, 3).astype(np.float32), 2048,
                            np.random.RandomState(0))
    assert out2.shape == (2048, 3)


def test_random_mirror_quartiles(rng):
    pts = rng.rand(10, 3).astype(np.float32)
    np.testing.assert_allclose(random_mirror_points(pts, 0.9), pts)
    m1 = random_mirror_points(pts, 0.4)  # x mirror
    np.testing.assert_allclose(m1[:, 0], -pts[:, 0])
    np.testing.assert_allclose(m1[:, 1:], pts[:, 1:])
    m2 = random_mirror_points(pts, 0.6)  # z mirror
    np.testing.assert_allclose(m2[:, 2], -pts[:, 2])
    m3 = random_mirror_points(pts, 0.1)  # both
    np.testing.assert_allclose(m3[:, 0], -pts[:, 0])
    np.testing.assert_allclose(m3[:, 2], -pts[:, 2])


def test_pc_norm(rng):
    pts = rng.rand(100, 3) * 7 + 3
    out = pc_norm(pts)
    assert np.abs(out.mean(0)).max() < 1.0
    assert np.isclose(np.sqrt((out**2).sum(1)).max(), 1.0, atol=1e-6)


def _seprate_numpy(xyz, num_crop, center):
    """Transcription of helpers.py:62-123 for a single sample, fixed crop."""
    d = np.linalg.norm(center[None, :] - xyz, axis=-1)
    idx = np.argsort(d)
    return xyz[idx[num_crop:]], xyz[idx[:num_crop]]


def test_crop_fixed_matches_reference(rng):
    gt = rng.rand(2, 128, 3).astype(np.float32)
    corner = np.broadcast_to(FIXED_CORNERS[2], (2, 3)).copy()
    partial, crop = crop_fixed(jnp.asarray(gt), jnp.asarray(corner), 32)
    for b in range(2):
        ref_in, ref_crop = _seprate_numpy(gt[b], 32, corner[b])
        np.testing.assert_allclose(np.asarray(partial)[b], ref_in, atol=1e-6)
        np.testing.assert_allclose(np.asarray(crop)[b], ref_crop, atol=1e-6)


def test_crop_random_shapes_and_validity(rng):
    B, N = 4, 512
    gt = pc_norm(rng.rand(N, 3).astype(np.float32))[None].repeat(B, 0)
    num_crop, dirs = random_crop_params(np.random.RandomState(1), B, N)
    partial, crop = crop_random_resampled(
        jnp.asarray(gt), jnp.asarray(dirs), jnp.asarray(num_crop), 128
    )
    assert partial.shape == (B, 128, 3)
    assert crop.shape == (B, 128, 3)
    # Every output point must be an actual input point (no zero padding
    # leaked through FPS) — except when a genuine near-origin point exists.
    for b in range(B):
        src = {tuple(np.round(p, 5)) for p in gt[b]}
        for p in np.asarray(partial)[b]:
            assert tuple(np.round(p, 5)) in src


def test_pcn_dataset_and_loader(tmp_path, rng):
    # Synthesize a tiny PCN-format dataset tree + index.
    cfg = pcn_config()
    root = tmp_path / "pcn"
    cats = [{"taxonomy_id": "02691156", "taxonomy_name": "plane",
             "train": ["m0", "m1", "m2"], "val": ["m3"], "test": ["m4"]}]
    index = tmp_path / "ShapeNet.json"
    index.write_text(json.dumps(cats))
    for subset, ids in (("train", ["m0", "m1", "m2"]), ("test", ["m4"])):
        for mid in ids:
            cdir = root / subset / "complete" / "02691156"
            cdir.mkdir(parents=True, exist_ok=True)
            write_pcd(str(cdir / f"{mid}.pcd"), rng.rand(300, 3).astype(np.float32))
            if subset == "train":
                for i in range(2):
                    pdir = root / subset / "partial" / "02691156" / mid
                    pdir.mkdir(parents=True, exist_ok=True)
                    write_pcd(str(pdir / f"{i:02d}.pcd"),
                              rng.rand(150, 3).astype(np.float32))
            else:
                pdir = root / subset / "partial" / "02691156" / f"{mid}"
                pdir.mkdir(parents=True, exist_ok=True)
                write_pcd(str(pdir / "00.pcd"), rng.rand(150, 3).astype(np.float32))

    import dataclasses
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            category_file=str(index),
            n_renderings=2,
            partial_points_path=str(root) + "/%s/partial/%s/%s/%02d.pcd",
            complete_points_path=str(root) + "/%s/complete/%s/%s.pcd",
        )
    )
    ds = make_dataset(cfg, "train")
    assert len(ds) == 3
    tax, mid, data = ds[0]
    assert data["partial_cloud"].shape == (2048, 3)
    assert data["gtcloud"].shape == (300, 3)

    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].data["partial_cloud"].shape == (2, 2048, 3)
    assert batches[1].valid == 1  # padded trailing batch

    ds_test = make_dataset(cfg, "test")
    tax, mid, data = ds_test[0]
    assert data["partial_cloud"].shape == (2048, 3)


def test_extended_transforms_match_reference_semantics(rng):
    """RandomClipPoints + image transforms (utils/data_transforms.py:58-197)."""
    from svdformer_pointsea_tpu.data.transforms import (
        center_crop,
        normalize_image,
        random_background,
        random_clip_points,
        random_crop,
        random_flip,
        random_permute_rgb,
    )

    pc = rng.rand(100, 3).astype(np.float32)
    out = random_clip_points(pc, rng, sigma=0.01, clip=0.05)
    assert np.all(np.abs(out - pc) <= 0.05 + 1e-7) and not np.allclose(out, pc)

    img = rng.rand(10, 10, 3).astype(np.float32)
    n = normalize_image(img, mean=0.5, std=2.0)
    np.testing.assert_allclose(n, img / 2.0 - 0.5, atol=1e-6)

    # Crop with no resize: pure slicing at the shared-draw offset.
    c = random_crop(img, img_size=(4, 4), crop_size=(4, 4), rnd_value=0.0)
    np.testing.assert_allclose(c, img[:4, :4], atol=1e-6)
    cc = center_crop(img, img_size=(4, 4), crop_size=(4, 4))
    np.testing.assert_allclose(cc, img[3:7, 3:7], atol=1e-6)
    # Resizing path keeps values within the input range.
    r = center_crop(img, img_size=(8, 8), crop_size=(4, 4))
    assert r.shape == (8, 8, 3) and r.min() >= img.min() - 1e-6

    np.testing.assert_allclose(
        random_flip(img, 0.9), img[:, ::-1], atol=0
    )
    assert random_flip(img, 0.1) is img

    p = random_permute_rgb(img, np.random.RandomState(0))
    assert sorted(p[0, 0].tolist()) == sorted(img[0, 0].tolist())

    rgba = np.concatenate([img, np.zeros((10, 10, 1), np.float32)], axis=2)
    bg = random_background(rgba, [(10, 10), (20, 20), (30, 30)], rng)
    # alpha==0 everywhere -> pure background color
    np.testing.assert_allclose(
        bg[0, 0], np.asarray([10, 20, 30], np.float32) / 255.0, atol=1e-6
    )


def test_compose_dispatches_new_transforms(rng):
    from svdformer_pointsea_tpu.data.transforms import Compose

    data = {"cloud": rng.rand(64, 3).astype(np.float32)}
    before = data["cloud"].copy()
    pipe = Compose(
        [
            {
                "callback": "RandomClipPoints",
                "parameters": {"sigma": 0.01, "clip": 0.02},
                "objects": ["cloud"],
            }
        ],
        np.random.RandomState(7),
    )
    out = pipe(dict(data))
    assert np.all(np.abs(out["cloud"] - before) <= 0.02 + 1e-7)


def test_normalize_object_pose_compose_semantics(rng):
    """NormalizeObjectPose runs once per sample via parameters['input_keys']
    (utils/data_transforms.py:30-31,248-272) and normalizes the bbox too."""
    from svdformer_pointsea_tpu.data.transforms import Compose

    cloud = rng.rand(50, 3).astype(np.float32) * 4 + 1
    # A yaw-rotated unit box: corners ordered so bbox[0]/bbox[3] span x.
    yaw = 0.7
    rot = np.asarray(
        [[np.cos(yaw), np.sin(yaw), 0], [-np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    )
    base = np.asarray(
        [[-1, -0.5, 0], [-1, 0.5, 0], [1, 0.5, 0], [1, -0.5, 0],
         [-1, -0.5, 1], [-1, 0.5, 1], [1, 0.5, 1], [1, -0.5, 1]],
        np.float32,
    )
    bbox = (base @ rot).astype(np.float32) + 3.0
    pipe = Compose(
        [
            {
                "callback": "NormalizeObjectPose",
                "parameters": {
                    "input_keys": {"ptcloud": "partial_cloud", "bbox": "bounding_box"}
                },
                "objects": ["partial_cloud"],
            }
        ],
        np.random.RandomState(0),
    )
    out = pipe({"partial_cloud": cloud.copy(), "bounding_box": bbox.copy()})
    nb = out["bounding_box"]
    # bbox is centered and unit-scaled along its yaw axis after the pass.
    np.testing.assert_allclose((nb.min(0) + nb.max(0)) / 2, 0, atol=1e-5)
    np.testing.assert_allclose(nb[3, 0] - nb[0, 0], 1.0, atol=1e-5)
    # cloud is mapped into the same canonical frame (y/z axes swapped).
    assert np.abs(out["partial_cloud"]).max() < 10


def test_flash_block_selection_divides():
    """Forward flash blocks must divide the sequence lengths for every
    eligible (multiple-of-512) shape (nn/layers.py:_flash_blocks)."""
    from svdformer_pointsea_tpu.nn.layers import _flash_blocks

    for qn in (512, 1024, 1536, 2048, 2560, 4096, 16384):
        for kn in (512, 1024, 1536, 2048, 3072, 4096):
            nq, nk = _flash_blocks(qn, kn)
            assert qn % nq == 0, (qn, nq)
            assert kn % nk == 0, (kn, nk)
            assert not (nq == qn and nk == kn) or qn <= 512


def test_kitti_dataset_loader(tmp_path, rng):
    """KITTI cars zero-shot loader: pose-normalize via bbox, sample to
    n_points (datasets/KITTI.json layout; pcn test_kitti.py normalization)."""
    from svdformer_pointsea_tpu.configs import kitti_config

    index = tmp_path / "KITTI.json"
    ids = ["frame_27_car_0", "frame_27_car_1", "frame_30_car_2"]
    index.write_text(json.dumps(
        [{"taxonomy_id": "kitti-car", "taxonomy_name": "Car", "test": ids}]
    ))
    (tmp_path / "cars").mkdir()
    (tmp_path / "bboxes").mkdir()
    for mid in ids:
        pts = rng.rand(137, 3).astype(np.float32) * 2.0 + 1.0
        write_pcd(str(tmp_path / "cars" / f"{mid}.pcd"), pts)
        # 8-corner axis-aligned box around the points.
        lo, hi = pts.min(0), pts.max(0)
        corners = np.array(
            [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
             for z in (lo[2], hi[2])], dtype=np.float32)
        np.savetxt(str(tmp_path / "bboxes" / f"{mid}.txt"), corners)

    import dataclasses
    cfg = kitti_config()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data,
        category_file=str(index),
        partial_points_path=str(tmp_path) + "/cars/%s.pcd",
        bbox_path=str(tmp_path) + "/bboxes/%s.txt",
    ))
    ds = make_dataset(cfg, "test")
    assert len(ds) == 3
    tax, mid, data = ds[0]
    assert tax == "kitti-car" and mid == ids[0]
    cloud = data["partial_cloud"]
    assert cloud.shape == (cfg.data.n_points, 3)
    # Pose normalization brings the scan into a ~unit canonical frame.
    assert np.abs(cloud).max() < 2.0
    assert "bounding_box" not in data

    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=0)
    batches = list(loader)
    assert batches[0].data["partial_cloud"].shape == (2, cfg.data.n_points, 3)
    assert batches[1].valid == 1


def test_shapenet34_presets_and_index_format(tmp_path, rng):
    """34/Unseen-21 presets differ from 55 only by the index directory
    (reference README:61-63); loader consumes the same txt format."""
    from svdformer_pointsea_tpu.configs import shapenet34_config, shapenet55_config

    c34 = shapenet34_config()
    c21 = shapenet34_config(unseen=True)
    c55 = shapenet55_config()
    assert c34.data.category_file.endswith("ShapeNet34")
    assert c21.data.category_file.endswith("ShapeNet-Unseen21")
    # Everything else matches the 55 track.
    assert c34.data.gt_points == c55.data.gt_points == 8192
    assert c34.network == c55.network

    # Synthesize a ShapeNet-34-shaped index: <taxonomy>-<model_id> lines.
    idx_dir = tmp_path / "ShapeNet34"
    idx_dir.mkdir()
    root = tmp_path / "shapenet55"
    root.mkdir()
    lines = []
    for i in range(3):
        name = f"0269115{i}-deadbeef{i}"
        lines.append(name)
        np.save(str(root / f"{name}.npy"),
                rng.rand(8192, 3).astype(np.float32))
    (idx_dir / "test.txt").write_text("\n".join(lines) + "\n")

    import dataclasses
    cfg = c34.replace(data=dataclasses.replace(
        c34.data,
        category_file=str(idx_dir),
        complete_points_path=str(root) + "/%s.npy",
    ))
    ds = make_dataset(cfg, "test")
    assert len(ds) == 3
    tax, mid, data = ds[0]
    assert tax == "02691150" and mid == "deadbeef0"
    gt = data["gtcloud"]
    assert gt.shape == (8192, 3)
    # pc_norm applied: centered, unit-sphere.
    np.testing.assert_allclose(gt.mean(0), 0, atol=1e-4)
    assert np.linalg.norm(gt, axis=1).max() <= 1.0 + 1e-5


def test_kitti_fidelity_masks_pad_rows(rng):
    """KITTI fidelity must average over REAL input points only: the loader
    zero-pads scans shorter than n_points (transforms.random_sample_points),
    and origin->completion distances from pad rows would otherwise dominate
    the metric (most KITTI scans have far fewer than 2048 points)."""
    from svdformer_pointsea_tpu.nn import SVDFormer
    from svdformer_pointsea_tpu.ops import nn_squared_distance
    from svdformer_pointsea_tpu.render import PCViews
    from svdformer_pointsea_tpu.train.evaluate import make_kitti_eval_fn
    import jax

    model = SVDFormer(step1=2, step2=2, merge_points=32, local_points=32)
    render = PCViews(trans=-0.7, resolution=16)
    N, n_real = 128, 37
    partial = np.zeros((1, N, 3), np.float32)
    partial[0, :n_real] = rng.rand(n_real, 3).astype(np.float32) * 0.4 + 0.1
    partial = jnp.asarray(partial)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), partial, render.get_img(partial)
    )
    eval_fn = make_kitti_eval_fn(model, render)
    preds, fid = eval_fn(variables, partial)

    d = np.sqrt(np.asarray(nn_squared_distance(partial, preds[None][0])))
    expected = d[0, :n_real].mean()
    np.testing.assert_allclose(float(fid[0]), expected, rtol=1e-5)
    # and it must differ from the naive all-rows mean (pad rows excluded)
    assert not np.isclose(float(fid[0]), d[0].mean(), rtol=1e-3)


def test_loader_abandoned_iterator_releases_producer(rng):
    """Breaking out of a Loader mid-epoch (max_steps) must not leave the
    prefetch producer blocked on the full queue forever."""
    import threading
    import time as _time

    class SlowDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return ("t", f"m{i}", {"x": np.zeros((4, 3), np.float32)})

    loader = Loader(SlowDataset(), batch_size=2, prefetch=2, num_workers=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # consumer abandons mid-epoch
    deadline = _time.time() + 10.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before, "producer thread leaked"


def test_loader_runs_are_reproducible(tmp_path, rng):
    """Two Loaders with the same seed must yield IDENTICAL batches despite
    threaded prefetch: per-(seed, epoch, index) rng seeding removes the
    shared-stream thread race (reference process workers are seeded
    deterministically; a raced stream made runs non-reproducible)."""
    # Build a tiny PCN tree inline (train subset with 4 renderings so the
    # rendering pick exercises the per-sample rng).
    import json as _json

    ids = ["m0", "m1", "m2", "m3", "m4"]
    index = tmp_path / "ShapeNet.json"
    index.write_text(_json.dumps(
        [{"taxonomy_id": "02691156", "taxonomy_name": "plane",
          "train": ids, "val": ids[:1], "test": ids[:1]}]
    ))
    root = tmp_path / "pcn"
    for mid in ids:
        cdir = root / "train" / "complete" / "02691156"
        cdir.mkdir(parents=True, exist_ok=True)
        write_pcd(str(cdir / f"{mid}.pcd"), rng.rand(64, 3).astype(np.float32))
        pdir = root / "train" / "partial" / "02691156" / mid
        pdir.mkdir(parents=True, exist_ok=True)
        for i in range(4):
            write_pcd(str(pdir / f"{i:02d}.pcd"),
                      rng.rand(50, 3).astype(np.float32))

    import dataclasses
    cfg = pcn_config()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data,
        category_file=str(index),
        n_renderings=4,
        n_points=64,
        partial_points_path=str(root) + "/%s/partial/%s/%s/%02d.pcd",
        complete_points_path=str(root) + "/%s/complete/%s/%s.pcd",
    ))

    def run():
        ds = make_dataset(cfg, "train", seed=7)
        loader = Loader(ds, batch_size=2, shuffle=True, seed=7, num_workers=4)
        epochs = []
        for _ in range(2):  # augmentation must differ ACROSS epochs...
            epochs.append([{k: v.copy() for k, v in b.data.items()}
                           for b in loader])
        return epochs

    a, b = run(), run()
    # ...but be identical ACROSS runs, epoch by epoch, batch by batch.
    for ea, eb in zip(a, b):
        for ba, bb in zip(ea, eb):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])
    # and epoch 1 != epoch 2 within a run (rendering pick / mirror vary)
    diff = any(
        not np.array_equal(ba[k], bb[k])
        for ba, bb in zip(a[0], a[1]) for k in ba
    )
    assert diff, "augmentation did not vary across epochs"
