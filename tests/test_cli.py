"""CLI flag plumbing tests (no training — _dispatch is intercepted).

The reference exposes dataset switching only by editing
CATEGORY_FILE_PATH in config_55.py (README:61-63); here the 34 and
Unseen-21 presets are first-class `--dataset` choices on main_55.
"""

import pytest

from svdformer_pointsea_tpu import cli


def _capture_dispatch(monkeypatch):
    seen = {}

    def fake_dispatch(cfg, args, mode=None):
        seen["cfg"], seen["args"], seen["mode"] = cfg, args, mode

    monkeypatch.setattr(cli, "_dispatch", fake_dispatch)
    return seen


@pytest.mark.parametrize(
    "flag,suffix",
    [("55", "ShapeNet55"), ("34", "ShapeNet34"), ("unseen21", "ShapeNet-Unseen21")],
)
def test_main_55_dataset_presets(monkeypatch, flag, suffix):
    seen = _capture_dispatch(monkeypatch)
    cli.main_55(["--dataset", flag, "--mode", "median", "--test", "--weights", "w"])
    cfg = seen["cfg"]
    assert cfg.data.category_file.endswith(suffix)
    assert seen["mode"] == "median"
    # 34/Unseen-21 share the 55 network/geometry (category index only).
    assert cfg.data.gt_points == 8192


def test_main_55_default_dataset(monkeypatch):
    seen = _capture_dispatch(monkeypatch)
    cli.main_55(["--test", "--weights", "w"])
    assert seen["cfg"].data.category_file.endswith("ShapeNet55")


def test_main_pointsea(monkeypatch):
    """PointSea rides the PCN orchestration: model family + realistic
    renderer come from pointsea_config, flags plumb through."""
    seen = _capture_dispatch(monkeypatch)
    cli.main_pointsea(["--test", "--weights", "w", "--precision", "bf16"])
    cfg = seen["cfg"]
    assert cfg.network.model == "pointsea"
    assert cfg.weights == "w"
    assert cfg.train.precision == "bf16"
    assert cfg.data.gt_points == 16384  # PCN geometry
