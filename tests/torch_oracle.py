"""Run the reference PyTorch implementation (/root/reference) as a CPU oracle.

The reference's native ops are CUDA-only (pointnet2_ops, chamfer3D), so this
module injects pure-torch CPU stand-ins into ``sys.modules`` *before*
importing the reference model code. The stand-ins replicate the CUDA
semantics documented in SURVEY.md §2.2:

- ``furthest_point_sample`` — start at index 0, running-min-distance argmax,
  points with ||p||^2 <= 1e-3 skipped (sampling_gpu.cu:69-229);
- ``gather_operation`` / ``grouping_operation`` — plain index gathers
  (sampling_gpu.cu:8-57, group_points_gpu.cu:8-75);
- ``three_nn`` / ``three_interpolate`` — brute-force 3-NN with sqrt
  distances + inverse-distance interpolation (interpolate_gpu.cu:9-154);
- ``ball_query`` — in-order scan, pad-with-first (ball_query_gpu.cu:9-54);
- ``chamfer_3DDist`` — exact squared NN distances both directions
  (chamfer3D.cu:12-196).

None of this code is shipped in the package — it exists purely so tests can
compare the TPU-native reimplementation against the genuine reference
forward pass, weight-for-weight.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def _install_stubs(torch):
    if "pointnet2_ops" in sys.modules:
        return

    def furthest_point_sample(xyz, npoint):
        # xyz (B, N, 3) float -> (B, npoint) int32
        B, N, _ = xyz.shape
        idxs = torch.zeros(B, npoint, dtype=torch.int32)
        mind = torch.full((B, N), 1e10)
        valid = (xyz**2).sum(-1) > 1e-3
        last = torch.zeros(B, dtype=torch.long)
        neg_inf = torch.full_like(mind, -float("inf"))
        for j in range(1, npoint):
            last_pt = xyz[torch.arange(B), last]  # (B, 3)
            d = ((xyz - last_pt[:, None]) ** 2).sum(-1)
            mind = torch.minimum(mind, d)
            cand = torch.where(valid, mind, neg_inf)
            last = cand.argmax(-1)
            idxs[:, j] = last.to(torch.int32)
        return idxs

    def gather_operation(features, idx):
        # (B, C, N), (B, S) -> (B, C, S)
        idx = idx.long()[:, None, :].expand(-1, features.shape[1], -1)
        return torch.gather(features, 2, idx)

    def grouping_operation(features, idx):
        # (B, C, N), (B, S, K) -> (B, C, S, K)
        B, C, _ = features.shape
        _, S, K = idx.shape
        flat = idx.long().reshape(B, 1, S * K).expand(-1, C, -1)
        return torch.gather(features, 2, flat).reshape(B, C, S, K)

    def ball_query(radius, nsample, xyz, new_xyz):
        # (B, N, 3), (B, S, 3) -> (B, S, nsample) int32, pad-with-first
        d2 = ((new_xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)
        hit = d2 < radius * radius
        B, S, N = hit.shape
        out = torch.zeros(B, S, nsample, dtype=torch.int32)
        for b in range(B):
            for s in range(S):
                ids = torch.nonzero(hit[b, s]).flatten()
                if len(ids) == 0:
                    continue
                row = torch.full((nsample,), ids[0], dtype=torch.int32)
                take = min(nsample, len(ids))
                row[:take] = ids[:take].to(torch.int32)
                out[b, s] = row
        return out

    def three_nn(unknown, known):
        # (B, n, 3), (B, m, 3) -> sqrt dists (B, n, 3), idx (B, n, 3) int32
        d2 = ((unknown[:, :, None] - known[:, None]) ** 2).sum(-1)
        dist, idx = torch.topk(d2, 3, dim=-1, largest=False)
        return torch.sqrt(dist), idx.to(torch.int32)

    def three_interpolate(points, idx, weight):
        # (B, C, m), (B, n, 3), (B, n, 3) -> (B, C, n)
        B, C, _ = points.shape
        n = idx.shape[1]
        flat = idx.long().reshape(B, 1, n * 3).expand(-1, C, -1)
        g = torch.gather(points, 2, flat).reshape(B, C, n, 3)
        return (g * weight[:, None]).sum(-1)

    class QueryAndGroup(torch.nn.Module):
        """pointnet2_utils.py:279-333: ball-query + centred grouping,
        xyz offsets prefixed when use_xyz."""

        def __init__(self, radius, nsample, use_xyz=True):
            super().__init__()
            self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

        def forward(self, xyz, new_xyz, features=None):
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = grouping_operation(
                xyz.transpose(1, 2).contiguous(), idx
            )  # (B, 3, npoint, nsample)
            grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
            if features is not None:
                grouped = grouping_operation(features, idx)
                if self.use_xyz:
                    return torch.cat([grouped_xyz, grouped], dim=1)
                return grouped
            assert self.use_xyz
            return grouped_xyz

    class GroupAll(torch.nn.Module):
        """pointnet2_utils.py:336-380: the whole cloud as one group."""

        def __init__(self, use_xyz=True):
            super().__init__()
            self.use_xyz = use_xyz

        def forward(self, xyz, new_xyz, features=None):
            grouped_xyz = xyz.transpose(1, 2).unsqueeze(2)  # (B, 3, 1, N)
            if features is not None:
                grouped = features.unsqueeze(2)
                if self.use_xyz:
                    return torch.cat([grouped_xyz, grouped], dim=1)
                return grouped
            return grouped_xyz

    pn2 = types.ModuleType("pointnet2_ops")
    pnu = types.ModuleType("pointnet2_ops.pointnet2_utils")
    for fn in (
        furthest_point_sample,
        gather_operation,
        grouping_operation,
        ball_query,
        three_nn,
        three_interpolate,
    ):
        setattr(pnu, fn.__name__, fn)
    pnu.QueryAndGroup = QueryAndGroup
    pnu.GroupAll = GroupAll
    pn2.pointnet2_utils = pnu
    sys.modules["pointnet2_ops"] = pn2
    sys.modules["pointnet2_ops.pointnet2_utils"] = pnu

    class chamfer_3DDist(torch.nn.Module):
        def forward(self, a, b):
            if a.shape[1] * b.shape[1] > 16_000_000:
                # Memory-lean matmul form for loss-scale (16k x 16k) calls:
                # the exact-diff form materialises a (B, n, m, 3) tensor.
                a2 = (a**2).sum(-1)
                b2 = (b**2).sum(-1)
                d = a2[:, :, None] + b2[:, None, :] - 2 * torch.bmm(
                    a, b.transpose(1, 2)
                )
                d = d.clamp_min(0)
            else:
                d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)  # (B, n, m)
            d1, i1 = d.min(dim=2)
            d2, i2 = d.min(dim=1)
            return d1, d2, i1.to(torch.int32), i2.to(torch.int32)

    # Package stubs with real __path__ so non-CUDA submodules (fscore,
    # chamfer_python) still import from the reference, while metrics/__init__
    # (which JIT-builds both CUDA extensions on import) never executes.
    for name in ("metrics", "metrics.CD", "metrics.CD.chamfer3D"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [
                os.path.join(REFERENCE_ROOT, *name.split("."))
            ]
            sys.modules[name] = mod
    cham = types.ModuleType("metrics.CD.chamfer3D.dist_chamfer_3D")
    cham.chamfer_3DDist = chamfer_3DDist
    sys.modules["metrics.CD.chamfer3D.dist_chamfer_3D"] = cham
    sys.modules["metrics.CD.chamfer3D"].dist_chamfer_3D = cham

    if "easydict" not in sys.modules:
        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:  # pragma: no cover
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed = types.ModuleType("easydict")
        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    if "torchvision" not in sys.modules:
        # models/resnet.py:3 imports load_state_dict_from_url at module
        # level; it is only called with pretrained=True, which we never use.
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvu = types.ModuleType("torchvision.models.utils")

        def load_state_dict_from_url(*a, **k):  # pragma: no cover
            raise RuntimeError("no network access in tests")

        tvu.load_state_dict_from_url = load_state_dict_from_url
        tvm.utils = tvu

        class ResNet18_Weights:  # PointSea.py:40 names it; we never download
            IMAGENET1K_V1 = None

        def resnet18(weights=None, **kw):
            # Random-init stand-in with torchvision's exact module layout:
            # the reference's own from-scratch copy (models/resnet.py) at
            # feature_size=64 IS torchvision resnet18.
            from models.resnet import resnet18 as ref_resnet18

            return ref_resnet18(pretrained=False)

        tvm.resnet18 = resnet18
        tvm.ResNet18_Weights = ResNet18_Weights
        tvm.__all__ = ["resnet18", "ResNet18_Weights"]
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.utils"] = tvu

    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter(src, index, dim=1, out=None, reduce="max"):
            # Only the variant mv_utils_zs.py:130 uses: max-reduce into a
            # pre-filled ``out`` grid.
            assert out is not None and reduce == "max"
            return out.scatter_reduce_(dim, index, src, reduce="amax")

        ts.scatter = scatter
        sys.modules["torch_scatter"] = ts

    # Reference renderers/models call .cuda() unconditionally; run on CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self


def load_reference_models():
    """Import /root/reference's ``models`` package with CPU stubs installed.

    Returns the (SVDFormer module, model_utils module) pair.
    """
    import torch

    _install_stubs(torch)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.SVDFormer as ref_svdformer
    import models.model_utils as ref_model_utils

    return ref_svdformer, ref_model_utils


def load_reference_pointnet2_modules():
    """Import the genuine pointnet2_ops/pointnet2_modules.py (the torch
    SA/MSG/FP convenience wrappers — dead code in the reference) with the
    CPU stubs standing in for the CUDA pointnet2_utils."""
    import importlib.util

    import torch

    _install_stubs(torch)
    path = os.path.join(
        REFERENCE_ROOT, "pointnet2_ops_lib", "pointnet2_ops",
        "pointnet2_modules.py",
    )
    spec = importlib.util.spec_from_file_location(
        "pointnet2_ops.pointnet2_modules", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # `from pointnet2_ops import ...` -> stubs
    return mod


def pcn_cfg():
    """Minimal cfg tree covering what models/SVDFormer.py reads
    (config_pcn.py:54-75)."""

    class NS:
        pass

    cfg = NS()
    cfg.NETWORK = NS()
    cfg.NETWORK.USE_PCSA = True
    cfg.NETWORK.view_distance = 0.7
    cfg.NETWORK.local_points = 512
    cfg.NETWORK.merge_points = 512
    cfg.NETWORK.step1 = 4
    cfg.NETWORK.step2 = 8
    cfg.DATASET = NS()
    cfg.DATASET.TEST_DATASET = "ShapeNet"
    return cfg


def small_pcn_cfg():
    """pcn_cfg with merge_points shrunk 512->128 (output 4096 instead of
    16384): same architecture/layer shapes, 16x less quadratic attention +
    chamfer work — keeps the 1-CPU gradient-parity tests in budget
    (VERDICT round-1 next-step #4)."""
    cfg = pcn_cfg()
    cfg.NETWORK.merge_points = 128
    return cfg


def state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def make_partial(rng: np.random.RandomState, b: int, n: int) -> np.ndarray:
    """A smooth random cloud away from the origin (FPS origin-skip safe)."""
    pts = rng.rand(b, n, 3).astype(np.float32) * 0.8 - 0.4
    keep = np.linalg.norm(pts, axis=-1) < 1e-1
    pts[keep] += 0.2
    return pts
