"""Reference PyTorch checkpoint converter (.pth -> flax param trees).

The reference ships pretrained SVDFormer weights (README.md:20-21) saved as
``torch.save({'model': state_dict, ...})`` with DataParallel ``module.``
prefixes (core/train_pcn.py:161-164, SURVEY.md §5). This module translates
those state dicts into this framework's ``{params, batch_stats}`` trees so
reference checkpoints can be evaluated / fine-tuned here (the parity gate of
SURVEY.md §7 step 4).

Key-space mapping (torch module attribute paths -> flax module names):

====================================  =====================================
torch (models/SVDFormer.py)           flax (nn/svdformer.py)
====================================  =====================================
encoder.point_feature_extractor       encoder/point_fe
  .sa_module_k.mlp_conv.i.conv          /sak/mlp/layeri       (1x1 conv)
  .sa_module_k.pcsa.freq_mlp.{0,2}      /sak/pcsa/freq_fc{1,2}  (linear)
encoder.img_feature_extractor.0       encoder/img_trunk/stem_conv (conv2d)
  .1                                    /stem_bn
  .{3..6}.{b}.conv1|bn1|conv2|bn2       /layer{1..4}/block{b}/...
  .{3..6}.{b}.downsample.{0,1}          /.../down_conv, down_bn
encoder.posmlp.mlp.{0,2}              encoder/posmlp/layer{0,1} (1x1 conv)
encoder.ps                            encoder/ps       (ConvTranspose1d ->
                                        Dense: kernel (in, out*k), bias
                                        repeated per position)
<attn>.input_proj                     <attn>/input_proj (1x1 conv)
<attn>.multihead_attn.in_proj_*       <attn>/attn/{q,k,v}_proj  (split 3)
<attn>.multihead_attn.out_proj        <attn>/attn/out_proj      (linear)
<attn>.linear11|linear12              <attn>/linear11|linear12  (linear)
<attn>.norm12|norm13                  <attn>/norm12|norm13 (LN w->scale)
localencoder.gcn_k.conv.{0,1,3,4,6}   localencoder/gcnk/{conv0,bn0,conv1,
                                        bn1,conv2}
refineN.{conv_*, mlpp.mlp.{0,2},      refineN/{... same names, mlpp/layer*}
  sa1, cross1, decoder{1,2}[.sa{1,2}]}
====================================  =====================================

Weight-layout transforms: Linear ``w.T``; 1x1 Conv1d/Conv2d ``w[:, :, 0(,0)].T``;
full Conv2d ``w.transpose(2, 3, 1, 0)``; ConvTranspose1d ``w.reshape(in, -1)``
with bias ``np.repeat(b, k)``; BatchNorm weight/bias -> params scale/bias and
running_mean/var -> batch_stats mean/var; MultiheadAttention packed
``in_proj_weight`` rows [q; k; v] -> three Dense kernels.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Tuple

import numpy as np

__all__ = [
    "convert_state_dict",
    "convert_discriminator_state_dict",
    "load_torch_checkpoint",
    "convert_torchvision_resnet18",
]


def _torchvision_path(parts):
    """torchvision module path -> flax path: layerL.b -> layerL/blockb,
    downsample.{0,1} -> down_conv/down_bn. Shared by the standalone
    resnet18 converter and the PointSea ResEncoder branch of
    ``_translate_img_trunk`` (both consume torchvision attribute names)."""
    path = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
            path.extend([p, f"block{parts[i + 1]}"])
            i += 2
            continue
        if p == "downsample":
            path.append("down_conv" if parts[i + 1] == "0" else "down_bn")
            i += 2
            continue
        path.append(p)
        i += 1
    return path


def convert_torchvision_resnet18(sd: Dict[str, np.ndarray]):
    """torchvision resnet18 state dict -> (params, batch_stats) for
    nn.resnet.ResNet18 (PointSea's pretrained image trunk,
    models_PointSea/PointSea.py:37-61). The classifier fc.* is dropped.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    for key, value in sd.items():
        if key.startswith("fc."):
            continue
        parts = key.split(".")
        path = _torchvision_path(parts[:-1])
        leaf = parts[-1]
        arr = np.asarray(value)
        if leaf == "num_batches_tracked":
            continue
        if leaf in ("running_mean", "running_var"):
            _insert(
                batch_stats,
                tuple(path + ["mean" if leaf == "running_mean" else "var"]),
                arr,
            )
        elif leaf == "weight" and arr.ndim == 4:  # conv
            _insert(params, tuple(path + ["kernel"]), arr.transpose(2, 3, 1, 0))
        elif leaf == "weight":  # batchnorm affine
            _insert(params, tuple(path + ["scale"]), arr)
        else:
            _insert(params, tuple(path + ["bias"]), arr)
    return params, batch_stats


def convert_discriminator_state_dict(sd: Dict[str, np.ndarray]):
    """GeoSpec GAN discriminator state dict -> (params, batch_stats) for
    nn.PointDiscriminator (models/GeoSpecNet.py:235-257): Sequential
    ``stem.{0,3,6}`` convs -> ``stem{0..2}``, ``stem.{1,4,7}`` BNs ->
    ``bn{0..2}``, ``head.{0,2}`` linears -> ``head{0,1}``.
    """
    stem_conv = {"0": "stem0", "3": "stem1", "6": "stem2"}
    stem_bn = {"1": "bn0", "4": "bn1", "7": "bn2"}
    head = {"0": "head0", "2": "head1"}
    params: Dict = {}
    batch_stats: Dict = {}
    for key, value in sd.items():
        parts = key.removeprefix("module.").split(".")
        mod, seq, pname = parts[0], parts[1], parts[2]
        arr = np.asarray(value)
        if pname == "num_batches_tracked":
            continue
        if mod == "stem" and seq in stem_bn:
            name = stem_bn[seq]
            if pname in ("running_mean", "running_var"):
                _insert(
                    batch_stats,
                    (name, "mean" if pname == "running_mean" else "var"),
                    arr,
                )
            else:
                _insert(params, (name, "scale" if pname == "weight" else "bias"), arr)
        elif mod == "stem":
            name = stem_conv[seq]
            if pname == "weight":
                _insert(params, (name, "kernel"), arr[:, :, 0].T)
            else:
                _insert(params, (name, "bias"), arr)
        else:
            name = head[seq]
            if pname == "weight":
                _insert(params, (name, "kernel"), arr.T)
            else:
                _insert(params, (name, "bias"), arr)
    return params, batch_stats


def load_torch_checkpoint(path: str):
    """Load a reference .pth and return ``(params, batch_stats)`` trees.

    Accepts the reference's ``{'model': sd}`` / ``{'G': sd}`` wrappers
    (core/test_pcn.py:34, core/test_geospec.py:31) or a bare state dict.
    """
    import torch  # CPU-only usage; lazy so the TPU path never needs torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and not any(hasattr(v, "numpy") for v in blob.values()):
        for key in ("model", "G", "state_dict"):
            if key in blob:
                blob = blob[key]
                break
    sd = {k: v.detach().cpu().numpy() for k, v in blob.items()}
    return convert_state_dict(sd)


# ---------------------------------------------------------------------------
# Key translation


def _rename_segments(key: str) -> str:
    """Module-path renames (torch attribute names -> flax module names)."""
    key = key.removeprefix("module.")
    key = key.replace("point_feature_extractor", "point_fe")
    key = re.sub(r"sa_module_(\d)", r"sa\1", key)
    key = re.sub(r"\bgcn_(\d)\b", r"gcn\1", key)
    key = key.replace("img_feature_extractor", "img_trunk")
    return key


_IMG_LAYER = {"3": "layer1", "4": "layer2", "5": "layer3", "6": "layer4"}


def _translate_img_trunk(parts):
    """img_trunk.<idx>... -> flax path inside ImageTrunk / ResNet18.

    Two torch layouts feed this: SVDFormer's Sequential indices
    (models/SVDFormer.py:113-147: 0=stem conv, 1=stem bn, 3..6=layers) and
    PointSea's ResEncoder, which keeps torchvision attribute names
    (models_PointSea/PointSea.py:37-61: conv1/bn1/layer1..4).
    """
    idx = parts[0]
    if idx == "0":
        return ["stem_conv"] + parts[1:]
    if idx == "1":
        return ["stem_bn"] + parts[1:]
    if idx in _IMG_LAYER:
        block = f"block{parts[1]}"
        rest = parts[2:]
        if rest[0] == "downsample":
            sub = "down_conv" if rest[1] == "0" else "down_bn"
            rest = [sub] + rest[2:]
        return [_IMG_LAYER[idx], block] + rest
    if idx in ("conv1", "bn1") or idx.startswith("layer"):
        return _torchvision_path(parts)
    raise KeyError(f"img_trunk index {idx} has no parameters")


def _leaf(parts, torch_key):
    """Map the trailing (module, param) pair to flax leaf + transform tag.

    Returns a list of (flax_path_tuple, collection, transform) where
    collection is 'params' or 'batch_stats'. MHA packed in-proj expands to 3.
    """
    *mods, pname = parts

    # --- Sequential-index rewrites in context ---------------------------
    out = []
    path = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m == "img_trunk":
            path.append("img_trunk")
            path.extend(_translate_img_trunk(mods[i + 1 :]))  # consumes the rest
            break
        if m in ("posmlp", "mlpp", "fusionMlp") and i + 2 <= len(mods) - 1 and mods[i + 1] == "mlp":
            # MLP_CONV: mlp.0 -> layer0, mlp.2 -> layer1 (ReLU at odd idx)
            seq = int(mods[i + 2])
            path.extend([m, f"layer{seq // 2}"])
            i += 3
            continue
        if m == "mlp_conv":
            # SA module MLP: mlp_conv.<i>.conv -> mlp/layer<i>. The wrapper
            # always instantiates self.bn even with if_bn=False
            # (model_utils.py:27-33), and every SA module in the SVDFormer
            # family runs with if_bn=False (models/SVDFormer.py:17-19), so
            # the bn entries are dead weight — drop them.
            seq = mods[i + 1]
            if mods[i + 2] == "bn":
                return []
            assert mods[i + 2] == "conv", mods
            path.extend(["mlp", f"layer{seq}"])
            i += 3
            continue
        if m == "branches":
            # MSGSpecConv.branches.<i> -> branch<i> (GeoSpecNet.py:116-119)
            path.append(f"branch{mods[i + 1]}")
            i += 2
            continue
        if m == "geo_proj" and path and path[-1].startswith("branch"):
            # SpectralAdapter geometric attention Sequential: conv at 0 and 2
            path.append({"0": "geo_fc1", "2": "geo_fc2"}[mods[i + 1]])
            i += 2
            continue
        if m == "proj" and path and path[-1].startswith("branch"):
            # SpectralAdapter channel mixing Sequential (GeoSpecNet.py:57-61)
            path.append({"0": "proj_fc1", "2": "proj_fc2"}[mods[i + 1]])
            i += 2
            continue
        if m == "fuse" and path and path[-1] == "msg_spec":
            # MSGSpecConv.fuse Sequential [Conv1d, ReLU] (GeoSpecNet.py:120-123)
            path.append("fuse")
            i += 2
            continue
        if m == "freq_mlp":
            seq = int(mods[i + 1])
            path.append("freq_fc1" if seq == 0 else "freq_fc2")
            i += 2
            continue
        if m == "conv" and path and path[-1].startswith("gcn"):
            # EdgeConv Sequential: 0,3,6 convs; 1,4 BNs
            seq = mods[i + 1]
            path.append({"0": "conv0", "1": "bn0", "3": "conv1",
                         "4": "bn1", "6": "conv2"}[seq])
            i += 2
            continue
        path.append(m)
        i += 1

    last = path[-1] if path else ""

    # --- BatchNorm running stats --------------------------------------
    if pname in ("running_mean", "running_var"):
        leaf = "mean" if pname == "running_mean" else "var"
        return [(tuple(path + [leaf]), "batch_stats", "direct")]
    if pname == "num_batches_tracked":
        return []
    if pname == "freq_gate":
        # SpectralAdapter's per-(channel, frequency) gates, a bare Parameter
        # (GeoSpecNet.py:45)
        return [(tuple(path + ["freq_gate"]), "params", "direct")]
    if pname == "div_term" and last == "embedding":
        # SinusoidalPositionalEmbedding registers its frequency table as a
        # persistent buffer (model_utils.py:883-909); ours recomputes it.
        return []

    # --- MultiheadAttention packed projections -------------------------
    if last == "multihead_attn":
        base = path[:-1] + ["attn"]
        if pname == "in_proj_weight":
            return [
                (tuple(base + [proj, "kernel"]), "params", f"inproj_w{j}")
                for j, proj in enumerate(("q_proj", "k_proj", "v_proj"))
            ]
        if pname == "in_proj_bias":
            return [
                (tuple(base + [proj, "bias"]), "params", f"inproj_b{j}")
                for j, proj in enumerate(("q_proj", "k_proj", "v_proj"))
            ]
        raise KeyError(f"unhandled MHA param: {torch_key}")
    if last == "out_proj" and path[-2] == "multihead_attn":
        base = path[:-2] + ["attn", "out_proj"]
        if pname == "weight":
            return [(tuple(base + ["kernel"]), "params", "linear_w")]
        return [(tuple(base + ["bias"]), "params", "direct")]

    # --- Norms / BN affine ---------------------------------------------
    is_norm = bool(re.match(r"(norm\d+|bn\d*|.*_bn|stem_bn|down_bn)$", last))
    if is_norm:
        if pname == "weight":
            return [(tuple(path + ["scale"]), "params", "direct")]
        return [(tuple(path + ["bias"]), "params", "direct")]

    # --- Linear / Conv leaves -------------------------------------------
    if pname == "bias":
        tf = "deconv_b" if last == "ps" and "encoder" in path else "direct"
        return [(tuple(path + ["bias"]), "params", tf)]
    if pname == "weight":
        if last == "ps" and "encoder" in path:
            tf = "deconv_w"
        elif last in ("linear11", "linear12") or last.startswith("freq_fc"):
            tf = "linear_w"
        elif "img_trunk" in path:
            tf = "conv2d_w"  # flax Conv keeps 4D kernels (incl. 1x1 downsample)
        else:
            tf = "conv_w"  # disambiguated by ndim at transform time
        return [(tuple(path + ["kernel"]), "params", tf)]
    raise KeyError(f"unhandled torch key: {torch_key}")


def _apply(tf: str, w: np.ndarray, nhead_split: int = 3) -> np.ndarray:
    if tf == "direct":
        return w
    if tf == "linear_w":
        return w.T
    if tf == "conv2d_w":  # (O, I, H, W) -> (H, W, I, O), 1x1 included
        return w.transpose(2, 3, 1, 0)
    if tf == "conv_w":
        if w.ndim == 3:  # Conv1d k=1: (out, in, 1)
            return w[:, :, 0].T
        if w.ndim == 4 and w.shape[2] == w.shape[3] == 1:  # 1x1 Conv2d
            return w[:, :, 0, 0].T
        if w.ndim == 4:  # full Conv2d: (O, I, H, W) -> (H, W, I, O)
            return w.transpose(2, 3, 1, 0)
        if w.ndim == 2:  # Linear
            return w.T
        raise ValueError(f"conv weight ndim {w.ndim}")
    if tf == "deconv_w":  # ConvTranspose1d (in, out, k) -> (in, out*k)
        return w.reshape(w.shape[0], -1)
    if tf == "deconv_b":  # per-channel bias -> per (channel, position)
        return np.repeat(w, 128)
    m = re.match(r"inproj_([wb])(\d)", tf)
    if m:
        kind, j = m.group(1), int(m.group(2))
        e = w.shape[-1] if kind == "w" else w.shape[0] // 3
        chunk = w[j * e : (j + 1) * e] if kind == "w" else w[j * e : (j + 1) * e]
        return chunk.T if kind == "w" else chunk
    raise ValueError(f"unknown transform {tf}")


def _insert(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_DEAD_BN_RE = re.compile(r"\bmlp_conv\.\d+\.bn\.(\w+)$")
_DEAD_BN_INIT = {
    "weight": 1.0,
    "bias": 0.0,
    "running_mean": 0.0,
    "running_var": 1.0,
}


def _check_dead_bn(key: str, leaf: str, value: np.ndarray) -> None:
    """The SA-module wrapper BNs are dropped because every SVDFormer-family
    model runs them with if_bn=False (see _leaf). If a checkpoint ever
    carries TRAINED stats there (an if_bn=True variant), dropping them would
    silently corrupt the model — fail loudly instead."""
    if leaf == "num_batches_tracked":
        return
    expected = _DEAD_BN_INIT[leaf]
    if not np.allclose(np.asarray(value), expected, atol=1e-6):
        raise ValueError(
            f"{key}: expected untrained (if_bn=False) BatchNorm with "
            f"{leaf}=={expected}, found trained values — this checkpoint "
            "uses an SA module with if_bn=True, which this converter does "
            "not map"
        )


def convert_state_dict(sd: Dict[str, np.ndarray]):
    """Translate a reference state dict (numpy values) into
    ``(params, batch_stats)`` nested dicts matching ``SVDFormer.init``."""
    params: Dict = {}
    batch_stats: Dict = {}
    for key, value in sd.items():
        renamed = _rename_segments(key)
        m = _DEAD_BN_RE.search(renamed)
        if m:
            _check_dead_bn(key, m.group(1), np.asarray(value))
        parts = renamed.split(".")
        for path, collection, tf in _leaf(parts, key):
            arr = _apply(tf, np.asarray(value))
            _insert(params if collection == "params" else batch_stats, path, arr)
    return params, batch_stats


def tree_paths(tree, prefix=()) -> Iterable[Tuple[Tuple[str, ...], tuple]]:
    """Flatten a nested dict into (path, shape) pairs — structure checks."""
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            yield from tree_paths(v, p)
        else:
            yield p, tuple(v.shape)
