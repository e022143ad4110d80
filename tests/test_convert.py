"""Checkpoint converter tests.

(a) Round-trip structure: generate a synthetic reference-layout state dict
    (torch tensor shapes, torch key names) from the flax model's own init
    shapes via an inverse key mapping, convert it, and require the resulting
    trees to match ``SVDFormer.init`` exactly (paths + shapes + values for
    spot-checked transforms).
(b) Numeric parity of the attention conversion against torch's
    nn.MultiheadAttention (packed in-proj split + head layout + softmax).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.nn import SVDFormer
from svdformer_pointsea_tpu.train.convert import convert_state_dict, tree_paths

# ---------------------------------------------------------------------------
# Inverse mapping: flax path -> torch key + torch-shaped array


_IMG_INV = {"layer1": "3", "layer2": "4", "layer3": "5", "layer4": "6"}


def _inv_img(parts):
    out = []
    it = iter(range(len(parts)))
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "stem_conv":
            out.append("0")
        elif p == "stem_bn":
            out.append("1")
        elif p in _IMG_INV:
            out.append(_IMG_INV[p])
        elif p.startswith("block"):
            out.append(p.removeprefix("block"))
        elif p == "down_conv":
            out.extend(["downsample", "0"])
        elif p == "down_bn":
            out.extend(["downsample", "1"])
        else:
            out.append(p)
        i += 1
    return out


def _flax_to_torch_key(path, leaf):
    """Inverse of convert._rename_segments + convert._leaf (test oracle)."""
    parts = list(path)
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "point_fe":
            out.append("point_feature_extractor")
        elif re.fullmatch(r"sa\d", p) and out and out[-1] == "point_feature_extractor":
            out.append(f"sa_module_{p[2]}")
        elif p == "img_trunk":
            out.append("img_feature_extractor")
            out.extend(_inv_img(parts[i + 1 :]))
            i = len(parts)
            continue
        elif re.fullmatch(r"gcn\d", p):
            out.append(f"gcn_{p[3]}")
        elif p == "mlp" and i + 1 < len(parts) and parts[i + 1].startswith("layer"):
            out.extend(["mlp_conv", parts[i + 1].removeprefix("layer"), "conv"])
            i += 2
            continue
        elif p.startswith("layer") and out and out[-1] in ("posmlp", "mlpp"):
            out.extend(["mlp", str(2 * int(p.removeprefix("layer")))])
        elif p == "freq_fc1":
            out.extend(["freq_mlp", "0"])
        elif p == "freq_fc2":
            out.extend(["freq_mlp", "2"])
        elif p.startswith("conv") and out and out[-1].startswith("gcn_"):
            out.extend(["conv", {"conv0": "0", "conv1": "3", "conv2": "6"}[p]])
        elif p.startswith("bn") and out and out[-1].startswith("gcn_"):
            out.extend(["conv", {"bn0": "1", "bn1": "4"}[p]])
        elif p == "attn":
            out.append("multihead_attn")
        else:
            out.append(p)
        i += 1
    # leaf name
    if leaf == "scale":
        leaf = "weight"
    elif leaf == "kernel":
        leaf = "weight"
    elif leaf == "mean":
        leaf = "running_mean"
    elif leaf == "var":
        leaf = "running_var"
    return ".".join(out + [leaf])


def _torch_shape(path, leaf, shape):
    """Torch-layout shape for a flax leaf (inverse weight transforms)."""
    last = path[-1]
    parent = path[-2] if len(path) > 1 else ""
    if leaf in ("bias", "scale", "mean", "var"):
        if last == "ps" and "encoder" in path and leaf == "bias":
            return (shape[0] // 128,)
        return shape
    # kernels
    if last == "ps" and "encoder" in path:
        return (shape[0], shape[1] // 128, 128)
    if parent == "attn" or last in ("linear11", "linear12") or last.startswith(
        "freq_fc"
    ):
        return (shape[1], shape[0])
    if last in ("stem_conv", "conv1", "conv2", "down_conv") and len(shape) == 4:
        return (shape[3], shape[2], shape[0], shape[1])
    if path[-2].startswith("gcn") if len(path) > 1 else False:
        return (shape[1], shape[0], 1, 1)
    # generic 1x1 Conv1d
    return (shape[1], shape[0], 1)


def _build_synthetic_state_dict(params, batch_stats, rng):
    sd = {}
    packed = {}  # (attn_path) -> {q/k/v: arr}

    def add(tree, collection):
        for path, shape in tree_paths(tree):
            *mods, leaf = path
            parent = mods[-1] if mods else ""
            if parent in ("q_proj", "k_proj", "v_proj"):
                key = tuple(mods[:-1])
                packed.setdefault((key, leaf), {})[parent] = np.asarray(shape)
                continue
            tshape = _torch_shape(mods, leaf, shape)
            tkey = _flax_to_torch_key(mods, leaf)
            sd[tkey] = rng.randn(*tshape).astype(np.float32)

    add(params, "params")
    add(batch_stats, "batch_stats")

    # MHA packed in-proj: q/k/v flax kernels (E, E) -> torch (3E, E)
    for (attn_path, leaf), projs in packed.items():
        e = int(projs["q_proj"][0])
        base = _flax_to_torch_key(list(attn_path), "x")[: -len(".x")]
        if leaf == "kernel":
            sd[base + ".in_proj_weight"] = rng.randn(3 * e, e).astype(np.float32)
        else:
            sd[base + ".in_proj_bias"] = rng.randn(3 * e).astype(np.float32)

    # out_proj lives under multihead_attn in torch; handled by generic path:
    return sd


def _model_shapes():
    model = SVDFormer()
    partial = jnp.zeros((1, 2048, 3))
    depth = jnp.zeros((1, 3, 224, 224))
    vs = jax.eval_shape(lambda k: model.init(k, partial, depth), jax.random.PRNGKey(0))
    return vs["params"], vs.get("batch_stats", {})


def test_convert_structure_roundtrip(rng):
    params_s, bs_s = _model_shapes()
    sd = _build_synthetic_state_dict(params_s, bs_s, rng)
    # DataParallel prefix must be stripped.
    sd = {"module." + k: v for k, v in sd.items()}
    params, batch_stats = convert_state_dict(sd)

    want_p = {(p, s) for p, s in tree_paths(params_s)}
    got_p = {(p, s) for p, s in tree_paths(params)}
    assert got_p == want_p, (
        f"missing: {sorted(want_p - got_p)[:5]} extra: {sorted(got_p - want_p)[:5]}"
    )
    want_b = {(p, s) for p, s in tree_paths(bs_s)}
    got_b = {(p, s) for p, s in tree_paths(batch_stats)}
    assert got_b == want_b

    # Spot-check transforms numerically.
    w = sd["module.encoder.conv_out.weight"]  # Conv1d (3, 64, 1)
    np.testing.assert_array_equal(
        params["encoder"]["conv_out"]["kernel"], w[:, :, 0].T
    )
    w = sd["module.encoder.sa.multihead_attn.in_proj_weight"]  # (1536, 512)
    np.testing.assert_array_equal(
        params["encoder"]["sa"]["attn"]["k_proj"]["kernel"], w[512:1024].T
    )
    w = sd["module.encoder.img_feature_extractor.3.0.conv1.weight"]
    np.testing.assert_array_equal(
        params["encoder"]["img_trunk"]["layer1"]["block0"]["conv1"]["kernel"],
        w.transpose(2, 3, 1, 0),
    )
    w = sd["module.encoder.ps.weight"]  # (512, 64, 128)
    np.testing.assert_array_equal(
        params["encoder"]["ps"]["kernel"], w.reshape(512, -1)
    )
    b = sd["module.encoder.ps.bias"]
    np.testing.assert_array_equal(params["encoder"]["ps"]["bias"], np.repeat(b, 128))


def test_mha_matches_torch(rng):
    """Converted packed projections reproduce torch MHA outputs exactly
    (validates head-split + scaling + out-proj conventions)."""
    torch = pytest.importorskip("torch")
    from svdformer_pointsea_tpu.nn.layers import MultiheadAttention

    E, H, B, N = 64, 4, 2, 10
    tmha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    tmha.eval()

    q = rng.randn(B, N, E).astype(np.float32)
    kv = rng.randn(B, N, E).astype(np.float32)
    with torch.no_grad():
        # torch MHA default is seq-first: (N, B, E)
        tq = torch.from_numpy(q.transpose(1, 0, 2))
        tkv = torch.from_numpy(kv.transpose(1, 0, 2))
        t_out = tmha(tq, tkv, tkv)[0].numpy().transpose(1, 0, 2)

    sd = {k: v.detach().numpy() for k, v in tmha.state_dict().items()}
    w = sd["in_proj_weight"]
    b = sd["in_proj_bias"]
    flax_params = {
        "q_proj": {"kernel": w[:E].T, "bias": b[:E]},
        "k_proj": {"kernel": w[E : 2 * E].T, "bias": b[E : 2 * E]},
        "v_proj": {"kernel": w[2 * E :].T, "bias": b[2 * E :]},
        "out_proj": {
            "kernel": sd["out_proj.weight"].T,
            "bias": sd["out_proj.bias"],
        },
    }
    mha = MultiheadAttention(E, H)
    j_out = mha.apply(
        {"params": flax_params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=2e-5)
