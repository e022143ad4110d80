"""torchvision-resnet18 converter: structure + transform checks, and a
numeric parity check of one converted BasicBlock against torch.nn modules
(torchvision itself is not installed; its state-dict key schema is fixed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdformer_pointsea_tpu.nn.resnet import ResNet18
from svdformer_pointsea_tpu.train.convert import (
    convert_torchvision_resnet18,
    tree_paths,
)


def _tv_key(path, leaf):
    out = []
    i = 0
    while i < len(path):
        p = path[i]
        if p.startswith("layer") and i + 1 < len(path) and path[i + 1].startswith("block"):
            out.extend([p, path[i + 1].removeprefix("block")])
            i += 2
            continue
        if p == "down_conv":
            out.extend(["downsample", "0"])
        elif p == "down_bn":
            out.extend(["downsample", "1"])
        else:
            out.append(p)
        i += 1
    leaf_map = {"scale": "weight", "kernel": "weight", "mean": "running_mean", "var": "running_var"}
    return ".".join(out + [leaf_map.get(leaf, leaf)])


def test_torchvision_resnet18_structure(rng):
    m = ResNet18()
    vs = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3))), jax.random.PRNGKey(0)
    )
    sd = {}
    for tree, is_stats in ((vs["params"], False), (vs.get("batch_stats", {}), True)):
        for path, shape in tree_paths(tree):
            *mods, leaf = path
            if leaf == "kernel":
                tshape = (shape[3], shape[2], shape[0], shape[1])
            else:
                tshape = shape
            sd[_tv_key(mods, leaf)] = rng.randn(*tshape).astype(np.float32)
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)  # dropped
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    for k in list(sd):
        if k.endswith("running_mean"):
            sd[k.replace("running_mean", "num_batches_tracked")] = np.int64(7)

    params, batch_stats = convert_torchvision_resnet18(sd)
    assert {(p, s) for p, s in tree_paths(params)} == {
        (p, s) for p, s in tree_paths(vs["params"])
    }
    assert {(p, s) for p, s in tree_paths(batch_stats)} == {
        (p, s) for p, s in tree_paths(vs["batch_stats"])
    }
    w = sd["layer2.0.downsample.0.weight"]
    np.testing.assert_array_equal(
        params["layer2"]["block0"]["down_conv"]["kernel"], w.transpose(2, 3, 1, 0)
    )


def test_basic_block_matches_torch(rng):
    """Converted conv+bn weights reproduce torch's BasicBlock math."""
    torch = pytest.importorskip("torch")
    import flax.linen as linen

    C = 8
    conv = torch.nn.Conv2d(C, C, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(C)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()

    x = rng.rand(2, 16, 16, C).astype(np.float32)
    with torch.no_grad():
        t_out = bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
    t_out = t_out.transpose(0, 2, 3, 1)

    class Mini(linen.Module):
        @linen.compact
        def __call__(self, x):
            x = linen.Conv(C, (3, 3), padding=1, use_bias=False, name="conv")(x)
            return linen.BatchNorm(use_running_average=True, name="bn")(x)

    params = {
        "conv": {"kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0)},
        "bn": {
            "scale": bn.weight.detach().numpy(),
            "bias": bn.bias.detach().numpy(),
        },
    }
    stats = {
        "bn": {
            "mean": bn.running_mean.numpy(),
            "var": bn.running_var.numpy(),
        }
    }
    j_out = Mini().apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5)


def test_trunk_s2d_matches_unpacked(rng):
    """The packed space-to-depth execution of ImageTrunk's full-resolution
    stage must match the unpacked path to f32 reduction-order round-off, in
    BOTH eval and train mode (incl. identical batch-stats updates), with the
    SAME parameter tree (checkpoints/converter oblivious)."""
    import jax
    import jax.numpy as jnp
    from svdformer_pointsea_tpu.nn import ImageTrunk
    from svdformer_pointsea_tpu.nn.resnet import set_trunk_s2d

    x = jnp.asarray(rng.rand(4, 32, 32, 1), jnp.float32)
    model = ImageTrunk(feat_size=16)

    set_trunk_s2d(True)
    try:
        v_packed = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out_p = jax.jit(model.apply)(v_packed, x)
        (out_pt, mut_p) = jax.jit(
            lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
        )(v_packed, x)
    finally:
        set_trunk_s2d("train")

    v_ref = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # Identical parameter tree (names AND values: same init streams).
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_packed["params"], v_ref["params"],
    )
    out_r = jax.jit(model.apply)(v_ref, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-5)

    (out_rt, mut_r) = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(v_ref, x)
    np.testing.assert_allclose(np.asarray(out_pt), np.asarray(out_rt), atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(mut_p["batch_stats"]),
        jax.tree_util.tree_leaves(mut_r["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # Gradients agree too (the packed kernel rearrangement is differentiable).
    def loss(v, variables):
        return jnp.sum(
            model.apply({"params": v, "batch_stats": variables["batch_stats"]}, x) ** 2
        )

    set_trunk_s2d(True)
    try:
        g_p = jax.jit(jax.grad(lambda v: loss(v, v_packed)))(v_packed["params"])
    finally:
        set_trunk_s2d("train")
    g_r = jax.jit(jax.grad(lambda v: loss(v, v_ref)))(v_ref["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_trunk_s2d_odd_sizes_fall_back(rng):
    """Odd image sizes use the unpacked path (no crash, same tree)."""
    import jax
    import jax.numpy as jnp
    from svdformer_pointsea_tpu.nn import ImageTrunk

    x = jnp.asarray(rng.rand(2, 31, 31, 1), jnp.float32)
    model = ImageTrunk(feat_size=16)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(v, x)
    assert out.shape == (2, 128) and np.all(np.isfinite(np.asarray(out)))
