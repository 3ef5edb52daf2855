"""Backbone package tests (reference gluefactory/models/backbones/):
VGG-UNet / ALIKED-encoder / DINOv2 forward shapes, the DINOv2
official-checkpoint converter parity, and the JPLDD backbone selector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import build_model

rng = np.random.default_rng(7)


def test_vgg_unet_shapes_and_grads():
    model = build_model("backbones.vgg_unet", {"tiny": True})
    img = jnp.asarray(rng.normal(size=(2, 32, 40, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), {"image": img})
    out = model.apply(params, {"image": img})
    assert out["features"].shape == (2, 32, 40, 32)
    assert model.out_dim == 32

    def loss_fn(p):
        return jnp.sum(model.apply(p, {"image": img})["features"] ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(x).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_aliked_encoder_cfgs():
    model = build_model(
        "backbones.backbone_encoder", {"model_name": "aliked-t16"}
    )
    img = jnp.asarray(rng.normal(size=(1, 16, 24, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), {"image": img})
    out = model.apply(params, {"image": img})
    assert out["features"].shape == (1, 16, 24, 64)
    assert model.out_dim == 64


def test_dinov2_scratch_forward_interpolated_pos():
    # grid 3x4 != pos_grid 2 -> exercises bicubic pos-embed interpolation
    model = build_model(
        "backbones.dinov2",
        {"dim": 32, "depth": 2, "heads": 2, "pos_grid": 2},
    )
    img = jnp.asarray(rng.normal(size=(2, 42, 56, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), {"image": img})
    out = model.apply(params, {"image": img})
    assert out["features"].shape == (2, 3, 4, 32)
    assert out["global_descriptor"].shape == (2, 32)
    assert out["descriptors"].shape == (2, 12, 32)


torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_state_dinov2(d=32, depth=2, grid=2, swiglu=False):
    t = lambda *s: torch.randn(*s) * 0.2  # noqa: E731
    sd = {
        "cls_token": t(1, 1, d),
        "pos_embed": t(1, 1 + grid * grid, d),
        "patch_embed.proj.weight": t(d, 3, 14, 14) * 0.1,
        "patch_embed.proj.bias": t(d) * 0.1,
        "norm.weight": torch.rand(d) + 0.5,
        "norm.bias": t(d) * 0.1,
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": torch.rand(d) + 0.5,
            f"{p}.norm1.bias": t(d) * 0.1,
            f"{p}.attn.qkv.weight": t(3 * d, d),
            f"{p}.attn.qkv.bias": t(3 * d) * 0.1,
            f"{p}.attn.proj.weight": t(d, d),
            f"{p}.attn.proj.bias": t(d) * 0.1,
            f"{p}.ls1.gamma": torch.rand(d) * 0.5 + 0.5,
            f"{p}.norm2.weight": torch.rand(d) + 0.5,
            f"{p}.norm2.bias": t(d) * 0.1,
            f"{p}.ls2.gamma": torch.rand(d) * 0.5 + 0.5,
        })
        if swiglu:
            # official SwiGLUFFNFused hidden size (dinov2 vitg14 recipe)
            hidden = (int(4 * d * 2 / 3) + 7) // 8 * 8
            sd.update({
                f"{p}.mlp.w12.weight": t(2 * hidden, d),
                f"{p}.mlp.w12.bias": t(2 * hidden) * 0.1,
                f"{p}.mlp.w3.weight": t(d, hidden),
                f"{p}.mlp.w3.bias": t(d) * 0.1,
            })
        else:
            sd.update({
                f"{p}.mlp.fc1.weight": t(4 * d, d),
                f"{p}.mlp.fc1.bias": t(4 * d) * 0.1,
                f"{p}.mlp.fc2.weight": t(d, 4 * d),
                f"{p}.mlp.fc2.bias": t(d) * 0.1,
            })
    return sd


def _torch_forward_dinov2(sd, image, heads=2):
    """Official DINOv2 semantics: patch embed -> +cls/pos -> pre-norm blocks
    with LayerScale -> final LN -> (patch grid, cls token)."""
    x = F.conv2d(
        image, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
        stride=14,
    )
    b, d, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([sd["cls_token"].expand(b, -1, -1), x], dim=1)
    x = x + sd["pos_embed"]
    n = x.shape[1]
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    dh = d // heads
    for i in range(depth):
        p = f"blocks.{i}"
        y = F.layer_norm(x, (d,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
        qkv = F.linear(y, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
        q, k, v = [
            c.reshape(b, n, heads, dh).transpose(1, 2) for c in qkv.chunk(3, -1)
        ]
        a = torch.softmax(q @ k.transpose(-2, -1) * dh ** -0.5, dim=-1) @ v
        o = F.linear(
            a.transpose(1, 2).reshape(b, n, d),
            sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"],
        )
        x = x + sd[f"{p}.ls1.gamma"] * o
        y = F.layer_norm(x, (d,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])
        if f"{p}.mlp.w12.weight" in sd:  # SwiGLUFFNFused (vitg14)
            m12 = F.linear(y, sd[f"{p}.mlp.w12.weight"], sd[f"{p}.mlp.w12.bias"])
            x1, x2 = m12.chunk(2, -1)
            m = F.linear(F.silu(x1) * x2, sd[f"{p}.mlp.w3.weight"],
                         sd[f"{p}.mlp.w3.bias"])
        else:
            m = F.linear(y, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
            m = F.linear(F.gelu(m), sd[f"{p}.mlp.fc2.weight"],
                         sd[f"{p}.mlp.fc2.bias"])
        x = x + sd[f"{p}.ls2.gamma"] * m
    x = F.layer_norm(x, (d,), sd["norm.weight"], sd["norm.bias"])
    feats = x[:, 1:].reshape(b, gh, gw, d)
    return feats, x[:, 0]


def test_dinov2_converter_parity():
    from gluefactory_tpu.models.backbones.dinov2 import torch_weight_converter

    d, depth, heads, grid = 32, 2, 2, 2
    # seed: unseeded weights made the accumulation-order noise bound
    # nondeterministic run-to-run (same class as the old SP-open flake)
    torch.manual_seed(7)
    sd = _rand_state_dinov2(d=d, depth=depth, grid=grid)
    # native pos-embed grid (2x2 patches = 28x28 px): no interpolation, so
    # parity is exact up to float32 accumulation order (bounded ~4e-4
    # through 2 pre-LN blocks on oneDNN hosts)
    img_t = torch.randn(1, 3, 28, 28) * 0.5
    feats_t, cls_t = _torch_forward_dinov2(sd, img_t, heads=heads)

    model = build_model(
        "backbones.dinov2",
        {"dim": d, "depth": depth, "heads": heads, "pos_grid": grid},
    )
    params = torch_weight_converter({k: v.numpy() for k, v in sd.items()})
    img_j = jnp.asarray(img_t.permute(0, 2, 3, 1).numpy())
    out = model.apply(params, {"image": img_j})
    np.testing.assert_allclose(
        np.asarray(out["features"]), feats_t.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["global_descriptor"]), cls_t.numpy(), atol=2e-4,
        rtol=1e-3,
    )


def test_dinov2_swiglufused_converter_parity():
    """vitg14-class SwiGLU-fused MLP: hidden = round8(4*d*2/3), not 4*d —
    the converter must drop official w12/w3 weights in without shape errors
    (round-2 advisor finding)."""
    from gluefactory_tpu.models.backbones.dinov2 import torch_weight_converter

    torch.manual_seed(21)
    d, depth, heads, grid = 24, 2, 2, 2
    sd = _rand_state_dinov2(d=d, depth=depth, grid=grid, swiglu=True)
    img_t = torch.randn(1, 3, 28, 28) * 0.5
    feats_t, cls_t = _torch_forward_dinov2(sd, img_t, heads=heads)

    model = build_model(
        "backbones.dinov2",
        {"weights": "dinov2_vitg14", "dim": d, "depth": depth,
         "heads": heads, "pos_grid": grid},
    )
    params = torch_weight_converter({k: v.numpy() for k, v in sd.items()})
    img_j = jnp.asarray(img_t.permute(0, 2, 3, 1).numpy())
    out = model.apply(params, {"image": img_j})
    np.testing.assert_allclose(
        np.asarray(out["features"]), feats_t.numpy(), atol=5e-4, rtol=1e-3
    )


def test_dinov2_rejects_nondivisible_input():
    model = build_model(
        "backbones.dinov2",
        {"dim": 16, "depth": 1, "heads": 2, "pos_grid": 2,
         "allow_resize": False},
    )
    img = jnp.zeros((1, 30, 28, 1), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 14"):
        model.init(jax.random.PRNGKey(0), {"image": img})


def test_jpldd_external_backbone():
    model = build_model(
        "extractors.joint_point_line_extractor",
        {
            "backbone": {"name": "vgg_unet", "tiny": True},
            "channels": [4, 8, 16, 32],
            "dim": 16,
            "max_num_keypoints": 32,
            "use_angle_field": True,
        },
    )
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), {"image": img})
    pred = model.apply(params, {"image": img})
    assert pred["backbone_features"].shape == (1, 32, 32, 16)
    assert pred["keypoints"].shape[1] == 32
    # external trunk replaces the inline blocks: no inline params created
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert not any("block1" in n and "ext_backbone" not in n for n in names)
    assert any("ext_backbone" in n for n in names)
