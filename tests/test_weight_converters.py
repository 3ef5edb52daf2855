"""Weight-converter parity: synthetic torch checkpoints (reference module
naming + semantics, built with torch cpu) run through minimal torch forward
emulations and compared against the converted flax models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gluefactory_tpu.models import build_model  # noqa: E402

rng = np.random.default_rng(0)


def _rand_state_superpoint_open():
    """State dict shaped/named like rpautrat superpoint_v6_from_tf.pth."""
    sd = {}
    chans = [1, 64, 64, 64, 64, 128, 128, 128, 128]
    blocks = [f"backbone.{s}.{l}" for s in range(4) for l in range(2)]

    def add_block(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k) * 0.2
        sd[f"{prefix}.conv.bias"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.weight"] = torch.rand(cout) * 0.5 + 0.5  # positive
        sd[f"{prefix}.bn.bias"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.running_mean"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.running_var"] = torch.rand(cout) + 0.5

    for i, blk in enumerate(blocks):
        add_block(blk, chans[i], chans[i + 1], 3)
    add_block("detector.0", 128, 256, 3)
    add_block("detector.1", 256, 65, 1)
    add_block("descriptor.0", 128, 256, 3)
    add_block("descriptor.1", 256, 256, 1)
    return sd


def _torch_forward_superpoint_open(sd, image):
    """Reference semantics: per block conv -> (relu) -> bn; pools after
    stages 0..2; detector/descriptor heads; eval-mode BN."""

    def block(x, prefix, relu=True):
        w, b = sd[f"{prefix}.conv.weight"], sd[f"{prefix}.conv.bias"]
        pad = (w.shape[-1] - 1) // 2
        x = torch.nn.functional.conv2d(x, w, b, padding=pad)
        if relu:
            x = torch.relu(x)
        g, be = sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"]
        m, v = sd[f"{prefix}.bn.running_mean"], sd[f"{prefix}.bn.running_var"]
        return torch.nn.functional.batch_norm(x, m, v, g, be, False, 0.0, 1e-3)

    x = image
    for s in range(4):
        x = block(x, f"backbone.{s}.0")
        x = block(x, f"backbone.{s}.1")
        if s < 3:
            x = torch.nn.functional.max_pool2d(x, 2, 2)
    det = block(block(x, "detector.0"), "detector.1", relu=False)
    desc = block(block(x, "descriptor.0"), "descriptor.1", relu=False)
    scores = torch.softmax(det, 1)[:, :-1]
    desc = torch.nn.functional.normalize(desc, p=2, dim=1)
    return scores, desc


def test_superpoint_open_converter_parity():
    from gluefactory_tpu.models.extractors.superpoint_open import (
        torch_weight_converter,
    )

    sd = _rand_state_superpoint_open()
    img = torch.rand(1, 1, 64, 64)
    with torch.no_grad():
        scores_t, desc_t = _torch_forward_superpoint_open(sd, img)
    params = torch_weight_converter({k: v.numpy() for k, v in sd.items()})
    model = build_model(
        "extractors.superpoint_open",
        {"dense_outputs": True, "max_num_keypoints": 64,
         "detection_threshold": 0.0},
    )
    data = {
        "image": jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        "image_size": jnp.full((1, 2), 64.0),
    }
    pred = model.apply(params, data)
    # full-res heatmap vs torch 64-cell scores unpacked the same way
    st = scores_t.numpy()[0]  # (64, 8, 8) cells
    hc, wc = st.shape[1], st.shape[2]
    heat_t = st.reshape(8, 8, hc, wc).transpose(2, 0, 3, 1).reshape(hc * 8, wc * 8)
    # our heatmap has NMS applied; compare pre-NMS is not exported, so check
    # the dense descriptors + the NMS-invariant max locations instead
    desc_ours = np.asarray(pred["descriptors_dense"][0])  # (H/8, W/8, C)
    desc_torch = desc_t.numpy()[0].transpose(1, 2, 0)
    np.testing.assert_allclose(desc_ours, desc_torch, atol=1e-4)
    heat_ours = np.asarray(pred["heatmap"][0])
    # NMS zeroes non-maxima; surviving peaks must carry identical scores
    peaks = heat_ours > 0
    np.testing.assert_allclose(
        heat_ours[peaks], heat_t[np.asarray(peaks)], atol=1e-4
    )
    assert peaks.sum() > 0


def _rand_state_superglue(d=64, h=4, L=2):
    sd = {}

    def conv(prefix, cin, cout):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, 1) * (1.0 / np.sqrt(cin))
        sd[f"{prefix}.bias"] = torch.randn(cout) * 0.05

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) * 0.5 + 0.75
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    chans = [3, 32, 64, 128, 256, d]
    for k, idx in enumerate([0, 3, 6, 9, 12]):
        conv(f"kenc.encoder.{idx}", chans[k], chans[k + 1])
        if idx != 12:
            bn(f"kenc.encoder.{idx + 1}", chans[k + 1])
    for j in range(2 * L):
        base = f"gnn.layers.{j}"
        for p in range(3):
            conv(f"{base}.attn.proj.{p}", d, d)
        conv(f"{base}.attn.merge", d, d)
        conv(f"{base}.mlp.0", 2 * d, 2 * d)
        bn(f"{base}.mlp.1", 2 * d)
        conv(f"{base}.mlp.3", 2 * d, d)
    conv("final_proj", d, d)
    sd["bin_score"] = torch.tensor(1.0)
    return sd


def _torch_forward_superglue(sd, desc0, desc1, kpts0, kpts1, sc0, sc1,
                             size, d=64, h=4, L=2, iters=20):
    """Reference semantics (gluefactory_nonfree/superglue.py:63-305),
    eval-mode BNs. desc: (b, d, n); kpts: (b, n, 2)."""
    F = torch.nn.functional

    def conv(x, prefix):
        return F.conv1d(x, sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])

    def bn(x, prefix):
        return F.batch_norm(
            x, sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
            sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], False, 0.0, 1e-5,
        )

    def kenc(kpts, scores):
        shift = size / 2.0
        scale = size.max() * 0.7
        kn = (kpts - shift) / scale
        x = torch.cat([kn.transpose(1, 2), scores.unsqueeze(1)], 1)
        for idx in [0, 3, 6, 9]:
            x = torch.relu(bn(conv(x, f"kenc.encoder.{idx}"),
                              f"kenc.encoder.{idx + 1}"))
        return conv(x, "kenc.encoder.12")

    def attn_layer(x, source, base):
        b = x.shape[0]
        hd = d // h
        q = conv(x, f"{base}.attn.proj.0").view(b, hd, h, -1)
        k = conv(source, f"{base}.attn.proj.1").view(b, hd, h, -1)
        v = conv(source, f"{base}.attn.proj.2").view(b, hd, h, -1)
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / hd**0.5
        prob = torch.softmax(scores, dim=-1)
        msg = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        msg = conv(msg.contiguous().view(b, d, -1), f"{base}.attn.merge")
        y = torch.cat([x, msg], 1)
        y = torch.relu(bn(conv(y, f"{base}.mlp.0"), f"{base}.mlp.1"))
        return x + conv(y, f"{base}.mlp.3")

    desc0 = desc0 + kenc(kpts0, sc0)
    desc1 = desc1 + kenc(kpts1, sc1)
    for i in range(L):
        desc0 = attn_layer(desc0, desc0, f"gnn.layers.{2 * i}")
        desc1 = attn_layer(desc1, desc1, f"gnn.layers.{2 * i}")
        n0 = attn_layer(desc0, desc1, f"gnn.layers.{2 * i + 1}")
        n1 = attn_layer(desc1, desc0, f"gnn.layers.{2 * i + 1}")
        desc0, desc1 = n0, n1
    m0 = conv(desc0, "final_proj")
    m1 = conv(desc1, "final_proj")
    scores = torch.einsum("bdn,bdm->bnm", m0, m1) / d**0.5
    # reference log_optimal_transport (superglue.py:181-205)
    b, m, n = scores.shape
    alpha = sd["bin_score"]
    couplings = torch.cat(
        [torch.cat([scores, alpha.expand(b, m, 1)], -1),
         torch.cat([alpha.expand(b, 1, n), alpha.expand(b, 1, 1)], -1)], 1
    )
    ms, ns = torch.tensor(float(m)), torch.tensor(float(n))
    norm = -(ms + ns).log()
    log_mu = torch.cat([norm.expand(m), ns.log()[None] + norm])[None].expand(b, -1)
    log_nu = torch.cat([norm.expand(n), ms.log()[None] + norm])[None].expand(b, -1)
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(couplings + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
    Z = couplings + u.unsqueeze(2) + v.unsqueeze(1)
    return Z - norm


def test_superglue_converter_parity():
    from gluefactory_tpu.models.matchers.superglue import torch_weight_converter

    d, h, L, N = 64, 4, 2, 24
    sd = _rand_state_superglue(d, h, L)
    torch.manual_seed(0)
    desc0 = torch.nn.functional.normalize(torch.randn(1, d, N), dim=1)
    desc1 = torch.nn.functional.normalize(torch.randn(1, d, N), dim=1)
    kpts0 = torch.rand(1, N, 2) * 128
    kpts1 = torch.rand(1, N, 2) * 128
    sc0 = torch.rand(1, N)
    sc1 = torch.rand(1, N)
    size = torch.tensor([128.0, 128.0])
    with torch.no_grad():
        Z_t = _torch_forward_superglue(sd, desc0, desc1, kpts0, kpts1,
                                       sc0, sc1, size, d, h, L)
    conf = {"input_dim": d, "descriptor_dim": d, "num_heads": h,
            "n_layers": L, "norm": "none", "sinkhorn_iterations": 20}
    params = torch_weight_converter({k: v.numpy() for k, v in sd.items()}, conf)
    model = build_model("matchers.superglue", conf)
    data = {
        "descriptors0": jnp.asarray(desc0.numpy().transpose(0, 2, 1)),
        "descriptors1": jnp.asarray(desc1.numpy().transpose(0, 2, 1)),
        "keypoints0": jnp.asarray(kpts0.numpy()),
        "keypoints1": jnp.asarray(kpts1.numpy()),
        "keypoint_scores0": jnp.asarray(sc0.numpy()),
        "keypoint_scores1": jnp.asarray(sc1.numpy()),
        "view0": {"image_size": jnp.asarray(size.numpy())[None]},
        "view1": {"image_size": jnp.asarray(size.numpy())[None]},
    }
    pred = model.apply(params, data)
    np.testing.assert_allclose(
        np.asarray(pred["log_assignment"]), Z_t.numpy(), atol=2e-3
    )


def _rand_state_gluestick(d=32, h=4, L=2):
    sd = {}

    def conv(prefix, cin, cout):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, 1) * (1.0 / np.sqrt(cin))
        sd[f"{prefix}.bias"] = torch.randn(cout) * 0.05

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) * 0.5 + 0.75
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    for name, cin in [("kenc", 3), ("lenc", 5)]:
        chans = [cin, 32, 64, 128, 256, d]
        for k, idx in enumerate([0, 3, 6, 9, 12]):
            conv(f"{name}.encoder.{idx}", chans[k], chans[k + 1])
            if idx != 12:
                bn(f"{name}.encoder.{idx + 1}", chans[k + 1])
    for j in range(2 * L):
        base = f"gnn.layers.{j}.update"
        for pi in range(3):
            conv(f"{base}.attn.proj.{pi}", d, d)
        conv(f"{base}.attn.merge", d, d)
        conv(f"{base}.mlp.0", 2 * d, 2 * d)
        bn(f"{base}.mlp.1", 2 * d)
        conv(f"{base}.mlp.3", 2 * d, d)
    for i in range(L):
        lb = f"gnn.line_layers.{i}"
        conv(f"{lb}.mlp.0", 3 * d, 2 * d)
        bn(f"{lb}.mlp.1", 2 * d)
        conv(f"{lb}.mlp.3", 2 * d, d)
    conv("final_proj", d, d)
    conv("final_line_proj", d, d)
    sd["bin_score"] = torch.tensor(1.0)
    sd["line_bin_score"] = torch.tensor(1.0)
    return sd


def _torch_forward_gluestick(sd, data_t, d=32, h=4, L=2):
    """Reference semantics (gluestick.py:147-369), eval-mode BNs."""
    F = torch.nn.functional

    def conv(x, prefix):
        return F.conv1d(x, sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])

    def bn(x, prefix):
        return F.batch_norm(
            x, sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
            sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], False, 0.0, 1e-5,
        )

    def enc(x, name):
        for idx in [0, 3, 6, 9]:
            x = torch.relu(bn(conv(x, f"{name}.encoder.{idx}"),
                              f"{name}.encoder.{idx + 1}"))
        return conv(x, f"{name}.encoder.12")

    size = data_t["size"]

    def norm_pts(p):
        shift = size / 2.0
        scale = size.max() * 0.7
        return (p - shift) / scale

    def attn_prop(x, source, base):
        b = x.shape[0]
        hd = d // h
        q = conv(x, f"{base}.attn.proj.0").view(b, hd, h, -1)
        k = conv(source, f"{base}.attn.proj.1").view(b, hd, h, -1)
        v = conv(source, f"{base}.attn.proj.2").view(b, hd, h, -1)
        prob = torch.softmax(
            torch.einsum("bdhn,bdhm->bhnm", q, k) / hd**0.5, dim=-1
        )
        msg = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        msg = conv(msg.contiguous().view(b, d, -1), f"{base}.attn.merge")
        y = torch.cat([x, msg], 1)
        y = torch.relu(bn(conv(y, f"{base}.mlp.0"), f"{base}.mlp.1"))
        return x + conv(y, f"{base}.mlp.3")

    def line_layer(ldesc, line_enc, idx, i):
        b = ldesc.shape[0]
        gidx = idx[:, None].repeat(1, d, 1)
        line_desc = torch.gather(ldesc, 2, gidx)
        line_desc2 = line_desc.reshape(b, d, -1, 2).flip([-1]).flatten(2, 3)
        message = torch.cat([line_desc, line_desc2, line_enc], 1)
        lb = f"gnn.line_layers.{i}"
        msg = torch.relu(bn(conv(message, f"{lb}.mlp.0"), f"{lb}.mlp.1"))
        msg = conv(msg, f"{lb}.mlp.3")
        update = torch.zeros_like(ldesc).scatter_reduce_(
            2, gidx, msg, reduce="mean", include_self=False
        )
        return ldesc + update

    desc0, desc1 = data_t["desc0"], data_t["desc1"]
    kn0 = norm_pts(data_t["kpts0"])
    kn1 = norm_pts(data_t["kpts1"])
    desc0 = desc0 + enc(
        torch.cat([kn0.transpose(1, 2), data_t["sc0"].unsqueeze(1)], 1), "kenc"
    )
    desc1 = desc1 + enc(
        torch.cat([kn1.transpose(1, 2), data_t["sc1"].unsqueeze(1)], 1), "kenc"
    )

    def lenc_in(lines, lsc):
        b, n_l = lines.shape[:2]
        ln = norm_pts(lines.reshape(b, -1, 2)).reshape(b, n_l, 2, 2)
        off = (ln[:, :, 1] - ln[:, :, 0]).unsqueeze(2)
        off = torch.cat([off, -off], dim=2).reshape(b, 2 * n_l, 2).transpose(1, 2)
        return torch.cat(
            [ln.flatten(1, 2).transpose(1, 2), off, lsc.repeat(1, 2).unsqueeze(1)], 1
        )

    le0 = enc(lenc_in(data_t["lines0"], data_t["lsc0"]), "lenc")
    le1 = enc(lenc_in(data_t["lines1"], data_t["lsc1"]), "lenc")
    idx0, idx1 = data_t["idx0"], data_t["idx1"]
    for i in range(L):
        desc0 = attn_prop(desc0, desc0, f"gnn.layers.{2 * i}.update")
        desc1 = attn_prop(desc1, desc1, f"gnn.layers.{2 * i}.update")
        desc0 = line_layer(desc0, le0, idx0, i)
        desc1 = line_layer(desc1, le1, idx1, i)
        n0 = attn_prop(desc0, desc1, f"gnn.layers.{2 * i + 1}.update")
        n1 = attn_prop(desc1, desc0, f"gnn.layers.{2 * i + 1}.update")
        desc0, desc1 = n0, n1

    def log_double_softmax(scores, bin_score):
        b, m, n = scores.shape
        bin_ = bin_score[None, None, None]
        s0 = F.log_softmax(torch.cat([scores, bin_.expand(b, m, 1)], 2), 2)
        s1 = F.log_softmax(torch.cat([scores, bin_.expand(b, 1, n)], 1), 1)
        out = scores.new_full((b, m + 1, n + 1), 0.0)
        out[:, :m, :n] = (s0[:, :, :n] + s1[:, :m, :]) / 2
        out[:, :-1, -1] = s0[:, :, -1]
        out[:, -1, :-1] = s1[:, -1, :]
        return out

    m0 = conv(desc0, "final_proj")
    m1 = conv(desc1, "final_proj")
    kp_scores = torch.einsum("bdn,bdm->bnm", m0, m1) / d**0.5
    kp_scores = log_double_softmax(kp_scores, sd["bin_score"])
    # line matching via final_line_proj (gluestick.py:329-369)
    ml0 = conv(desc0, "final_line_proj")
    ml1 = conv(desc1, "final_line_proj")
    ls = torch.einsum("bdn,bdm->bnm", ml0, ml1) / d**0.5
    n2_0, n2_1 = idx0.shape[1], idx1.shape[1]
    ls = torch.gather(ls, 2, idx1[:, None, :].repeat(1, ls.shape[1], 1))
    ls = torch.gather(ls, 1, idx0[:, :, None].repeat(1, 1, n2_1))
    ls = ls.reshape(-1, n2_0 // 2, 2, n2_1 // 2, 2)
    raw = 0.5 * torch.maximum(
        ls[:, :, 0, :, 0] + ls[:, :, 1, :, 1],
        ls[:, :, 0, :, 1] + ls[:, :, 1, :, 0],
    )
    line_scores = log_double_softmax(raw, sd["line_bin_score"])
    return kp_scores, line_scores


def test_gluestick_converter_parity():
    from gluefactory_tpu.models.matchers.gluestick import torch_weight_converter

    d, h, L, N, NL = 32, 4, 2, 20, 4
    torch.manual_seed(1)
    sd = _rand_state_gluestick(d, h, L)
    n_junc = 2 * NL
    data_t = {
        "desc0": torch.nn.functional.normalize(torch.randn(1, d, N), dim=1),
        "desc1": torch.nn.functional.normalize(torch.randn(1, d, N), dim=1),
        "kpts0": torch.rand(1, N, 2) * 128,
        "kpts1": torch.rand(1, N, 2) * 128,
        "sc0": torch.rand(1, N), "sc1": torch.rand(1, N),
        "lines0": torch.rand(1, NL, 2, 2) * 128,
        "lines1": torch.rand(1, NL, 2, 2) * 128,
        "lsc0": torch.rand(1, NL), "lsc1": torch.rand(1, NL),
        "idx0": torch.randint(0, n_junc, (1, 2 * NL)),
        "idx1": torch.randint(0, n_junc, (1, 2 * NL)),
        "size": torch.tensor([128.0, 128.0]),
    }
    with torch.no_grad():
        kp_t, ln_t = _torch_forward_gluestick(sd, data_t, d, h, L)
    conf = {"input_dim": d, "descriptor_dim": d, "num_heads": h, "n_layers": L,
            "norm": "none", "line_score_source": "line_proj",
            "compat_score_tiling": True}
    params = torch_weight_converter({k: v.numpy() for k, v in sd.items()}, conf)
    model = build_model("matchers.gluestick", conf)
    data = {
        "descriptors0": jnp.asarray(data_t["desc0"].numpy().transpose(0, 2, 1)),
        "descriptors1": jnp.asarray(data_t["desc1"].numpy().transpose(0, 2, 1)),
        "keypoints0": jnp.asarray(data_t["kpts0"].numpy()),
        "keypoints1": jnp.asarray(data_t["kpts1"].numpy()),
        "keypoint_scores0": jnp.asarray(data_t["sc0"].numpy()),
        "keypoint_scores1": jnp.asarray(data_t["sc1"].numpy()),
        "lines0": jnp.asarray(data_t["lines0"].numpy()),
        "lines1": jnp.asarray(data_t["lines1"].numpy()),
        "line_scores0": jnp.asarray(data_t["lsc0"].numpy()),
        "line_scores1": jnp.asarray(data_t["lsc1"].numpy()),
        "lines_junc_idx0": jnp.asarray(data_t["idx0"].numpy()),
        "lines_junc_idx1": jnp.asarray(data_t["idx1"].numpy()),
        "view0": {"image_size": jnp.asarray(data_t["size"].numpy())[None]},
        "view1": {"image_size": jnp.asarray(data_t["size"].numpy())[None]},
    }
    pred = model.apply(params, data)
    np.testing.assert_allclose(
        np.asarray(pred["log_assignment"]), kp_t.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(pred["line_log_assignment"]), ln_t.numpy(), atol=2e-3
    )
