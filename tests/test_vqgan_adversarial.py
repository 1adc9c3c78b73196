"""VQGAN adversarial-training components (VERDICT r2 missing #1):
PatchGAN discriminator parity vs the reference torch module, LPIPS
structure + lin-weight port from the vendored vgg.pth, and the alternating
G/D training protocol (D loss decreasing, perceptual term changing
gradients)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjd_tpu.models.vq import VQConfig, init_vq_params
from sjd_tpu.models.vq.discriminator import (
    PatchGANConfig,
    init_patchgan_params,
    patchgan_logits,
)
from sjd_tpu.models.vq.lpips import (
    init_lpips_params,
    lpips,
    port_lpips,
    port_lpips_lins,
    vgg16_slices,
)
from sjd_tpu.models.vq.train import VQTrainConfig, make_vqgan_train_steps

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

VGG_PTH = "/root/reference/llamagen/tokenizer/tokenizer_image/cache/vgg.pth"

CFG = VQConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=16,
    z_channels=32, embed_dim=4, n_embed=32, dtype=jnp.float32,
)


# ---------------------------------------------------------------------------
# PatchGAN
# ---------------------------------------------------------------------------


def _to_torch_statedict(params):
    """Our NHWC/HWIO pytree -> the reference NLayerDiscriminator state dict
    (main.{idx}.*). Sequence indices: conv0 at 0, then per block
    [conv, bn, lrelu] -> conv at 2+3i, bn at 3+3i, final conv last."""
    sd = {}

    def w(x):  # HWIO -> OIHW
        return torch.from_numpy(np.asarray(x, np.float32).transpose(3, 2, 0, 1))

    sd["main.0.weight"] = w(params["conv0_w"])
    sd["main.0.bias"] = torch.from_numpy(np.asarray(params["conv0_b"], np.float32))
    idx = 2
    for blk in params["blocks"]:
        sd[f"main.{idx}.weight"] = w(blk["w"])
        sd[f"main.{idx + 1}.weight"] = torch.from_numpy(
            np.asarray(blk["gamma"], np.float32))
        sd[f"main.{idx + 1}.bias"] = torch.from_numpy(
            np.asarray(blk["beta"], np.float32))
        c = blk["gamma"].shape[0]
        sd[f"main.{idx + 1}.running_mean"] = torch.zeros(c)
        sd[f"main.{idx + 1}.running_var"] = torch.ones(c)
        sd[f"main.{idx + 1}.num_batches_tracked"] = torch.tensor(0)
        idx += 3
    sd[f"main.{idx}.weight"] = w(params["final_w"])
    sd[f"main.{idx}.bias"] = torch.from_numpy(
        np.asarray(params["final_b"], np.float32))
    return sd


@pytest.mark.parametrize("n_layers", [2, 3])
def test_patchgan_matches_reference(n_layers):
    """Bit-level architecture parity: identical weights -> identical patch
    logit maps (torch module in train mode = batch-stat BN, like ours)."""
    from llamagen.tokenizer.tokenizer_image.discriminator_patchgan import (
        NLayerDiscriminator,
    )

    dcfg = PatchGANConfig(input_nc=3, ndf=16, n_layers=n_layers)
    params = init_patchgan_params(jax.random.PRNGKey(0), dcfg)

    ref = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=n_layers)
    ref.load_state_dict(_to_torch_statedict(params))
    ref.train()  # batch-statistics BN, matching the functional port

    rs = np.random.RandomState(1)
    x = np.tanh(rs.randn(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(patchgan_logits(params, jnp.asarray(x), dcfg))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, want.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4
    )


def test_patchgan_output_is_patch_map():
    dcfg = PatchGANConfig(ndf=16, n_layers=3)
    params = init_patchgan_params(jax.random.PRNGKey(0), dcfg)
    out = patchgan_logits(params, jnp.zeros((1, 64, 64, 3)), dcfg)
    assert out.shape == (1, 6, 6, 1)  # 64 ->32->16->8 (s2 x3) ->7->6 (k4 s1)


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------


def test_lpips_lin_port_from_vendored_ckpt():
    state = torch.load(VGG_PTH, map_location="cpu", weights_only=True)
    lins = port_lpips_lins({k: v.numpy() for k, v in state.items()})
    assert [v.shape[0] for v in lins] == [64, 128, 256, 512, 512]
    params = port_lpips({k: v.numpy() for k, v in state.items()})
    assert not params["calibrated"]  # no torchvision vgg16 in this env
    d = lpips(params, jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3)) * 0.5)
    assert np.isfinite(float(d[0])) and float(d[0]) > 0


def test_vgg16_slice_shapes():
    params = init_lpips_params(jax.random.PRNGKey(0))
    feats = vgg16_slices(params, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in feats] == [
        (1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
        (1, 8, 8, 512), (1, 4, 4, 512),
    ]


def test_vgg16_conv_semantics_match_torch():
    """The slice arithmetic (3x3 pad-1 convs, 2x2 maxpools, relu) matches a
    torch replica built from the SAME weights — validates padding/pool
    parity without torchvision."""
    params = init_lpips_params(jax.random.PRNGKey(2))
    rs = np.random.RandomState(0)
    x = rs.randn(1, 16, 16, 3).astype(np.float32)

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ci = 0
    from sjd_tpu.models.vq.lpips import VGG16_PLAN

    feats_t = []
    for si, plan in enumerate(VGG16_PLAN):
        if si > 0:
            t = torch.nn.functional.max_pool2d(t, 2)
        for _ in plan:
            c = params["convs"][ci]
            w = torch.from_numpy(np.asarray(c["w"]).transpose(3, 2, 0, 1))
            b = torch.from_numpy(np.asarray(c["b"]))
            t = torch.nn.functional.relu(
                torch.nn.functional.conv2d(t, w, b, padding=1))
            ci += 1
        feats_t.append(t.detach().numpy())
    ours = vgg16_slices(params, jnp.asarray(x))
    for a, b in zip(ours, feats_t):
        np.testing.assert_allclose(
            np.asarray(a), b.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )


def test_lpips_zero_on_identical_and_grad_flows():
    params = init_lpips_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    assert np.allclose(np.asarray(lpips(params, x, x)), 0.0)
    g = jax.grad(lambda y: jnp.sum(lpips(params, x, y)))(x * 0.5)
    assert float(jnp.sum(jnp.abs(g))) > 0


# ---------------------------------------------------------------------------
# alternating G/D training
# ---------------------------------------------------------------------------


def test_vqgan_training_d_loss_decreases_and_perceptual_bites():
    params = init_vq_params(jax.random.PRNGKey(0), CFG)
    lpips_params = init_lpips_params(jax.random.PRNGKey(1))
    tcfg = VQTrainConfig(
        learning_rate=1e-4, disc_lr=2e-4, disc_start=0, disc_weight=0.5,
        perceptual_weight=1.0, recon_loss="l2",
    )
    dcfg = PatchGANConfig(ndf=8, n_layers=2)
    init_fn, g_step, d_step = make_vqgan_train_steps(
        CFG, tcfg, lpips_params=lpips_params, disc_cfg=dcfg
    )
    g_opt, d_params, d_opt, ema = init_fn(params, jax.random.PRNGKey(2))

    rs = np.random.RandomState(0)
    pixels = jnp.asarray(np.tanh(rs.randn(2, 16, 16, 3)).astype(np.float32))

    d_first = None
    for i in range(12):
        params, g_opt, ema, g_aux = g_step(
            params, g_opt, ema, d_params, pixels, jnp.int32(i))
        d_params, d_opt, d_aux = d_step(
            d_params, d_opt, params, pixels, jnp.int32(i))
        if d_first is None:
            d_first = float(d_aux["d_loss"])
    assert np.isfinite(float(g_aux["loss"]))
    assert float(g_aux["perceptual"]) > 0  # LPIPS term is live
    assert float(d_aux["d_loss"]) < d_first  # D learns real vs recon
    # D separates: real logits above fake
    assert float(d_aux["logits_real"]) > float(d_aux["logits_fake"])


def test_perceptual_term_changes_gradients():
    params = init_vq_params(jax.random.PRNGKey(0), CFG)
    lpips_params = init_lpips_params(jax.random.PRNGKey(1))
    dcfg = PatchGANConfig(ndf=8, n_layers=2)
    rs = np.random.RandomState(1)
    pixels = jnp.asarray(np.tanh(rs.randn(2, 16, 16, 3)).astype(np.float32))

    outs = {}
    for name, pw in (("with", 1.0), ("without", 0.0)):
        tcfg = VQTrainConfig(perceptual_weight=pw, disc_start=10**9)
        init_fn, g_step, _ = make_vqgan_train_steps(
            CFG, tcfg, lpips_params=lpips_params, disc_cfg=dcfg)
        g_opt, d_params, d_opt, ema = init_fn(params, jax.random.PRNGKey(2))
        p2, *_ = g_step(params, g_opt, ema, d_params, pixels, jnp.int32(0))
        outs[name] = p2
    # the perceptual term must actually move the generator differently
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        outs["with"], outs["without"],
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_disc_start_gates_adversarial_push():
    """Before disc_start the generator loss must carry zero adversarial
    weight (adopt_weight, vq_loss.py:44-47)."""
    params = init_vq_params(jax.random.PRNGKey(0), CFG)
    tcfg = VQTrainConfig(disc_start=100, disc_weight=0.5, perceptual_weight=0.0)
    dcfg = PatchGANConfig(ndf=8, n_layers=2)
    init_fn, g_step, _ = make_vqgan_train_steps(CFG, tcfg, disc_cfg=dcfg)
    g_opt, d_params, d_opt, ema = init_fn(params, jax.random.PRNGKey(2))
    pixels = jnp.zeros((1, 16, 16, 3), jnp.float32)
    _, _, _, aux_before = g_step(params, g_opt, ema, d_params, pixels, jnp.int32(0))
    _, _, _, aux_after = g_step(params, g_opt, ema, d_params, pixels, jnp.int32(100))
    assert float(aux_before["disc_w"]) == 0.0
    assert float(aux_after["disc_w"]) == 0.5


def test_adaptive_weight_finite():
    params = init_vq_params(jax.random.PRNGKey(0), CFG)
    tcfg = VQTrainConfig(disc_start=0, disc_adaptive_weight=True,
                         perceptual_weight=0.0)
    dcfg = PatchGANConfig(ndf=8, n_layers=2)
    init_fn, g_step, _ = make_vqgan_train_steps(CFG, tcfg, disc_cfg=dcfg)
    g_opt, d_params, d_opt, ema = init_fn(params, jax.random.PRNGKey(2))
    rs = np.random.RandomState(2)
    pixels = jnp.asarray(np.tanh(rs.randn(1, 16, 16, 3)).astype(np.float32))
    p2, _, _, aux = g_step(params, g_opt, ema, d_params, pixels, jnp.int32(0))
    assert np.isfinite(float(aux["disc_w"])) and float(aux["disc_w"]) >= 0
    assert np.isfinite(float(aux["loss"]))


# ---------------------------------------------------------------------------
# StyleGAN discriminator
# ---------------------------------------------------------------------------


def test_stylegan_disc_matches_reference():
    """TRUE oracle: load the reference torch Discriminator
    (discriminator_stylegan.py — its kornia import is try/except'd, so the
    module imports without kornia), inject a filter2d stub implementing
    kornia's documented semantics (normalized kernel, reflect padding,
    depthwise), transplant our weights into its state_dict, and compare
    logits. Any divergence in block order, blur placement, residual
    scaling, or channel plan now fails against the reference itself."""
    import torch.nn.functional as F

    from llamagen.tokenizer.tokenizer_image import discriminator_stylegan as ref_mod

    from sjd_tpu.models.vq.discriminator_stylegan import (
        StyleGANDiscConfig,
        init_stylegan_disc_params,
        stylegan_disc_logits,
    )

    def filter2d(x, kernel, normalized=False):
        # kornia.filters.filter2d: kernel [B?, kh, kw], border 'reflect',
        # applied per-channel; normalized=True divides by the kernel sum
        k = kernel.squeeze()
        if normalized:
            k = k / k.sum()
        kh, kw = k.shape
        C = x.shape[1]
        kd = k[None, None].expand(C, 1, kh, kw)
        xp = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2), mode="reflect")
        return F.conv2d(xp, kd, groups=C)

    ref_mod.filter2d = filter2d  # the kornia seam (import is guarded there)

    cfg = StyleGANDiscConfig(image_size=32)
    params = init_stylegan_disc_params(jax.random.PRNGKey(0), cfg)
    ref = ref_mod.Discriminator(input_nc=3, image_size=32)

    def w(p):  # HWIO -> OIHW
        return torch.from_numpy(np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1))

    def b(p):
        return torch.from_numpy(np.asarray(p["b"], np.float32))

    sd = dict(ref.state_dict())
    sd["blocks.0.weight"], sd["blocks.0.bias"] = w(params["stem"]), b(params["stem"])
    for i, blk in enumerate(params["blocks"]):
        pre = f"blocks.{i + 2}"
        sd[f"{pre}.conv_res.weight"], sd[f"{pre}.conv_res.bias"] = (
            w(blk["res"]), b(blk["res"]))
        sd[f"{pre}.net.0.weight"], sd[f"{pre}.net.0.bias"] = (
            w(blk["net1"]), b(blk["net1"]))
        sd[f"{pre}.net.2.weight"], sd[f"{pre}.net.2.bias"] = (
            w(blk["net2"]), b(blk["net2"]))
        sd[f"{pre}.downsample.1.weight"], sd[f"{pre}.downsample.1.bias"] = (
            w(blk["down"]), b(blk["down"]))
    sd["final_conv.0.weight"] = w(params["final_conv"])
    sd["final_conv.0.bias"] = b(params["final_conv"])
    sd["final_linear.0.weight"] = torch.from_numpy(
        np.asarray(params["fc1"]["w"], np.float32).T)
    sd["final_linear.0.bias"] = torch.from_numpy(
        np.asarray(params["fc1"]["b"], np.float32))
    sd["final_linear.2.weight"] = torch.from_numpy(
        np.asarray(params["fc2"]["w"], np.float32).T)
    sd["final_linear.2.bias"] = torch.from_numpy(
        np.asarray(params["fc2"]["b"], np.float32))
    ref.load_state_dict(sd)

    rs = np.random.RandomState(0)
    x = np.tanh(rs.randn(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        # ascontiguousarray: the reference's x.view() requires NCHW-contiguous
        # activations (torch propagates channels_last through convs otherwise)
        want = ref(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        ).numpy()

    ours = np.asarray(stylegan_disc_logits(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)
    assert ours.shape == (2, 1)


def test_vqgan_training_with_stylegan_disc():
    """disc_type='stylegan' wires through the alternating trainer."""
    from sjd_tpu.models.vq.discriminator_stylegan import StyleGANDiscConfig
    from sjd_tpu.models.vq.train import make_vqgan_train_steps

    params = init_vq_params(jax.random.PRNGKey(0), CFG)
    tcfg = VQTrainConfig(disc_start=0, perceptual_weight=0.0)
    init_fn, g_step, d_step = make_vqgan_train_steps(
        CFG, tcfg, disc_type="stylegan",
        disc_cfg=StyleGANDiscConfig(image_size=16),
    )
    g_opt, d_params, d_opt, ema = init_fn(params, jax.random.PRNGKey(1))
    rs = np.random.RandomState(0)
    pixels = jnp.asarray(np.tanh(rs.randn(2, 16, 16, 3)).astype(np.float32))
    params, g_opt, ema, g_aux = g_step(params, g_opt, ema, d_params, pixels,
                                       jnp.int32(0))
    d_params, d_opt, d_aux = d_step(d_params, d_opt, params, pixels,
                                    jnp.int32(0))
    assert np.isfinite(float(g_aux["loss"]))
    assert np.isfinite(float(d_aux["d_loss"]))


def test_gan_losses_match_reference_formulas():
    """Pin every D/G loss to the reference's exact torch expressions
    (vq_loss.py:14-41). The reference's 'non-saturating' losses pass
    BCEWithLogits arguments SWAPPED (constant as input, logits as target),
    which makes them linear in the logits — we reproduce that behavior
    (documented in models/vq/train.py) rather than the textbook form."""
    import torch.nn.functional as F

    from sjd_tpu.models.vq.train import (
        hinge_d_loss,
        hinge_gen_loss,
        non_saturating_d_loss,
        non_saturating_gen_loss,
        vanilla_d_loss,
    )

    rs = np.random.RandomState(3)
    real = rs.randn(4, 5).astype(np.float32) * 2
    fake = rs.randn(4, 5).astype(np.float32) * 2
    tr, tf = torch.from_numpy(real), torch.from_numpy(fake)

    # hinge (vq_loss.py:14-18)
    want = 0.5 * (torch.mean(F.relu(1.0 - tr)) + torch.mean(F.relu(1.0 + tf)))
    np.testing.assert_allclose(
        float(hinge_d_loss(jnp.asarray(real), jnp.asarray(fake))),
        float(want), rtol=1e-6)

    # vanilla (vq_loss.py:21-25)
    want = 0.5 * (torch.mean(F.softplus(-tr)) + torch.mean(F.softplus(tf)))
    np.testing.assert_allclose(
        float(vanilla_d_loss(jnp.asarray(real), jnp.asarray(fake))),
        float(want), rtol=1e-6)

    # non-saturating D (vq_loss.py:28-32 — swapped-argument BCE)
    want = 0.5 * (
        torch.mean(F.binary_cross_entropy_with_logits(torch.ones_like(tr), tr))
        + torch.mean(
            F.binary_cross_entropy_with_logits(torch.zeros_like(tf), tf))
    )
    np.testing.assert_allclose(
        float(non_saturating_d_loss(jnp.asarray(real), jnp.asarray(fake))),
        float(want), rtol=1e-6)

    # hinge G (vq_loss.py:35-36) and non-saturating G (vq_loss.py:39-40)
    np.testing.assert_allclose(
        float(hinge_gen_loss(jnp.asarray(fake))), float(-torch.mean(tf)),
        rtol=1e-6)
    want = torch.mean(
        F.binary_cross_entropy_with_logits(torch.ones_like(tf), tf))
    np.testing.assert_allclose(
        float(non_saturating_gen_loss(jnp.asarray(fake))), float(want),
        rtol=1e-6)
