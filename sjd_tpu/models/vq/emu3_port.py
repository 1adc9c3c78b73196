"""Port Emu3VisionVQ torch checkpoints to the NHWC/NTHWC pytree."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax.numpy as jnp

from .emu3_vq import Emu3VQConfig


def _c2d(sd, name, dt):
    w = np.asarray(sd[f"{name}.weight"])  # OIHW
    return jnp.asarray(w.transpose(2, 3, 1, 0), dt), jnp.asarray(sd[f"{name}.bias"], dt)


def _c3d(sd, name, dt):
    w = np.asarray(sd[f"{name}.weight"])  # [co, ci, kt, kh, kw]
    return (
        jnp.asarray(w.transpose(2, 3, 4, 1, 0), dt),  # -> [kt, kh, kw, ci, co]
        jnp.asarray(sd[f"{name}.bias"], dt),
    )


def _gn(sd, name, dt):
    return {
        "norm_scale": jnp.asarray(sd[f"{name}.weight"], dt),
        "norm_bias": jnp.asarray(sd[f"{name}.bias"], dt),
    }


def _bn(sd, name, dt):
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"], dt),
        "bias": jnp.asarray(sd[f"{name}.bias"], dt),
        "mean": jnp.asarray(sd[f"{name}.running_mean"], dt),
        "var": jnp.asarray(sd[f"{name}.running_var"], dt),
    }


def _maybe_spatial_norm(sd, name, dt):
    if f"{name}.conv_y.weight" in sd:
        yw, yb = _c2d(sd, f"{name}.conv_y", dt)
        bw, bb = _c2d(sd, f"{name}.conv_b", dt)
        p = {
            "norm_scale": jnp.asarray(sd[f"{name}.norm_layer.weight"], dt),
            "norm_bias": jnp.asarray(sd[f"{name}.norm_layer.bias"], dt),
            "conv_y_w": yw, "conv_y_b": yb, "conv_b_w": bw, "conv_b_b": bb,
        }
        return p
    return _gn(sd, name, dt)


def _res2d(sd, base, dt):
    c1w, c1b = _c2d(sd, f"{base}.conv1", dt)
    c2w, c2b = _c2d(sd, f"{base}.conv2", dt)
    p = {
        "norm1": _maybe_spatial_norm(sd, f"{base}.norm1", dt),
        "norm2": _maybe_spatial_norm(sd, f"{base}.norm2", dt),
        "conv1_w": c1w, "conv1_b": c1b, "conv2_w": c2w, "conv2_b": c2b,
    }
    if f"{base}.nin_shortcut.weight" in sd:
        p["nin_w"], p["nin_b"] = _c2d(sd, f"{base}.nin_shortcut", dt)
    return p


def _attn2d(sd, base, dt):
    qw, qb = _c2d(sd, f"{base}.q", dt)
    kw, kb = _c2d(sd, f"{base}.k", dt)
    vw, vb = _c2d(sd, f"{base}.v", dt)
    pw, pb = _c2d(sd, f"{base}.proj_out", dt)
    return {
        "norm": _maybe_spatial_norm(sd, f"{base}.norm", dt),
        "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb, "v_w": vw, "v_b": vb,
        "proj_w": pw, "proj_b": pb,
    }


def _tres(sd, base, dt):
    c1w, c1b = _c3d(sd, f"{base}.conv1.conv", dt)
    c2w, c2b = _c3d(sd, f"{base}.conv2.conv", dt)
    p = {
        "norm1": _bn(sd, f"{base}.norm1", dt),
        "norm2": _bn(sd, f"{base}.norm2", dt),
        "conv1_w": c1w, "conv1_b": c1b, "conv2_w": c2w, "conv2_b": c2b,
    }
    if f"{base}.nin_shortcut.weight" in sd:
        w = np.asarray(sd[f"{base}.nin_shortcut.weight"])
        p["nin_w"] = jnp.asarray(w.transpose(2, 3, 4, 1, 0), dt)
        p["nin_b"] = jnp.asarray(sd[f"{base}.nin_shortcut.bias"], dt)
    return p


def port_emu3_vq(sd: Mapping[str, np.ndarray], cfg: Emu3VQConfig) -> Dict:
    dt = cfg.dtype
    n = cfg.num_resolutions

    # encoder
    eciw, ecib = _c2d(sd, "encoder.conv_in", dt)
    down = []
    for i in range(n):
        level: Dict = {
            "res": [_res2d(sd, f"encoder.down.{i}.block.{j}", dt)
                    for j in range(cfg.num_res_blocks)]
        }
        if f"encoder.down.{i}.attn.0.q.weight" in sd:
            level["attn"] = [_attn2d(sd, f"encoder.down.{i}.attn.{j}", dt)
                             for j in range(cfg.num_res_blocks)]
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            w, b = _c2d(sd, f"encoder.down.{i}.downsample.conv", dt)
            level["downsample"] = {"conv_w": w, "conv_b": b}
        down.append(level)
    ecow, ecob = _c2d(sd, "encoder.conv_out", dt)
    tconvs = []
    i = 0
    while f"encoder.time_conv.{i}.conv.conv.weight" in sd:
        w, b = _c3d(sd, f"encoder.time_conv.{i}.conv.conv", dt)
        tconvs.append({"conv_w": w, "conv_b": b})
        i += 1
    encoder = {
        "conv_in_w": eciw, "conv_in_b": ecib,
        "down": down,
        "mid_block1": _res2d(sd, "encoder.mid.block_1", dt),
        "mid_attn": _attn2d(sd, "encoder.mid.attn_1", dt),
        "mid_block2": _res2d(sd, "encoder.mid.block_2", dt),
        "norm_out_scale": jnp.asarray(sd["encoder.norm_out.weight"], dt),
        "norm_out_bias": jnp.asarray(sd["encoder.norm_out.bias"], dt),
        "conv_out_w": ecow, "conv_out_b": ecob,
        "time_conv": tconvs,
        "time_res_stack": [
            _tres(sd, f"encoder.time_res_stack.{j}", dt)
            for j in range(cfg.num_res_blocks)
        ],
    }

    # decoder (this repo stores up levels lowest-res first; reference decoder.up
    # is indexed by resolution level with up[n-1] = lowest, :653-663)
    dciw, dcib = _c2d(sd, "decoder.conv_in", dt)
    up = []
    for idx in range(n):
        lvl = n - 1 - idx
        level = {
            "res": [_res2d(sd, f"decoder.up.{lvl}.block.{j}", dt)
                    for j in range(cfg.num_res_blocks + 1)]
        }
        if f"decoder.up.{lvl}.attn.0.q.weight" in sd:
            level["attn"] = [_attn2d(sd, f"decoder.up.{lvl}.attn.{j}", dt)
                             for j in range(cfg.num_res_blocks + 1)]
        if f"decoder.up.{lvl}.upsample.conv.weight" in sd:
            w, b = _c2d(sd, f"decoder.up.{lvl}.upsample.conv", dt)
            level["upsample"] = {"conv_w": w, "conv_b": b}
        up.append(level)
    dcow, dcob = _c2d(sd, "decoder.conv_out", dt)
    dtconvs = []
    i = 0
    while f"decoder.time_conv.{i}.conv.conv.weight" in sd:
        w, b = _c3d(sd, f"decoder.time_conv.{i}.conv.conv", dt)
        dtconvs.append({"conv_w": w, "conv_b": b})
        i += 1
    decoder = {
        "conv_in_w": dciw, "conv_in_b": dcib,
        "time_res_stack": [
            _tres(sd, f"decoder.time_res_stack.{j}", dt)
            for j in range(cfg.num_res_blocks)
        ],
        "time_conv": dtconvs,
        "mid_block1": _res2d(sd, "decoder.mid.block_1", dt),
        "mid_attn": _attn2d(sd, "decoder.mid.attn_1", dt),
        "mid_block2": _res2d(sd, "decoder.mid.block_2", dt),
        "up": up,
        "norm_out": _maybe_spatial_norm(sd, "decoder.norm_out", dt),
        "conv_out_w": dcow, "conv_out_b": dcob,
    }

    qw, qb = _c3d(sd, "quant_conv.conv", dt)
    pw, pb = _c3d(sd, "post_quant_conv.conv", dt)
    return {
        "encoder": encoder,
        "decoder": decoder,
        "codebook": jnp.asarray(sd["quantize.embedding.weight"], jnp.float32),
        "quant_conv_w": qw, "quant_conv_b": qb,
        "post_quant_conv_w": pw, "post_quant_conv_b": pb,
    }


def init_emu3_vq_params(seed: int, cfg: Emu3VQConfig) -> Dict:
    """Random-init Emu3VisionVQ params with the exact checkpoint structure:
    a synthetic torch-layout state dict (:func:`synth_emu3_vq_state_dict`)
    routed through :func:`port_emu3_vq`, so the ported and random-init
    pytrees are structurally identical by construction. This keeps the Emu3
    pipeline drivable checkpoint-free (VQ-noise images) like the other
    families."""
    return port_emu3_vq(synth_emu3_vq_state_dict(seed, cfg), cfg)


def synth_emu3_vq_state_dict(seed: int, cfg: Emu3VQConfig) -> Dict:
    """Synthetic torch-layout Emu3VisionVQ state dict following the
    reference module's construction rules (emu3/tokenizer/
    modeling_emu3visionvq.py: encoder :476-556, decoder :598-681, quant
    convs :759-760). Used by random init above and by the on-disk
    checkpoint drill (tests/test_checkpoint_drill.py), which writes it to
    real checkpoint files and drives the loaders' ckpt paths end-to-end."""
    rs = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv2d(name, co, ci, k):
        sd[f"{name}.weight"] = rs.randn(co, ci, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(co, np.float32)

    def conv3d(name, co, ci, kt, kh, kw):
        sd[f"{name}.weight"] = (
            rs.randn(co, ci, kt, kh, kw).astype(np.float32) * 0.05
        )
        sd[f"{name}.bias"] = np.zeros(co, np.float32)

    def gn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def bn(name, c):
        gn(name, c)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def spatial(name, f, zq):
        gn(f"{name}.norm_layer", f)
        conv2d(f"{name}.conv_y", f, zq, 1)
        conv2d(f"{name}.conv_b", f, zq, 1)

    def res2d(base, ci, co, zq=None):
        if zq is None:
            gn(f"{base}.norm1", ci)
            gn(f"{base}.norm2", co)
        else:
            spatial(f"{base}.norm1", ci, zq)
            spatial(f"{base}.norm2", co, zq)
        conv2d(f"{base}.conv1", co, ci, 3)
        conv2d(f"{base}.conv2", co, co, 3)
        if ci != co:
            conv2d(f"{base}.nin_shortcut", co, ci, 1)

    def attn2d(base, c, zq=None):
        if zq is None:
            gn(f"{base}.norm", c)
        else:
            spatial(f"{base}.norm", c, zq)
        for nm in ("q", "k", "v", "proj_out"):
            conv2d(f"{base}.{nm}", c, c, 1)

    def tres(base, ci, co):
        bn(f"{base}.norm1", ci)
        bn(f"{base}.norm2", co)
        conv3d(f"{base}.conv1.conv", co, ci, 3, 3, 3)
        conv3d(f"{base}.conv2.conv", co, co, 3, 3, 3)
        if ci != co:
            conv3d(f"{base}.nin_shortcut", co, ci, 1, 1, 1)

    import math

    ch, z, zq = cfg.ch, cfg.z_channels, cfg.embed_dim
    n = cfg.num_resolutions
    nrb = cfg.num_res_blocks
    in_mult = (1,) + tuple(cfg.ch_mult)
    t_blocks = int(math.log2(cfg.temporal_downsample_factor))

    # encoder
    conv2d("encoder.conv_in", ch, 3, 3)
    for i in range(n):
        block_in = ch * in_mult[i]
        block_out = ch * cfg.ch_mult[i]
        for j in range(nrb):
            res2d(f"encoder.down.{i}.block.{j}", block_in if j == 0 else block_out,
                  block_out)
            if i in cfg.attn_levels:
                attn2d(f"encoder.down.{i}.attn.{j}", block_out)
        if i != n - 1:
            conv2d(f"encoder.down.{i}.downsample.conv", block_out, block_out, 3)
    mid = ch * cfg.ch_mult[-1]
    res2d("encoder.mid.block_1", mid, mid)
    attn2d("encoder.mid.attn_1", mid)
    res2d("encoder.mid.block_2", mid, mid)
    gn("encoder.norm_out", mid)
    conv2d("encoder.conv_out", z, mid, 3)
    for i in range(t_blocks):
        conv3d(f"encoder.time_conv.{i}.conv.conv", z, z, 4, 3, 3)
    for j in range(nrb):
        tres(f"encoder.time_res_stack.{j}", z, z)

    # decoder
    for j in range(nrb):
        tres(f"decoder.time_res_stack.{j}", z, z)
    for i in range(t_blocks):
        conv3d(f"decoder.time_conv.{i}.conv.conv", z, z, 3, 3, 3)
    conv2d("decoder.conv_in", mid, z, 3)
    res2d("decoder.mid.block_1", mid, mid, zq)
    attn2d("decoder.mid.attn_1", mid, zq)
    res2d("decoder.mid.block_2", mid, mid, zq)
    block_in = mid
    for lvl in reversed(range(n)):
        block_out = ch * cfg.ch_mult[lvl]
        for j in range(nrb + 1):
            res2d(f"decoder.up.{lvl}.block.{j}", block_in if j == 0 else block_out,
                  block_out, zq)
            if lvl in cfg.attn_levels:
                attn2d(f"decoder.up.{lvl}.attn.{j}", block_out, zq)
        block_in = block_out
        if lvl != 0:
            conv2d(f"decoder.up.{lvl}.upsample.conv", block_in, block_in, 3)
    spatial("decoder.norm_out", block_in, zq)
    conv2d("decoder.conv_out", 3, block_in, 3)

    sd["quantize.embedding.weight"] = (
        rs.randn(cfg.codebook_size, zq).astype(np.float32) * 0.05
    )
    conv3d("quant_conv.conv", zq, z, 3, 1, 1)
    conv3d("post_quant_conv.conv", z, zq, 3, 1, 1)
    return sd
