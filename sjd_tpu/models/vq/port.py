"""Port taming/HF-Chameleon/LlamaGen VQGAN checkpoints to the NHWC pytree.

Name styles:
  "taming"   — Chameleon's vendored VQGAN and HF ChameleonVQVAE share it:
               encoder.down.{i}.block.{j}.*, decoder.up.{i}.block.{j}.*,
               mid.block_1/attn_1/block_2, quantize.embedding.weight
               (lumina_mgpt/model/chameleon_vae_ori/vqgan.py).
               NOTE: taming's decoder.up is indexed by *resolution level*
               (0 = highest res) while this repo stores levels lowest-first.
  "llamagen" — encoder.conv_blocks.{i}.res.{j}.*, .attn.{j}, mid.{0,1,2},
               decoder.conv_blocks already lowest-first
               (llamagen/tokenizer/tokenizer_image/vq_model.py).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax.numpy as jnp

from .taming import VQConfig


def _conv(sd, name, dt):
    w = np.asarray(sd[f"{name}.weight"])  # torch OIHW
    return (
        jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dt),  # -> HWIO
        jnp.asarray(sd[f"{name}.bias"], dt),
    )


def _norm(sd, name, dt):
    return jnp.asarray(sd[f"{name}.weight"], dt), jnp.asarray(sd[f"{name}.bias"], dt)


def _res(sd, base, dt) -> Dict:
    c1w, c1b = _conv(sd, f"{base}.conv1", dt)
    c2w, c2b = _conv(sd, f"{base}.conv2", dt)
    n1s, n1b = _norm(sd, f"{base}.norm1", dt)
    n2s, n2b = _norm(sd, f"{base}.norm2", dt)
    p = {
        "norm1_scale": n1s, "norm1_bias": n1b, "conv1_w": c1w, "conv1_b": c1b,
        "norm2_scale": n2s, "norm2_bias": n2b, "conv2_w": c2w, "conv2_b": c2b,
    }
    if f"{base}.nin_shortcut.weight" in sd:
        p["nin_w"], p["nin_b"] = _conv(sd, f"{base}.nin_shortcut", dt)
    if f"{base}.conv_shortcut.weight" in sd:
        p["nin_w"], p["nin_b"] = _conv(sd, f"{base}.conv_shortcut", dt)
    return p


def _attn(sd, base, dt) -> Dict:
    ns, nb = _norm(sd, f"{base}.norm", dt)
    qw, qb = _conv(sd, f"{base}.q", dt)
    kw, kb = _conv(sd, f"{base}.k", dt)
    vw, vb = _conv(sd, f"{base}.v", dt)
    pw, pb = _conv(sd, f"{base}.proj_out", dt)
    return {
        "norm_scale": ns, "norm_bias": nb,
        "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb, "v_w": vw, "v_b": vb,
        "proj_w": pw, "proj_b": pb,
    }


def port_vqgan(sd: Mapping[str, np.ndarray], cfg: VQConfig, *, style: str = "taming") -> Dict:
    dt = cfg.dtype
    n = cfg.num_resolutions

    if style == "taming":
        def enc_res(i, j):
            return f"encoder.down.{i}.block.{j}"

        def enc_attn(i, j):
            return f"encoder.down.{i}.attn.{j}"

        def enc_down(i):
            return f"encoder.down.{i}.downsample.conv"

        def dec_res(idx, j):  # idx lowest-first -> taming level index
            return f"decoder.up.{n - 1 - idx}.block.{j}"

        def dec_attn(idx, j):
            return f"decoder.up.{n - 1 - idx}.attn.{j}"

        def dec_up(idx):
            return f"decoder.up.{n - 1 - idx}.upsample.conv"

        mid = lambda part, k: f"{part}.mid.{k}"  # noqa: E731
        mid_names = {"b1": "block_1", "attn": "attn_1", "b2": "block_2"}
    elif style == "llamagen":
        def enc_res(i, j):
            return f"encoder.conv_blocks.{i}.res.{j}"

        def enc_attn(i, j):
            return f"encoder.conv_blocks.{i}.attn.{j}"

        def enc_down(i):
            return f"encoder.conv_blocks.{i}.downsample.conv"

        def dec_res(idx, j):  # llamagen decoder blocks already lowest-first
            return f"decoder.conv_blocks.{idx}.res.{j}"

        def dec_attn(idx, j):
            return f"decoder.conv_blocks.{idx}.attn.{j}"

        def dec_up(idx):
            return f"decoder.conv_blocks.{idx}.upsample.conv"

        mid = lambda part, k: f"{part}.mid.{k}"  # noqa: E731
        mid_names = {"b1": "0", "attn": "1", "b2": "2"}
    else:
        raise ValueError(f"unknown style {style!r}")

    params: Dict = {
        "codebook": jnp.asarray(sd["quantize.embedding.weight"], jnp.float32),
    }
    if "quant_conv.weight" in sd:
        params["quant_conv_w"], params["quant_conv_b"] = _conv(sd, "quant_conv", dt)
    if "post_quant_conv.weight" in sd:
        params["post_quant_conv_w"], params["post_quant_conv_b"] = _conv(
            sd, "post_quant_conv", dt
        )

    if "encoder.conv_in.weight" in sd:
        ciw, cib = _conv(sd, "encoder.conv_in", dt)
        down = []
        for i in range(n):
            level: Dict = {
                "res": [_res(sd, enc_res(i, j), dt) for j in range(cfg.num_res_blocks)]
            }
            if f"{enc_attn(i, 0)}.q.weight" in sd:
                level["attn"] = [
                    _attn(sd, enc_attn(i, j), dt) for j in range(cfg.num_res_blocks)
                ]
            if f"{enc_down(i)}.weight" in sd:
                w, b = _conv(sd, enc_down(i), dt)
                level["downsample"] = {"conv_w": w, "conv_b": b}
            down.append(level)
        eno, enb = _norm(sd, "encoder.norm_out", dt)
        cow, cob = _conv(sd, "encoder.conv_out", dt)
        params["encoder"] = {
            "conv_in_w": ciw, "conv_in_b": cib, "down": down,
            "mid_block1": _res(sd, mid("encoder", mid_names["b1"]), dt),
            "mid_attn": _attn(sd, mid("encoder", mid_names["attn"]), dt),
            "mid_block2": _res(sd, mid("encoder", mid_names["b2"]), dt),
            "norm_out_scale": eno, "norm_out_bias": enb,
            "conv_out_w": cow, "conv_out_b": cob,
        }

    if "decoder.conv_in.weight" in sd:
        dciw, dcib = _conv(sd, "decoder.conv_in", dt)
        up = []
        for idx in range(n):
            level = {
                "res": [
                    _res(sd, dec_res(idx, j), dt)
                    for j in range(cfg.num_res_blocks + 1)
                ]
            }
            if f"{dec_attn(idx, 0)}.q.weight" in sd:
                level["attn"] = [
                    _attn(sd, dec_attn(idx, j), dt)
                    for j in range(cfg.num_res_blocks + 1)
                ]
            if f"{dec_up(idx)}.weight" in sd:
                w, b = _conv(sd, dec_up(idx), dt)
                level["upsample"] = {"conv_w": w, "conv_b": b}
            up.append(level)
        dno, dnb = _norm(sd, "decoder.norm_out", dt)
        dcow, dcob = _conv(sd, "decoder.conv_out", dt)
        params["decoder"] = {
            "conv_in_w": dciw, "conv_in_b": dcib,
            "mid_block1": _res(sd, mid("decoder", mid_names["b1"]), dt),
            "mid_attn": _attn(sd, mid("decoder", mid_names["attn"]), dt),
            "mid_block2": _res(sd, mid("decoder", mid_names["b2"]), dt),
            "up": up,
            "norm_out_scale": dno, "norm_out_bias": dnb,
            "conv_out_w": dcow, "conv_out_b": dcob,
        }

    return params
