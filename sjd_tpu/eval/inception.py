"""InceptionV3 pool3 feature extractor (the FID backbone), ported to JAX.

The reference scores FID with pytorch_fid's InceptionV3
(evaluation_metrics.py:112-271), whose weights are a torch checkpoint
(pt_inception-2015-12-05 or the torchvision ImageNet inception_v3). Neither
torchvision nor egress exists in this environment, so this module ports the
*network* natively: ``port_inception_v3`` folds each BasicConv2d's
BatchNorm (eps 1e-3, eval mode) into the conv at port time, and
``pool3_features`` runs the full Inception-v3 trunk (Conv2d_1a..Mixed_7c +
global average pool -> 2048-d) in NHWC JAX.

``fid_pools=True`` reproduces pytorch_fid's two modifications to the stock
torchvision graph (pytorch_fid/inception.py FIDInceptionA/C/E):
  * the in-block 3x3/stride-1 average pools use count_include_pad=False;
  * Mixed_7c's pool branch uses MAX pooling instead of average.
With ``fid_pools=False`` the graph is exactly torchvision's inception_v3
(oracle-tested against a torch re-implementation of those blocks in
tests/test_inception_port.py, which runs without torchvision).

Mirrors the LPIPS torch-weights-port pattern (models/vq/lpips.py:
port_vgg16_features): on checkpoint day, ``--inception-ckpt`` on
examples/eval_model.py / examples/recon_eval.py produces calibrated FID.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

import jax
import jax.numpy as jnp

PyTree = Any

_BN_EPS = 1e-3  # BasicConv2d's BatchNorm2d eps (torchvision inception.py)


def port_inception_v3(sd: Mapping[str, Any]) -> Dict[str, dict]:
    """torch state_dict -> {block_name: {"w" HWIO, "b"}} with BN folded.

    Accepts torchvision inception_v3 or pytorch_fid FID-weights state dicts
    (same key names); the fc / AuxLogits weights are ignored (pool3
    features stop before them)."""
    params: Dict[str, dict] = {}
    for key in sd:
        if not key.endswith(".conv.weight"):
            continue
        base = key[: -len(".conv.weight")]
        if base.startswith("AuxLogits"):
            continue
        w = np.asarray(sd[f"{base}.conv.weight"], np.float32)  # OIHW
        g = np.asarray(sd[f"{base}.bn.weight"], np.float32)
        b = np.asarray(sd[f"{base}.bn.bias"], np.float32)
        m = np.asarray(sd[f"{base}.bn.running_mean"], np.float32)
        v = np.asarray(sd[f"{base}.bn.running_var"], np.float32)
        scale = g / np.sqrt(v + _BN_EPS)
        params[base] = {
            "w": jnp.asarray((w * scale[:, None, None, None]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b - m * scale),
        }
    assert "Conv2d_1a_3x3" in params and "Mixed_7c.branch_pool" in params, (
        "state dict does not look like an InceptionV3 checkpoint"
    )
    return params


def _conv(params, name, x, stride=1, pad=(0, 0)):
    p = params[name]
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    return jax.nn.relu(out)


def _max_pool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _avg_pool_3x3_s1(x, count_include_pad: bool):
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    if count_include_pad:
        return s / 9.0
    cnt = jax.lax.reduce_window(
        jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
        (1, 3, 3, 1), (1, 1, 1, 1), pad,
    )
    return s / cnt


def _max_pool_3x3_s1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _inception_a(params, base, x, fid: bool):
    c = lambda n, xx, **kw: _conv(params, f"{base}.{n}", xx, **kw)  # noqa: E731
    b1 = c("branch1x1", x)
    b5 = c("branch5x5_2", c("branch5x5_1", x), pad=(2, 2))
    bd = c("branch3x3dbl_3",
           c("branch3x3dbl_2", c("branch3x3dbl_1", x), pad=(1, 1)),
           pad=(1, 1))
    bp = c("branch_pool", _avg_pool_3x3_s1(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _inception_b(params, base, x):
    c = lambda n, xx, **kw: _conv(params, f"{base}.{n}", xx, **kw)  # noqa: E731
    b3 = c("branch3x3", x, stride=2)
    bd = c("branch3x3dbl_3",
           c("branch3x3dbl_2", c("branch3x3dbl_1", x), pad=(1, 1)),
           stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _inception_c(params, base, x, fid: bool):
    c = lambda n, xx, **kw: _conv(params, f"{base}.{n}", xx, **kw)  # noqa: E731
    b1 = c("branch1x1", x)
    b7 = c("branch7x7_3", c("branch7x7_2", c("branch7x7_1", x), pad=(0, 3)),
           pad=(3, 0))
    bd = c("branch7x7dbl_5",
           c("branch7x7dbl_4",
             c("branch7x7dbl_3",
               c("branch7x7dbl_2", c("branch7x7dbl_1", x), pad=(3, 0)),
               pad=(0, 3)),
             pad=(3, 0)),
           pad=(0, 3))
    bp = c("branch_pool", _avg_pool_3x3_s1(x, count_include_pad=not fid))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, base, x):
    c = lambda n, xx, **kw: _conv(params, f"{base}.{n}", xx, **kw)  # noqa: E731
    b3 = c("branch3x3_2", c("branch3x3_1", x), stride=2)
    b7 = c("branch7x7x3_4",
           c("branch7x7x3_3",
             c("branch7x7x3_2", c("branch7x7x3_1", x), pad=(0, 3)),
             pad=(3, 0)),
           stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _inception_e(params, base, x, fid: bool, fid_max_pool: bool):
    c = lambda n, xx, **kw: _conv(params, f"{base}.{n}", xx, **kw)  # noqa: E731
    b1 = c("branch1x1", x)
    b3 = c("branch3x3_1", x)
    b3 = jnp.concatenate(
        [c("branch3x3_2a", b3, pad=(0, 1)), c("branch3x3_2b", b3, pad=(1, 0))],
        axis=-1,
    )
    bd = c("branch3x3dbl_2", c("branch3x3dbl_1", x), pad=(1, 1))
    bd = jnp.concatenate(
        [c("branch3x3dbl_3a", bd, pad=(0, 1)), c("branch3x3dbl_3b", bd, pad=(1, 0))],
        axis=-1,
    )
    if fid and fid_max_pool:
        pooled = _max_pool_3x3_s1(x)  # FIDInceptionE_2 (Mixed_7c)
    else:
        pooled = _avg_pool_3x3_s1(x, count_include_pad=not fid)
    bp = c("branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def pool3_features(
    params: Dict[str, dict],
    images: jnp.ndarray,  # [N, H, W, 3] in [0, 1]
    *,
    fid_pools: bool = True,
) -> jnp.ndarray:
    """Full trunk -> [N, 2048] pool3 features. Inputs are scaled to [-1, 1]
    like pytorch_fid (normalize_input) and should be 299x299 (the caller
    resizes; any HxW >= 75 works)."""
    x = images.astype(jnp.float32) * 2.0 - 1.0
    x = _conv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, pad=(1, 1))
    x = _max_pool(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params, blk, x, fid_pools)
    x = _inception_b(params, "Mixed_6a", x)
    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, blk, x, fid_pools)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, fid_pools, fid_max_pool=False)
    x = _inception_e(params, "Mixed_7c", x, fid_pools, fid_max_pool=True)
    return jnp.mean(x, axis=(1, 2))  # global average pool -> [N, 2048]


def make_inception_extractor_from_ckpt(path: str, *, fid_pools: bool = True,
                                       batch: int = 16):
    """torch checkpoint file -> extract(images [N,H,W,3] in [0,1]) -> [N,2048].

    The calibrated-FID seam for eval_model.py / recon_eval.py
    (--inception-ckpt): resizes to 299 with bilinear like pytorch_fid and
    runs the jitted trunk batch-wise."""
    from sjd_tpu.utils.port import load_torch_checkpoint

    params = port_inception_v3(load_torch_checkpoint(path))
    fwd = jax.jit(lambda p, x: pool3_features(p, x, fid_pools=fid_pools))

    def extract(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch):
            x = jnp.asarray(images[i : i + batch], jnp.float32)
            if x.shape[1] != 299 or x.shape[2] != 299:
                x = jax.image.resize(
                    x, (x.shape[0], 299, 299, 3), method="bilinear"
                )
            out.append(np.asarray(fwd(params, x)))
        return np.concatenate(out)

    return extract
