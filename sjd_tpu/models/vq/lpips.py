"""LPIPS perceptual loss (VGG16 variant) for VQGAN training.

JAX port of the reference's stripped PerceptualSimilarity metric
(llamagen/tokenizer/tokenizer_image/lpips.py:53-163): inputs in [-1, 1] pass
the fixed scaling layer, run through the five VGG16 feature slices
(relu1_2/relu2_2/relu3_3/relu4_3/relu5_3), each slice's channel-normalized
feature difference is squared, weighted by a learned 1x1 "lin" layer
(dropout is eval-mode identity), spatially averaged, and summed.

Weights:
  * the 5 lin calibration vectors ship in the published taming `vgg.pth`
    (the reference vendors it at tokenizer_image/cache/vgg.pth) —
    ``port_lpips_lins`` loads that torch checkpoint;
  * the VGG16 backbone comes from a torchvision `vgg16` state_dict
    (``port_vgg16_features``; torchvision's download needs egress, so the
    state_dict file is an input here).
``init_lpips_params`` random-initializes both so training smoke-runs stay
drivable offline; the loss is then an untrained-feature distance (still a
valid training signal shape, NOT the calibrated LPIPS metric).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

PyTree = Any

# VGG16 `features` conv plan: channels per conv, with maxpools between the
# five slices. Slice boundaries after convs 2, 4, 7, 10, 13 (1-indexed).
VGG16_PLAN: List[List[int]] = [
    [64, 64],             # slice1 -> relu1_2
    [128, 128],           # slice2 -> relu2_2
    [256, 256, 256],      # slice3 -> relu3_3
    [512, 512, 512],      # slice4 -> relu4_3
    [512, 512, 512],      # slice5 -> relu5_3
]
# torchvision features indices of the 13 convs
_TV_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(rng: jax.Array) -> PyTree:
    convs = []
    cin = 3
    keys = iter(jax.random.split(rng, 16))
    for slice_plan in VGG16_PLAN:
        for cout in slice_plan:
            k = next(keys)
            w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
            w = w / np.sqrt(9 * cin)
            convs.append({"w": w, "b": jnp.zeros((cout,), jnp.float32)})
            cin = cout
    lins = [jnp.full((p[-1],), 1.0 / p[-1], jnp.float32) for p in VGG16_PLAN]
    return {"convs": convs, "lins": lins, "calibrated": False}


def port_vgg16_features(state: Dict[str, Any]) -> List[dict]:
    """torchvision vgg16 state_dict -> the 13 conv {w HWIO, b} dicts.
    Accepts either bare `features.N.*` keys or a full-model dict."""
    convs = []
    for i in _TV_CONV_IDX:
        w = np.asarray(state[f"features.{i}.weight"], np.float32)
        b = np.asarray(state[f"features.{i}.bias"], np.float32)
        convs.append({
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "b": jnp.asarray(b),
        })
    return convs


def port_lpips_lins(state: Dict[str, Any]) -> List[jnp.ndarray]:
    """taming vgg.pth -> the five lin vectors ([1, C, 1, 1] -> [C])."""
    return [
        jnp.asarray(
            np.asarray(state[f"lin{k}.model.1.weight"], np.float32).reshape(-1)
        )
        for k in range(5)
    ]


def port_lpips(
    lins_state: Dict[str, Any],
    vgg_state: Optional[Dict[str, Any]] = None,
    rng: Optional[jax.Array] = None,
) -> PyTree:
    """Assemble LPIPS params from torch checkpoints (see module docstring)."""
    if vgg_state is not None:
        convs = port_vgg16_features(vgg_state)
        calibrated = True
    else:
        convs = init_lpips_params(rng if rng is not None else jax.random.PRNGKey(0))["convs"]
        calibrated = False
    return {"convs": convs, "lins": port_lpips_lins(lins_state),
            "calibrated": calibrated}


def _conv3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg16_slices(params: PyTree, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [B, H, W, 3] (scaled) -> the five relu*_* feature maps."""
    feats = []
    ci = 0
    for si, slice_plan in enumerate(VGG16_PLAN):
        if si > 0:
            x = _maxpool2(x)
        for _ in slice_plan:
            c = params["convs"][ci]
            x = jax.nn.relu(_conv3(x, c["w"], c["b"]))
            ci += 1
        feats.append(x)
    return feats


def _normalize_ch(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips(params: PyTree, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance per sample, [B]. x, y in [-1, 1], NHWC."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    xs = (x.astype(jnp.float32) - shift) / scale
    ys = (y.astype(jnp.float32) - shift) / scale
    fx = vgg16_slices(params, xs)
    fy = vgg16_slices(params, ys)
    total = 0.0
    for k in range(len(VGG16_PLAN)):
        d = (_normalize_ch(fx[k]) - _normalize_ch(fy[k])) ** 2  # [B,h,w,C]
        lin = params["lins"][k]  # [C] — the 1x1 no-bias conv
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total
