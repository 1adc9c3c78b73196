"""Native CLIP tower parity vs transformers' *torch* CLIPModel at tiny scale
(round-5 verdict #5). The oracle is the exact stack torchmetrics' CLIPScore
rides (evaluation_metrics.py:219-271), so unlike a second hand-rolled
implementation this pins the port to the production dependency itself."""

import numpy as np
import pytest

import jax.numpy as jnp

from sjd_tpu.eval.clip import (
    CLIPConfig,
    clip_image_features,
    clip_text_features,
    port_clip,
    preprocess_images,
)
from sjd_tpu.utils.port import state_dict_to_numpy

torch = pytest.importorskip("torch")


def _tiny_pair(seed=0):
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    hf_cfg = HFCLIPConfig(
        vision_config={
            "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 64,
            "image_size": 32, "patch_size": 8,
        },
        text_config={
            "hidden_size": 24, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 48,
            "vocab_size": 64, "max_position_embeddings": 16,
            # eos = max id so HF's eos-match pooling and the argmax pooling
            # of the standard CLIP vocab coincide
            "eos_token_id": 63,
        },
        projection_dim=20,
    )
    torch.manual_seed(seed)
    hf = CLIPModel(hf_cfg).eval()
    cfg = CLIPConfig.from_hf_config(
        {
            "vision_config": {
                "hidden_size": 32, "num_hidden_layers": 2,
                "num_attention_heads": 4, "intermediate_size": 64,
                "image_size": 32, "patch_size": 8,
            },
            "text_config": {
                "hidden_size": 24, "num_hidden_layers": 2,
                "num_attention_heads": 4, "intermediate_size": 48,
                "vocab_size": 64, "max_position_embeddings": 16,
            },
            "projection_dim": 20,
        }
    )
    params = port_clip(state_dict_to_numpy(hf.state_dict()), cfg)
    return hf, cfg, params


def test_clip_image_tower_parity():
    hf, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    px = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(clip_image_features(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_text_tower_parity():
    hf, cfg, params = _tiny_pair(seed=1)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 62, size=(4, 12))
    # one eos (= max id) per row at varying positions; pad after with 0
    for b, pos in enumerate((11, 7, 5, 9)):
        ids[b, pos] = 63
        ids[b, pos + 1 :] = 0
    with torch.no_grad():
        want = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
    got = np.asarray(
        clip_text_features(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_preprocess_matches_hf_image_processor():
    """preprocess_images vs transformers' (numpy-based) CLIPImageProcessor:
    shortest-side bicubic resize + center crop + normalize."""
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
        do_convert_rgb=False,
    )
    rng = np.random.default_rng(2)
    im = rng.integers(0, 256, size=(48, 40, 3)).astype(np.uint8)
    want = proc(images=[im], return_tensors="np")["pixel_values"][0]
    got = preprocess_images(im[None], image_size=32)[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_clip_score_math_end_to_end():
    """evaluate-side math: CLIPScore = 100 * mean(max(0, cos)) over matched
    pairs, computed from the native embeddings."""
    from sjd_tpu.eval.metrics import clip_score

    hf, cfg, params = _tiny_pair(seed=2)
    rng = np.random.default_rng(3)
    px = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(3, 62, size=(2, 12))
    ids[:, -1] = 63
    img = np.asarray(clip_image_features(params, cfg, jnp.asarray(px)))
    txt = np.asarray(clip_text_features(params, cfg, jnp.asarray(ids, jnp.int32)))
    score = clip_score(img, txt)
    with torch.no_grad():
        wi = hf.get_image_features(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2))).numpy()
        wt = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
    np.testing.assert_allclose(score, clip_score(wi, wt), rtol=1e-3)
