"""Quantitative quality metrics: FID / Inception Score / CLIPScore.

The reference shells out to pytorch_fid + torchmetrics
(evaluation_metrics.py:112-271). Neither is in this image, so the metric
*math* is implemented natively (numpy/scipy) over pluggable feature
extractors; the standard extractors (InceptionV3 pool3, CLIP ViT) load
through transformers/torch when their checkpoints are available and raise a
clear error otherwise.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


# ---------------------------------------------------------------------------
# metric math (feature-space)
# ---------------------------------------------------------------------------


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """FID between two feature sets [N, D] (Heusel et al. 2017)."""
    from scipy import linalg

    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset) @ (s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def inception_score(
    probs: np.ndarray, splits: int = 10
) -> tuple[float, float]:
    """IS from class probabilities [N, C] (Salimans et al. 2016)."""
    scores = []
    n = probs.shape[0]
    splits = max(1, min(splits, n))  # avoid empty splits on small sets
    for part in np.array_split(probs, splits):
        py = part.mean(0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def clip_score(
    image_embeds: np.ndarray, text_embeds: np.ndarray, scale: float = 100.0
) -> float:
    """Mean max(0, cos(image, text)) * scale over matched pairs [N, D]."""
    a = image_embeds / np.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = text_embeds / np.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return float(np.maximum((a * b).sum(-1), 0).mean() * scale)


# ---------------------------------------------------------------------------
# image-dir evaluation (the reference's CLI shape, evaluation_metrics.py:274-335)
# ---------------------------------------------------------------------------


def load_image_dir(path: str, size: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    arrs = []

    def order(name):
        # harness files are {index}.png — sort numerically so image[i]
        # aligns with prompt[i] (lexicographic puts 10.png before 2.png,
        # silently mispairing every CLIPScore from the 11th image on)
        stem = os.path.splitext(name)[0]
        return (0, int(stem), name) if stem.isdigit() else (1, 0, name)

    for name in sorted(os.listdir(path), key=order):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = Image.open(os.path.join(path, name)).convert("RGB")
        if size:
            img = img.resize((size, size), Image.BICUBIC)
        arrs.append(np.asarray(img, np.float32) / 255.0)
    if not arrs:
        raise FileNotFoundError(f"no images under {path}")
    return np.stack(arrs)


def make_inception_extractor():
    """InceptionV3 pool3 features via torchvision, if its weights exist."""
    try:
        import torch
        from torchvision.models import Inception_V3_Weights, inception_v3
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "torchvision unavailable: provide a custom feature extractor to "
            "evaluate_quantitative_scores(feature_fn=...)"
        ) from e
    net = inception_v3(weights=Inception_V3_Weights.DEFAULT, transform_input=False)
    net.fc = torch.nn.Identity()
    net.eval()

    def extract(images: np.ndarray, batch: int = 32) -> np.ndarray:
        out = []
        with torch.no_grad():
            for i in range(0, len(images), batch):
                x = torch.tensor(images[i : i + batch]).permute(0, 3, 1, 2)
                x = torch.nn.functional.interpolate(
                    x, size=(299, 299), mode="bilinear", align_corners=False
                )
                out.append(net(x * 2 - 1).numpy())
        return np.concatenate(out)

    return extract


def make_clip_extractor(model_dir: str):
    """CLIP image/text embedding fns for CLIPScore (the torchmetrics
    CLIPScore path of evaluation_metrics.py:219-271), via transformers from a
    local checkpoint directory."""
    from transformers import CLIPModel, CLIPProcessor
    import torch

    model = CLIPModel.from_pretrained(model_dir).eval()
    proc = CLIPProcessor.from_pretrained(model_dir)

    def image_embeds(images: np.ndarray, batch: int = 32) -> np.ndarray:
        out = []
        with torch.no_grad():
            for i in range(0, len(images), batch):
                inputs = proc(
                    images=[(im * 255).astype(np.uint8) for im in images[i : i + batch]],
                    return_tensors="pt",
                )
                out.append(model.get_image_features(**inputs).numpy())
        return np.concatenate(out)

    def text_embeds(texts, batch: int = 64) -> np.ndarray:
        out = []
        with torch.no_grad():
            for i in range(0, len(texts), batch):
                inputs = proc(
                    text=list(texts[i : i + batch]),
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                )
                out.append(model.get_text_features(**inputs).numpy())
        return np.concatenate(out)

    return image_embeds, text_embeds


def evaluate_clip_score(
    generated_dir: str, prompts, model_dir: str, *, native: bool = True
) -> float:
    """CLIPScore over a generated dir + matched prompts
    (evaluate_quantitative_scores_text2img, evaluation_metrics.py:219-271).

    native=True (default) runs the from-scratch JAX towers (eval/clip.py,
    oracle-parity-tested vs the torch CLIPModel) — torch-free from a local
    checkpoint dir; native=False keeps the transformers-CLIPModel extractor
    for cross-checking."""
    if native:
        from sjd_tpu.eval.clip import make_native_clip_extractor

        image_embeds, text_embeds = make_native_clip_extractor(model_dir)
    else:
        image_embeds, text_embeds = make_clip_extractor(model_dir)
    imgs = load_image_dir(generated_dir, size=224)
    return clip_score(image_embeds(imgs), text_embeds(list(prompts)))


def make_pixel_extractor(pool: int = 8):
    """Checkpoint-free smoke extractor: mean-pooled pixel statistics as the
    'feature' vector. NOT comparable to Inception-FID numbers — it exists so
    the full Parti/COCO scoring pipeline (generate -> shard -> FID/IS math)
    can be driven end-to-end in environments without torchvision weights
    (documented smoke path; pass feature_fn=make_inception_extractor() or a
    CLIP/Inception port for real quality numbers)."""

    def extract(images: np.ndarray) -> np.ndarray:
        n, h, w, c = images.shape
        ph, pw = h // pool, w // pool
        x = images[:, : ph * pool, : pw * pool, :]
        x = x.reshape(n, pool, ph, pool, pw, c).mean(axis=(2, 4))
        return x.reshape(n, -1).astype(np.float64)

    return extract


def make_pixel_probs(n_classes: int = 16):
    """Smoke 'classifier' for the IS formula: softmax over coarse color
    histograms. Same caveat as make_pixel_extractor."""

    def probs(images: np.ndarray) -> np.ndarray:
        n = images.shape[0]
        feats = images.reshape(n, -1, 3).mean(axis=1).astype(np.float64)
        feats = (feats - feats.mean(0)) / (feats.std(0) + 1e-6)
        logits = np.concatenate(
            [np.outer(np.tanh(feats[:, k]), np.arange(1, n_classes // 3 + 1))
             for k in range(3)]
            + [np.zeros((n, n_classes - 3 * (n_classes // 3)))],
            axis=1,
        )
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    return probs


def evaluate_quantitative_scores(
    generated_dir: str,
    reference_dir: Optional[str] = None,
    *,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    probs_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> dict:
    """FID (vs reference_dir) and IS over a generated image directory —
    evaluate_quantitative_scores[_text2img] (evaluation_metrics.py:112-271)."""
    gen = load_image_dir(generated_dir)
    results: dict = {"n_images": len(gen)}
    if reference_dir is not None:
        # the Inception extractor only matters for FID — constructing it
        # unconditionally made IS-only runs fail in torch-free environments
        if feature_fn is None:
            feature_fn = make_inception_extractor()
        ref = load_image_dir(reference_dir)
        results["fid"] = frechet_distance(feature_fn(gen), feature_fn(ref))
    if probs_fn is not None:
        is_mean, is_std = inception_score(probs_fn(gen))
        results["inception_score"] = is_mean
        results["inception_score_std"] = is_std
    return results
