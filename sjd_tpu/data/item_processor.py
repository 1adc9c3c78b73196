"""FlexAR token layout + conversation prompting for Lumina-mGPT (layer L1).

Re-implements the token-level behavior of
lumina_mgpt/data/item_processor.py:100-211 and data/convertsation.py as pure
functions on id arrays, with an optional HF tokenizer for text:

  image block = <image_start>(8197) <size h_grids> <size w_grids>
                (row of w_lat ids + <new_line>(8803)) x h_lat
                <image_end>(8196)
  size token id = 8804 + n_grids;  latent dim = n_grids * 2  (patch 32,
  VQ latent 16: n_grids = pixels // 32, grid = pixels // 16)
  conversation turns end with <reserved08706>(8710); T2I prompt is
  "Generate an image of {W}x{H} according to the following prompt:\n{caption}"
  (test_lumina_mgpt.py:96-100).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..models.chameleon import (
    EOS_ID,
    IMAGE_END_ID,
    IMAGE_START_ID,
    NEW_LINE_ID,
    SIZE_TOKEN_BASE,
)
from .vocab_translation import VocabMapping, bpe_to_img, img_to_bpe

SEP_TOKEN = "<reserved08706>"
IMAGE_PLACEHOLDER = "<|image|>"


def size_token_id(pixels: int, patch_size: int = 32) -> int:
    return SIZE_TOKEN_BASE + pixels // patch_size


def grid_dims(pixels_h: int, pixels_w: int) -> Tuple[int, int]:
    """Latent grid (h, w) for a pixel size — VQ factor 16."""
    return pixels_h // 16, pixels_w // 16


def image_block_from_grid(
    grid_ids: np.ndarray,
    pixels_h: int,
    pixels_w: int,
    mapping: Optional[VocabMapping] = None,
) -> List[int]:
    """[h_lat, w_lat] VQ codebook ids -> the FlexAR image token block
    (FlexARItemProcessor.process_image, item_processor.py:109-145). The LM
    vocabulary uses BPE image-token ids, a name-derived permutation of the
    codebook ids (chameleon_vae_ori/vocab.py:56-106) — pass ``mapping`` to
    translate; None keeps raw ids (synthetic-token unit tests)."""
    h_lat, w_lat = grid_ids.shape
    assert (h_lat, w_lat) == grid_dims(pixels_h, pixels_w)
    if mapping is not None:
        grid_ids = img_to_bpe(mapping, np.asarray(grid_ids))
    with_eol = np.concatenate(
        [grid_ids, np.full((h_lat, 1), NEW_LINE_ID, grid_ids.dtype)], axis=1
    ).reshape(-1)
    return [
        IMAGE_START_ID,
        size_token_id(pixels_h),
        size_token_id(pixels_w),
        *[int(t) for t in with_eol],
        IMAGE_END_ID,
    ]


def image_grid_from_block(
    tokens: Sequence[int], mapping: Optional[VocabMapping] = None
) -> np.ndarray:
    """Inverse: image token span (starting at <image_start>) -> [h, w] grid of
    VQ codebook ids, the decode_image path (item_processor.py:179-211); pass
    ``mapping`` to undo the BPE permutation before the codebook lookup."""
    tokens = list(tokens)
    assert tokens[0] == IMAGE_START_ID, "expected <image_start>"
    h_lat = (tokens[1] - SIZE_TOKEN_BASE) * 2
    w_lat = (tokens[2] - SIZE_TOKEN_BASE) * 2
    body = tokens[3:]
    rows = []
    for r in range(h_lat):
        row = body[r * (w_lat + 1) : r * (w_lat + 1) + w_lat]
        assert len(row) == w_lat, f"truncated image at row {r}"
        eol = body[r * (w_lat + 1) + w_lat]
        assert eol == NEW_LINE_ID, f"missing <new_line> at row {r}: {eol}"
        rows.append(row)
    grid = np.asarray(rows, np.int32)
    if mapping is not None:
        grid = bpe_to_img(mapping, grid)
    return grid


def split_generation(tokens: Sequence[int]):
    """Split generated ids into ('text', [ids]) and ('image', [ids]) spans —
    the decode_ids split of inference_solver.py:356-403."""
    spans, cur, mode = [], [], "text"
    tokens = list(tokens)
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == IMAGE_START_ID:
            if cur:
                spans.append(("text", cur))
            # consume through <image_end>
            j = i
            while j < len(tokens) and tokens[j] != IMAGE_END_ID:
                j += 1
            spans.append(("image", tokens[i : j + 1]))
            cur, i = [], j + 1
        else:
            cur.append(t)
            i += 1
    if cur:
        spans.append(("text", cur))
    return spans


def image_grid(images, rows: int, cols: int):
    """Tile PIL images into one grid image — FlexARInferenceSolver
    .create_image_grid (used by generate_examples/generate.py)."""
    w, h = images[0].size
    from PIL import Image

    grid = Image.new("RGB", (cols * w, rows * h))
    for i, img in enumerate(images):
        grid.paste(img, ((i % cols) * w, (i // cols) * h))
    return grid


def t2i_question(caption: str, pixels_w: int = 768, pixels_h: int = 768) -> str:
    return (
        f"Generate an image of {pixels_w}x{pixels_h} according to the "
        f"following prompt:\n{caption}"
    )


def conversation_prompt(qas: List[List[Optional[str]]]) -> str:
    """Human/Assistant turns joined with the separator token string
    (data/convertsation.py); the trailing None answer leaves a generation
    prompt."""
    out = []
    for q, a in qas:
        out.append(q + SEP_TOKEN)
        if a is not None:
            out.append(a + SEP_TOKEN)
    return "".join(out)


class FlexARItemProcessor:
    """Tokenizer-backed prompt builder. `tokenizer` is any HF-style tokenizer
    with .encode / .decode over the Chameleon vocab (loaded from a checkpoint
    directory at runtime); the token-layout logic above stays tokenizer-free
    and unit-testable.

    With ``vq_params``/``mapping`` it also covers the image-*input* flows of
    the reference solver (inference_solver.py:299-353 takes ``images=[...]``;
    item_processor.process_image, reference :110-146): pixels -> VQ encode ->
    BPE-permute -> FlexAR block, spliced where ``<|image|>`` appears in a
    conversation turn — the image2image / freeform demo paths."""

    def __init__(self, tokenizer, *, mapping: Optional[VocabMapping] = None,
                 vq_params=None, vq_cfg=None, input_patches: int = 1024):
        self.tokenizer = tokenizer
        self.mapping = mapping
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        # variable crop sizes for image INPUTS (the reference's
        # crop_size_list + var_center_crop, item_processor.py:40-51);
        # input_patches bounds the encoded image's token budget
        from .image_processing import generate_crop_size_list

        self.crop_size_list = generate_crop_size_list(
            num_patches=input_patches, patch_size=32
        )

    def t2i_prompt_ids(self, caption: str, pixels: int = 768) -> List[int]:
        text = conversation_prompt([[t2i_question(caption, pixels, pixels), None]])
        return list(self.tokenizer.encode(text))

    def process_image(self, image) -> List[int]:
        """PIL image (or [H, W, 3] array in [-1, 1]) -> FlexAR token block.
        Mirrors the reference's process_image (item_processor.py:110-146):
        VQ-encode at the image's native size, img->bpe translate, lay out
        with per-row <new_line> and the grid-size header."""
        assert self.vq_params is not None, "process_image needs vq_params"
        import jax.numpy as jnp

        from ..models.vq import encode as vq_encode

        if hasattr(image, "size") and not isinstance(image, np.ndarray):
            image = self._fit_to_crop(image)
            w_px, h_px = image.size
            arr = np.asarray(image.convert("RGB"), np.float32) / 127.5 - 1.0
        else:
            arr = np.asarray(image, np.float32)
            h_px, w_px = arr.shape[:2]
            f = self.vq_cfg.downsample_factor
            assert h_px % (2 * f) == 0 and w_px % (2 * f) == 0, (
                f"array inputs must be multiples of {2 * f}px (pass a PIL "
                "image for automatic crop-list fitting)"
            )
        ids = vq_encode(self.vq_params, self.vq_cfg, jnp.asarray(arr[None]))
        f = self.vq_cfg.downsample_factor  # 16 for the Chameleon VQGAN
        grid = np.asarray(ids[0], np.int32).reshape(h_px // f, w_px // f)
        return image_block_from_grid(grid, h_px, w_px, mapping=self.mapping)

    def _fit_to_crop(self, image):
        """Deterministic var_center_crop (reference item_processor var_center
        _crop with a centered offset): pick the crop whose aspect ratio best
        matches, resize to cover, center-crop. Arbitrary input sizes (e.g.
        500x500) otherwise crash the grid reshape or desync the size header
        from the actual VQ grid."""
        import math

        w_px, h_px = image.size
        best = min(
            self.crop_size_list,
            key=lambda s: abs(math.log((w_px / h_px) / (s[0] / s[1]))),
        )
        cw, ch = best
        scale = max(cw / w_px, ch / h_px)
        rw, rh = max(cw, round(w_px * scale)), max(ch, round(h_px * scale))
        image = image.resize((rw, rh))
        left = (rw - cw) // 2
        top = (rh - ch) // 2
        return image.crop((left, top, left + cw, top + ch))

    def multimodal_prompt_ids(self, qas: List[List[Optional[str]]],
                              images: Sequence = ()) -> List[int]:
        """Conversation turns with ``<|image|>`` placeholders substituted by
        encoded image blocks, in order — process_item of the reference
        (media substitution per MMConvItemProcessor, consumed by
        inference_solver.generate :299-353)."""
        img_iter = iter(images)
        out: List[int] = []

        def emit(text: str):
            parts = text.split(IMAGE_PLACEHOLDER)
            for k, part in enumerate(parts):
                if k:
                    out.extend(self.process_image(next(img_iter)))
                if part:
                    out.extend(self.tokenizer.encode(part))

        for q, a in qas:
            emit(q + SEP_TOKEN)
            if a is not None:
                emit(a + SEP_TOKEN)
        return out

    def decode_images(self, tokens: Sequence[int]) -> List[np.ndarray]:
        return [
            image_grid_from_block(span, mapping=self.mapping)
            for kind, span in split_generation(tokens)
            if kind == "image"
        ]
