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

SEP_TOKEN = "<reserved08706>"


def size_token_id(pixels: int, patch_size: int = 32) -> int:
    return SIZE_TOKEN_BASE + pixels // patch_size


def grid_dims(pixels_h: int, pixels_w: int) -> Tuple[int, int]:
    """Latent grid (h, w) for a pixel size — VQ factor 16."""
    return pixels_h // 16, pixels_w // 16


def image_block_from_grid(grid_ids: np.ndarray, pixels_h: int, pixels_w: int) -> List[int]:
    """[h_lat, w_lat] VQ ids -> the FlexAR image token block
    (FlexARItemProcessor.process_image, item_processor.py:109-145)."""
    h_lat, w_lat = grid_ids.shape
    assert (h_lat, w_lat) == grid_dims(pixels_h, pixels_w)
    with_eol = np.concatenate(
        [grid_ids, np.full((h_lat, 1), NEW_LINE_ID, grid_ids.dtype)], axis=1
    ).reshape(-1)
    return [
        IMAGE_START_ID,
        size_token_id(pixels_h),
        size_token_id(pixels_w),
        *with_eol.tolist(),
        IMAGE_END_ID,
    ]


def image_grid_from_block(tokens: Sequence[int]) -> np.ndarray:
    """Inverse: image token span (starting at <image_start>) -> [h, w] grid,
    the decode_image path (item_processor.py:179-211)."""
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
    return np.asarray(rows, np.int32)


def split_generation(tokens: Sequence[int]):
    """Split generated ids into ('text', [ids]) and ('image', [ids]) spans —
    the decode_ids split of inference_solver.py:356-403."""
    spans, cur, mode = [], [], "text"
    it = iter(range(len(tokens)))
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
    and unit-testable."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def t2i_prompt_ids(self, caption: str, pixels: int = 768) -> List[int]:
        text = conversation_prompt([[t2i_question(caption, pixels, pixels), None]])
        return list(self.tokenizer.encode(text))

    def decode_images(self, tokens: Sequence[int]) -> List[np.ndarray]:
        return [
            image_grid_from_block(span)
            for kind, span in split_generation(tokens)
            if kind == "image"
        ]
