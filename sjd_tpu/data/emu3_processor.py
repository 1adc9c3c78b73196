"""Emu3 prompt building and output parsing (layer L1).

Token-level re-implementation of Emu3Processor
(emu3/mllm/processing_emu3.py:81-225): generation-mode prompts are
  bos + text_ids + <|image start|> + ids("{H}*{W}") + <|image token|>
and decoding extracts the visual-token grid between the image header and
<image end>, splitting rows on <|extra_200|>(eol).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..models.emu3 import (
    BOI_ID,
    BOS_ID,
    EOF_ID,
    EOI_ID,
    EOL_ID,
    EOS_ID,
    IMG_ID,
    PAD_ID,
    VISUAL_END,
    VISUAL_START,
)


def calculate_generate_size(ratio: str, image_area: int, spatial_factor: int = 8):
    """'{W}:{H}' ratio + pixel area -> latent (h, w), matching the reference
    formula exactly (processing_emu3.py:246-253): one shared scale factor,
    per-dimension ROUND (a floor-twice variant produced off-by-one grids for
    non-square ratios, e.g. 16:9 at 518400 px gave (67,120) vs (68,120))."""
    w_r, h_r = map(int, ratio.split(":"))
    target = math.sqrt(image_area / (w_r * h_r))
    return (
        int(round(h_r * target / spatial_factor)),
        int(round(w_r * target / spatial_factor)),
    )


def build_gen_prompt(
    text_ids: Sequence[int],
    h: int,
    w: int,
    tokenize: Callable[[str], Sequence[int]],
) -> List[int]:
    """Prompt ids for image generation (processing_emu3.py:168-181).
    `tokenize` encodes the "{H}*{W}" size string with the Emu3 text
    tokenizer."""
    return [BOS_ID, *text_ids, BOI_ID, *tokenize(f"{h}*{w}"), IMG_ID]


# Emu3Processor chat template for understanding mode (processing_emu3.py:66)
CHAT_PRE = "You are a helpful assistant. USER: "
CHAT_POST = ". ASSISTANT:"


def image_ids_from_grid(
    grid: np.ndarray, *, eol_id: int = EOL_ID, visual_start: int = VISUAL_START
) -> List[int]:
    """[h, w] codebook ids -> visual-token ids with <eol> after every row
    (to_imgstr joins rows with eol and one more eol is appended,
    processing_emu3.py:157-166)."""
    out: List[int] = []
    for row in np.asarray(grid, np.int64):
        out.extend(int(c) + visual_start for c in row)
        out.append(eol_id)
    return out


def build_understanding_prompt(
    text: str,
    grid: np.ndarray,  # [h, w] VQ codebook ids of the input image
    tokenize: Callable[[str], Sequence[int]],
    *,
    special: Optional[dict] = None,  # override ids (tests with toy vocabs)
) -> List[int]:
    """Prompt ids for image understanding — mode='U' of the reference
    processor (processing_emu3.py:152-175): bos + chat prefix + <boi> +
    "{H}*{W}" + <img> + visual tokens (eol per row) + <eof> <eoi> + text +
    ". ASSISTANT:". Pieces are tokenized separately only across special-token
    boundaries (atomic in the BPE), so ids match whole-string tokenization.
    """
    s = special or dict(
        bos=BOS_ID, boi=BOI_ID, img=IMG_ID, eol=EOL_ID, eof=EOF_ID,
        eoi=EOI_ID, visual_start=VISUAL_START,
    )
    h, w = grid.shape
    return [
        s["bos"],
        *tokenize(CHAT_PRE),
        s["boi"],
        *tokenize(f"{h}*{w}"),
        s["img"],
        *image_ids_from_grid(grid, eol_id=s["eol"], visual_start=s["visual_start"]),
        s["eof"],
        s["eoi"],
        *tokenize(text + CHAT_POST),
    ]


def visual_id_to_codebook(tok: int) -> int:
    return tok - VISUAL_START


def codebook_to_visual_id(code: int) -> int:
    return code + VISUAL_START


def extract_image_grid(tokens: Sequence[int]) -> np.ndarray:
    """Generated ids -> [h, w] codebook-index grid (the regex split of
    processing_emu3.py:202-225 without the string round-trip)."""
    toks = list(tokens)
    # start after the <|image token|> marker if present
    if IMG_ID in toks:
        toks = toks[toks.index(IMG_ID) + 1 :]
    rows, cur = [], []
    for t in toks:
        if t == EOL_ID:
            rows.append(cur)
            cur = []
        elif t in (EOF_ID, EOI_ID, EOS_ID, PAD_ID):
            break
        elif VISUAL_START <= t <= VISUAL_END:
            cur.append(t - VISUAL_START)
        else:  # stray text token terminates the image
            break
    assert rows, "no image rows found"
    # keep rows of the MODAL width: anchoring on the first row silently
    # discarded every full-width row whenever row 0 was truncated/glitched
    from collections import Counter

    w, n_w = Counter(len(r) for r in rows).most_common(1)[0]
    kept = [r for r in rows if len(r) == w]
    if len(kept) < len(rows):
        import warnings

        warnings.warn(
            f"extract_image_grid: dropped {len(rows) - len(kept)} of "
            f"{len(rows)} rows with width != {w} (malformed generation)"
        )
    return np.asarray(kept, np.int32)
