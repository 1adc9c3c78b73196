"""Lumina-mGPT image-to-image / freeform SJD generation — the
demo_image2image.py / demo_freeform.py capability of the reference
(lumina_mgpt/demos/, inference_solver.generate(images=[...]) :299-353):
the prompt carries <|image|> placeholders; each is VQ-encoded, permuted into
the LM's BPE image vocabulary, and spliced as a FlexAR block.

Usage (with checkpoints):
  python examples/generate_image2image.py \
      --ckpt-dir ckpts/lumina_mgpt_768 --vq-ckpt ckpts/.../vqgan.ckpt \
      --image input.png --prompt "Redraw <|image|> as an oil painting" \
      --target-size 768 --out out.png

Without --ckpt-dir the pipeline runs with random weights and a hash
tokenizer: the full path (pixel VQ-encode, vocab translation, prompt splice,
SJD decode, grammar, VQ detokenization) executes for real.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


class HashTokenizer:
    """Structure-only text stand-in for random-weight runs (no get_vocab, so
    the loader falls back to the identity image-vocab mapping)."""

    def encode(self, text):
        h = abs(hash(text))
        return [(h >> (4 * i)) % 4000 + 9000 for i in range(min(12, max(4, len(text) // 8)))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="Redraw <|image|> with vivid colors")
    ap.add_argument("--image", default=None, help="input image path; random noise if absent")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--target-size", type=int, default=512)
    ap.add_argument("--input-size", type=int, default=256,
                    help="input image is resized to this (multiple of 32)")
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--quantize", nargs="?", const="8", default=None,
                    choices=["4", "8"],
                    help="quantized weight serving: 8 = int8 W8A16, "
                         "4 = int4 W4A16")
    ap.add_argument("--out", default="lumina_i2i.png")
    args = ap.parse_args()

    from sjd_tpu.loader import load_lumina_mgpt

    if args.tokenizer_dir:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_dir)
    else:
        tokenizer = HashTokenizer()

    model = load_lumina_mgpt(
        args.ckpt_dir,
        args.vq_ckpt,
        target_size=args.target_size,
        window=args.window,
        guidance_scale=args.cfg,
        seed=args.seed,
        tokenizer=tokenizer,
        quantize=int(args.quantize) if args.quantize else False,
    )

    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize(
            (args.input_size, args.input_size)
        )
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
    else:
        rs = np.random.RandomState(args.seed)
        arr = rs.rand(args.input_size, args.input_size, 3).astype(np.float32) * 2 - 1

    t0 = time.time()
    image = model.extras["sample_i2i_fn"](args.prompt, [arr], rng_seed=args.seed)
    print(f"Time elapsed: {time.time() - t0:.2f}s")
    image.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
