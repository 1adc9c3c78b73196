"""LlamaGen SJD image generation — the test_llamagen.py entry point.

c2i: --model-type c2i --prompt 207   (ImageNet class id)
t2i: --model-type t2i --prompt "a photo of a corgi" --t5-dir ckpts/flan-t5-xl
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="207")
    ap.add_argument("--gpt-ckpt", default=None)
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--t5-dir", default=None)
    ap.add_argument("--gpt-model", default="GPT-XL")
    ap.add_argument("--model-type", default="c2i", choices=["c2i", "t2i"])
    ap.add_argument("--latent-size", type=int, default=16)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--cfg", type=float, default=7.5)
    ap.add_argument("--image-top-k", type=int, default=1000)
    ap.add_argument("--scheme", default="speculative_jacobi")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--quantize", nargs="?", const="8", default=None,
                    choices=["4", "8"],
                    help="quantized weight serving: 8 = int8 W8A16, "
                         "4 = int4 W4A16")
    ap.add_argument("--out", default="llamagen_sjd.png")
    args = ap.parse_args()

    from sjd_tpu.loader import load_llamagen

    model = load_llamagen(
        args.gpt_ckpt,
        args.vq_ckpt,
        name=args.gpt_model,
        latent_size=args.latent_size,
        model_type=args.model_type,
        window=args.window,
        guidance_scale=args.cfg,
        image_top_k=args.image_top_k,
        scheme=args.scheme,
        t5_dir=args.t5_dir,
        quantize=int(args.quantize) if args.quantize else False,
    )
    t0 = time.time()
    image = model.sample_fn(args.prompt, rng_seed=args.seed)
    print(f"Time elapsed: {time.time() - t0:.2f}s")
    image.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
