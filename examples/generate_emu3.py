"""Emu3-Gen SJD text-to-image — the test_emu3.py entry point."""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a portrait of young girl.")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--vq-ckpt-dir", default=None)
    ap.add_argument("--ratio", default="1:1")
    ap.add_argument("--image-area", type=int, default=720 * 720)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--image-top-k", type=int, default=2048)
    ap.add_argument("--scheme", default="speculative_jacobi")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--quantize", nargs="?", const="8", default=None,
                    choices=["4", "8"],
                    help="quantized weight serving: 8 = int8 W8A16, "
                         "4 = int4 W4A16")
    ap.add_argument("--out", default="emu3_sjd.png")
    args = ap.parse_args()

    from sjd_tpu.data.emu3_processor import calculate_generate_size
    from sjd_tpu.loader import load_emu3

    h, w = calculate_generate_size(args.ratio, args.image_area)
    print(f"latent grid {h}x{w}")
    model = load_emu3(
        args.ckpt_dir,
        args.vq_ckpt_dir,
        h=h,
        w=w,
        window=args.window,
        guidance_scale=args.cfg,
        image_top_k=args.image_top_k,
        scheme=args.scheme,
        **(
            {"quantize": int(args.quantize)} if args.quantize else {}
        ),  # emu3 defaults to int8 (8B HBM); 4 = int4 W4A16
    )
    t0 = time.time()
    image = model.sample_fn(args.prompt, rng_seed=args.seed)
    print(f"Time elapsed: {time.time() - t0:.2f}s")
    image.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
