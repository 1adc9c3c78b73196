"""Reconstruction evaluation for the VQ image tokenizers: images -> encode
-> decode -> reconstruction FID (+ PSNR/SSIM-lite stats) vs the originals.

The TPU rebuild of the reference's reconstruction_vq_ddp.py /val_ddp.py flow
(llamagen/tokenizer/: broken imports upstream, SURVEY.md §2.5): the rFID
that scores how much image quality the tokenizer itself destroys — an upper
bound on any generation quality through that tokenizer.

Tokenizers: chameleon (f16 VQGAN), llamagen (VQ-16, l2-norm codebook),
llamagen8 (VQ-8), emu3 (VisionVQ f8). Without --vq-ckpt the tokenizer is
random-initialized (reconstructions are VQ noise but the whole flow runs;
the JSON marks smoke=true). FID features come from InceptionV3 pool3 when
torchvision weights exist, else --smoke-extractor selects the documented
mean-pooled-pixel fallback (eval/metrics.py:make_pixel_extractor).

  python examples/recon_eval.py --images DIR [--out DIR] \
      [--tokenizer chameleon|llamagen|llamagen8|emu3] [--vq-ckpt PATH] \
      [--size 256] [--smoke-extractor]

Prints one JSON line: {"rfid": ..., "psnr_db": ..., "n": ...}.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of PNG/JPG")
    ap.add_argument("--out", default=None, help="save reconstructions here")
    ap.add_argument("--tokenizer", default="llamagen",
                    choices=["chameleon", "llamagen", "llamagen8", "emu3"])
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--size", type=int, default=256,
                    help="center-resize to this square size")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--smoke-extractor", action="store_true")
    ap.add_argument("--inception-ckpt", default=None,
                    help="torch InceptionV3 checkpoint for calibrated rFID "
                    "via the native port (sjd_tpu/eval/inception.py)")
    args = ap.parse_args()

    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from sjd_tpu.eval.metrics import (
        frechet_distance,
        load_image_dir,
        make_inception_extractor,
        make_pixel_extractor,
    )

    # --- tokenizer -------------------------------------------------------
    if args.tokenizer == "emu3":
        from sjd_tpu.models.vq.emu3_port import init_emu3_vq_params, port_emu3_vq
        from sjd_tpu.models.vq.emu3_vq import EMU3_VQ as vq_cfg
        from sjd_tpu.models.vq.emu3_vq import decode as vq_decode_grid
        from sjd_tpu.models.vq.emu3_vq import encode as vq_encode

        if args.vq_ckpt:
            from sjd_tpu.loader import _load_sharded_state

            vq_params = port_emu3_vq(_load_sharded_state(args.vq_ckpt), vq_cfg)
            smoke = False
        else:
            vq_params = init_emu3_vq_params(1, vq_cfg)
            smoke = True

        def roundtrip(px):
            ids = vq_encode(vq_params, vq_cfg, jnp.asarray(px))
            return np.asarray(vq_decode_grid(vq_params, vq_cfg, ids))
    else:
        from sjd_tpu.models.vq import (
            CHAMELEON_VQ,
            LLAMAGEN_VQ8,
            LLAMAGEN_VQ16,
            decode as vq_decode,
            encode as vq_encode,
            init_vq_params,
            port_vqgan,
        )

        vq_cfg = {"chameleon": CHAMELEON_VQ, "llamagen": LLAMAGEN_VQ16,
                  "llamagen8": LLAMAGEN_VQ8}[args.tokenizer]
        if args.vq_ckpt:
            from sjd_tpu.utils.port import load_torch_checkpoint

            style = "llamagen" if args.tokenizer.startswith("llamagen") else "chameleon"
            vq_params = port_vqgan(load_torch_checkpoint(args.vq_ckpt), vq_cfg,
                                   style=style)
            smoke = False
        else:
            vq_params = init_vq_params(jax.random.PRNGKey(0), vq_cfg)
            smoke = True
        f = vq_cfg.downsample_factor
        grid = (args.size // f, args.size // f)

        def roundtrip(px):
            ids = vq_encode(vq_params, vq_cfg, jnp.asarray(px))
            return np.asarray(
                vq_decode(vq_params, vq_cfg, ids.reshape(ids.shape[0], -1), grid)
            )

    # --- images ----------------------------------------------------------
    originals = load_image_dir(args.images, size=args.size)  # [N,H,W,3] in [-1,1]
    assert len(originals), f"no images under {args.images}"
    recons = []
    for i in range(0, len(originals), args.batch):
        recons.append(roundtrip(originals[i : i + args.batch]))
    recons = np.concatenate(recons, axis=0)[: len(originals)]
    if recons.shape[1:3] != originals.shape[1:3]:
        # emu3 returns full-res frames (recon larger: crop it); a --size not
        # divisible by the downsample factor yields a SMALLER recon (crop
        # the originals to the common grid instead of crashing in the MSE)
        h = min(recons.shape[1], originals.shape[1])
        w = min(recons.shape[2], originals.shape[2])
        recons = recons[:, :h, :w]
        originals = originals[:, :h, :w]

    if args.out:
        from PIL import Image

        os.makedirs(args.out, exist_ok=True)
        for i, r in enumerate(recons):
            arr = ((np.clip(r, -1, 1) + 1) * 127.5).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(args.out, f"{i}.png"))

    # --- metrics ---------------------------------------------------------
    if args.inception_ckpt:
        from sjd_tpu.eval.inception import make_inception_extractor_from_ckpt

        feature_fn = make_inception_extractor_from_ckpt(args.inception_ckpt)
    elif args.smoke_extractor:
        feature_fn = make_pixel_extractor()
    else:
        try:
            feature_fn = make_inception_extractor()
        except Exception:
            feature_fn = make_pixel_extractor()
            args.smoke_extractor = True
    rfid = frechet_distance(feature_fn(originals), feature_fn(recons))
    mse = np.mean((recons - originals) ** 2)
    psnr = float(10 * np.log10(4.0 / max(mse, 1e-12)))  # peak-to-peak 2.0
    print(json.dumps({
        "tokenizer": args.tokenizer,
        "n": int(len(originals)),
        "rfid": round(float(rfid), 4),
        "psnr_db": round(psnr, 2),
        "smoke_weights": smoke,
        "smoke_extractor": bool(args.smoke_extractor),
    }))


if __name__ == "__main__":
    main()
