"""VQGAN tokenizer training CLI — the reference's vq_train.py entry point
(llamagen/tokenizer/tokenizer_image/vq_train.py; broken imports upstream),
TPU-native: alternating generator/discriminator jitted steps with LPIPS +
PatchGAN (sjd_tpu/models/vq/train.py:make_vqgan_train_steps).

  python examples/vq_train.py --images DIR --steps 2000 --size 128 \
      [--vq-config llamagen|llamagen8|chameleon] [--disc-start 500] \
      [--lpips-lins PATH_TO_vgg.pth] [--vgg-ckpt PATH] [--out CKPT_DIR]
  python examples/vq_train.py --synthetic --steps 20   # offline smoke

Without --lpips-lins/--vgg-ckpt the perceptual net is random-init (an
untrained-feature distance — keeps the loss shape and the smoke path
drivable offline; NOT the calibrated LPIPS metric). Checkpoints save via
orbax every --save-every steps.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _image_batches(images_dir, size, batch, rng):
    from PIL import Image

    files = [
        os.path.join(images_dir, f)
        for f in sorted(os.listdir(images_dir))
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    ]
    assert files, f"no images under {images_dir}"
    arrs = []
    for f in files:
        im = Image.open(f).convert("RGB").resize((size, size))
        arrs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    data = np.stack(arrs)
    while True:
        idx = rng.choice(len(data), batch, replace=len(data) < batch)
        yield data[idx]


def _synthetic_batches(size, batch, rng):
    while True:
        # smooth random fields (image-like statistics, not pure noise)
        x = rng.randn(batch, size // 4, size // 4, 3).astype(np.float32)
        x = np.repeat(np.repeat(x, 4, axis=1), 4, axis=2)
        yield np.tanh(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--vq-config", default="llamagen",
                    choices=["llamagen", "llamagen8", "chameleon"])
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--disc-start", type=int, default=500)
    ap.add_argument("--disc-weight", type=float, default=0.5)
    ap.add_argument("--disc-loss", default="hinge",
                    choices=["hinge", "vanilla", "non-saturating"])
    ap.add_argument("--gen-loss", default="hinge",
                    choices=["hinge", "non-saturating"])
    ap.add_argument("--perceptual-weight", type=float, default=1.0)
    ap.add_argument("--adaptive-weight", action="store_true")
    ap.add_argument("--lpips-lins", default=None, help="taming vgg.pth")
    ap.add_argument("--vgg-ckpt", default=None, help="torchvision vgg16 state_dict")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    assert args.images or args.synthetic, "--images DIR or --synthetic"

    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from sjd_tpu.models.vq import (
        CHAMELEON_VQ,
        LLAMAGEN_VQ8,
        LLAMAGEN_VQ16,
        init_lpips_params,
        init_vq_params,
        port_lpips,
    )
    from sjd_tpu.models.vq.train import VQTrainConfig, make_vqgan_train_steps

    import dataclasses

    cfg = {"llamagen": LLAMAGEN_VQ16, "llamagen8": LLAMAGEN_VQ8,
           "chameleon": CHAMELEON_VQ}[args.vq_config]
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    tcfg = VQTrainConfig(
        learning_rate=args.lr, disc_start=args.disc_start,
        disc_weight=args.disc_weight, disc_loss=args.disc_loss,
        gen_adv_loss=args.gen_loss, perceptual_weight=args.perceptual_weight,
        disc_adaptive_weight=args.adaptive_weight, recon_loss="l2",
    )

    if args.lpips_lins or args.vgg_ckpt:
        from sjd_tpu.models.vq.lpips import port_vgg16_features
        from sjd_tpu.utils.port import load_torch_checkpoint

        if args.lpips_lins:
            lpips_params = port_lpips(
                load_torch_checkpoint(args.lpips_lins),
                load_torch_checkpoint(args.vgg_ckpt) if args.vgg_ckpt else None,
            )
        else:
            # VGG backbone only: calibrated features, random (identity-ish)
            # lins — still a trained-feature distance, unlike full random init
            lpips_params = init_lpips_params(jax.random.PRNGKey(1))
            lpips_params["convs"] = port_vgg16_features(
                load_torch_checkpoint(args.vgg_ckpt)
            )
            lpips_params["calibrated"] = True
            print("vq_train: --vgg-ckpt without --lpips-lins: VGG features "
                  "ported, LPIPS lins random (pass --lpips-lins for the "
                  "calibrated taming weights)")
    else:
        lpips_params = init_lpips_params(jax.random.PRNGKey(1))
        if args.perceptual_weight:
            print("vq_train: no --vgg-ckpt/--lpips-lins — the perceptual "
                  "term uses RANDOM-init VGG features (smoke mode)")

    params = init_vq_params(jax.random.PRNGKey(args.seed), cfg)
    # PatchGAN depth must fit the image: at the reference default n_layers=3
    # anything under 32 px collapses to an EMPTY patch map (mean -> NaN).
    # 4 stride-2 halvings need size >= 64 for a non-empty k4 logit map.
    import math as _math

    from sjd_tpu.models.vq.discriminator import PatchGANConfig

    n_layers = max(1, min(3, int(_math.log2(max(args.size, 16))) - 3))
    init_fn, g_step, d_step = make_vqgan_train_steps(
        cfg, tcfg, lpips_params=lpips_params,
        disc_cfg=PatchGANConfig(n_layers=n_layers),
    )
    if n_layers < 3:
        print(f"vq_train: --size {args.size} < 64 — PatchGAN n_layers={n_layers}")
    g_opt, d_params, d_opt, ema = init_fn(params, jax.random.PRNGKey(2))

    rng = np.random.RandomState(args.seed)
    batches = (
        _image_batches(args.images, args.size, args.batch, rng)
        if args.images else _synthetic_batches(args.size, args.batch, rng)
    )

    t0 = time.time()
    for step in range(args.steps):
        pixels = jnp.asarray(next(batches))
        params, g_opt, ema, g_aux = g_step(
            params, g_opt, ema, d_params, pixels, jnp.int32(step))
        d_params, d_opt, d_aux = d_step(
            d_params, d_opt, params, pixels, jnp.int32(step))
        if step % args.log_every == 0 or step == args.steps - 1:
            print(json.dumps({
                "step": step,
                "loss": round(float(g_aux["loss"]), 4),
                "recon": round(float(g_aux["recon"]), 4),
                "perceptual": round(float(g_aux["perceptual"]), 4),
                "gan_g": round(float(g_aux["gan_g"]), 4),
                "d_loss": round(float(d_aux["d_loss"]), 4),
                "usage": round(float(g_aux["usage"]), 4),
                "img_per_s": round(
                    args.batch * (step + 1) / (time.time() - t0), 2),
            }))
        if args.out and (step + 1) % args.save_every == 0:
            from sjd_tpu.utils.checkpoints import make_manager, save

            save(make_manager(args.out), step + 1,
                 {"params": params, "ema": ema, "disc": d_params})
    if args.out:
        from sjd_tpu.utils.checkpoints import make_manager, save

        save(make_manager(args.out), args.steps,
             {"params": params, "ema": ema, "disc": d_params})


if __name__ == "__main__":
    main()
