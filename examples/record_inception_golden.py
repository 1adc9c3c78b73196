"""Record the torchvision InceptionV3 golden fixture (round-5 verdict #7).

Run this ONCE on any machine that has torchvision installed (this image does
not) to pin tests/test_inception_port.py's port check to the *real*
torchvision/pytorch_fid stack instead of the in-repo torch re-implementation:

    python examples/record_inception_golden.py \
        --out inception_golden.npz --ckpt inception_weights.pt

Then in this repo's environment:

    INCEPTION_GOLDEN=inception_golden.npz INCEPTION_CKPT=inception_weights.pt \
        python -m pytest tests/test_inception_port.py -k golden

The fixture stores the pool3 activations for a seeded synthetic input plus
the sha256 of the weights file, so the test refuses to compare against
mismatched weights. Reference scoring stack being pinned:
evaluation_metrics.py:112-271 (pytorch_fid InceptionV3).
"""

from __future__ import annotations

import argparse
import hashlib


def main() -> None:
    import numpy as np
    import torch
    from torchvision.models import Inception_V3_Weights, inception_v3

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="inception_golden.npz")
    ap.add_argument("--ckpt", default="inception_weights.pt")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--fid-pools", action="store_true",
        help="record with pytorch_fid's pool modifications (requires "
        "pytorch_fid installed; default records the stock torchvision graph)")
    args = ap.parse_args()

    if args.fid_pools:
        from pytorch_fid.inception import InceptionV3

        net = InceptionV3(output_blocks=[3]).eval()

        def pool3(x):
            return net(x)[0].squeeze(-1).squeeze(-1)

        sd = net.state_dict()
        # pytorch_fid prefixes blocks; strip to torchvision names
        sd = {k.split(".", 1)[1] if k.startswith("blocks") else k: v
              for k, v in sd.items()}
    else:
        net = inception_v3(
            weights=Inception_V3_Weights.DEFAULT, transform_input=False,
            aux_logits=True,
        ).eval()
        net.fc = torch.nn.Identity()
        sd = net.state_dict()

        def pool3(x):
            return net(x)

    torch.save(sd, args.ckpt)
    with open(args.ckpt, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()

    imgs = np.random.default_rng(args.seed).uniform(
        0, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(imgs).permute(0, 3, 1, 2)
        # match pool3_features' input convention: [0,1] -> [-1,1] inside
        feats = pool3(x * 2 - 1).numpy()

    np.savez(
        args.out,
        pool3=feats,
        input_seed=args.seed,
        fid_pools=args.fid_pools,
        weights_sha256=digest,
    )
    print(f"wrote {args.out} (pool3 {feats.shape}) + {args.ckpt} "
          f"(sha256 {digest[:12]}...)")


if __name__ == "__main__":
    main()
