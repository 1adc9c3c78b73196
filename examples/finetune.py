"""Fine-tuning solver CLI — the xllmx FinetuneSolverBase equivalent
(lumina_mgpt/finetune_solver.py + xllmx/solvers/finetune/finetune.py).

Wires together: finetune dataset over record JSONs, length-clustered
sampler with mid-epoch resume, the FSDP+TP sharded train step (CE + z-loss,
AdamW + cosine warmup, grad clip/accum), metric logging, and orbax
checkpoints with max-keep pruning.

Smoke run (tiny random model, synthetic data):
  python examples/finetune.py --synthetic --steps 20 --batch-size 4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta-path", default=None, help="dataset meta JSON/YAML")
    ap.add_argument("--synthetic", action="store_true",
                    help="random tiny model + synthetic batches (smoke test)")
    ap.add_argument("--model", default="tiny", choices=["tiny", "chameleon-7B"])
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--wd", type=float, default=0.1)
    ap.add_argument("--z-loss", type=float, default=1e-5)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--ckpt-dir", default="./ckpt_out")
    ap.add_argument("--save-interval", type=int, default=500)
    ap.add_argument("--max-keep", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--mask-image-logits", action="store_true",
                    help="disallow Chameleon image-token logits in the loss "
                         "(text-only finetuning; reference solver flag)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sjd_tpu.models import DecoderConfig
    from sjd_tpu.models.chameleon import chameleon_config
    from sjd_tpu.parallel import TrainConfig, make_mesh, make_train_step
    from sjd_tpu.utils import checkpoints as ckpt_lib
    from sjd_tpu.utils.logging import MetricLogger, set_logger

    logger = set_logger(os.path.join(args.ckpt_dir, "train.log")
                        if os.path.isdir(args.ckpt_dir) else None)

    if args.model == "tiny":
        cfg = DecoderConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_layers=4, num_heads=4, num_kv_heads=4, head_dim=32,
            qk_norm=True, dtype=jnp.float32, max_position_embeddings=args.max_seq_len,
        )
    else:
        cfg = chameleon_config("7B")

    n_dev = len(jax.devices())
    tp = args.tp
    mesh = make_mesh(data=n_dev // tp, model=tp)
    tcfg = TrainConfig(
        learning_rate=args.lr, weight_decay=args.wd, z_loss_weight=args.z_loss,
        grad_clip=args.grad_clip, grad_accum=args.grad_accum,
        warmup_steps=args.warmup, total_steps=args.steps,
        mask_image_logits=args.mask_image_logits,
    )
    init_fn, step_fn = make_train_step(mesh, cfg, tcfg, tp=tp > 1, fsdp=True)

    manager = ckpt_lib.make_manager(os.path.abspath(args.ckpt_dir),
                                    max_keep=args.max_keep)

    def batches(start_step: int = 0):
        if args.synthetic or not args.meta_path:
            rs = np.random.RandomState(args.seed)
            while True:
                ids = rs.randint(0, cfg.vocab_size, (args.batch_size, 64)).astype(np.int32)
                labels = ids.copy()
                labels[:, :8] = -100
                yield ids, labels, np.ones_like(ids, bool)
        else:
            from sjd_tpu.data.dataset import FinetuneDataset, pad_batch
            from sjd_tpu.data.sampler import LengthClusteredSampler

            ds = FinetuneDataset(args.meta_path)
            # per-meta types/ratios drive the sampler's group up/down-
            # sampling (they were parsed but never wired — all data was
            # silently sampled at ratio 1.0)
            sampler = LengthClusteredSampler(
                ds.lengths(), batch_size=args.batch_size,
                grad_accum=args.grad_accum, seed=args.seed,
                groups=ds.types or None, group_ratios=ds.ratios or None,
            )
            # mid-epoch resume: skip the optimizer iterations the restored
            # step already consumed (otherwise the resumed run re-trains on
            # the same batches from epoch 0)
            steps_per_epoch = max(len(sampler) // args.batch_size, 1)
            epoch = start_step // steps_per_epoch
            start_iter = start_step % steps_per_epoch
            while True:
                sampler.set_epoch(epoch, start_iter)
                start_iter = 0
                buf = []
                for idx in sampler:
                    buf.append(ds[idx])
                    if len(buf) == args.batch_size:
                        yield pad_batch(buf, max_len=args.max_seq_len)
                        buf = []
                epoch += 1

    with jax.set_mesh(mesh):
        state = init_fn(jax.random.PRNGKey(args.seed))
        if args.resume:
            try:
                abstract = jax.eval_shape(lambda: state)
                state = ckpt_lib.restore(manager, abstract)
                logger.info(f"resumed at step {int(state.step)}")
            except FileNotFoundError:
                logger.info("no checkpoint found; starting fresh")

        metrics_log = MetricLogger()
        start = int(state.step)
        gen = batches(start)
        t0 = time.time()
        for step in range(start, args.steps):
            ids, labels, mask = next(gen)
            state, metrics = step_fn(
                state, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask)
            )
            loss = float(metrics["loss"])
            if not np.isfinite(loss):  # non-finite loss kill switch
                raise RuntimeError(f"non-finite loss at step {step}: {loss}")
            metrics_log.update(loss=loss, ce=float(metrics["ce"]),
                               grad_norm=float(metrics["grad_norm"]))
            if step % args.log_every == 0:
                rate = (step - start + 1) / (time.time() - t0)
                logger.info(f"step {step} {metrics_log} ({rate:.2f} it/s)")
            if args.save_interval and (step + 1) % args.save_interval == 0:
                ckpt_lib.save(manager, step + 1, state)
                logger.info(f"saved checkpoint @ {step + 1}")

        ckpt_lib.save(manager, args.steps, state)
        logger.info(json.dumps({"final_loss": loss, "steps": args.steps}))


if __name__ == "__main__":
    main()
