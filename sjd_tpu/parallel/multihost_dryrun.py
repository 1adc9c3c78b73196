"""Two-process DCN dryrun (VERDICT r3 #8): exercise parallel/dist.py's
jax.distributed.initialize path for REAL — two local processes (CPU
backend, 4 virtual devices each) form one 8-device global mesh, run a tiny
FSDP train step and a TP SJD decode over it, and assert cross-host
agreement. This is the one distributed mode the single-process virtual-mesh
tests cannot cover (the reference's analogue: torchrun/SLURM NCCL init,
xllmx/util/dist.py:33-85).

Run directly:   python -m sjd_tpu.parallel.multihost_dryrun
Worker mode:    python -m sjd_tpu.parallel.multihost_dryrun --rank R \
                    --nprocs N --port P --outdir D
"""

from __future__ import annotations

import json
import os
import sys


def _worker(rank: int, nprocs: int, port: int, outdir: str) -> None:
    # env must be pinned before ANY jax backend init
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from sjd_tpu.parallel.dist import (
        all_reduce_mean,
        barrier,
        init_distributed,
    )

    info = init_distributed(f"localhost:{port}", nprocs, rank)
    assert info["process_count"] == nprocs, info
    assert info["global_devices"] == 4 * nprocs, info

    from sjd_tpu.models import DecoderConfig
    from sjd_tpu.parallel import TrainConfig, make_mesh, make_train_step

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=8, dtype=jnp.float32,
        max_position_embeddings=64,
    )
    n_dev = 4 * nprocs
    mesh = make_mesh(data=n_dev, model=1)
    init_fn, step_fn = make_train_step(
        mesh, cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1,
                               total_steps=4),
        tp=False, fsdp=True,
    )
    rs = np.random.RandomState(0)  # identical batch on every process
    B, T = n_dev, 12
    ids_np = rs.randint(0, 64, size=(B, T)).astype(np.int32)
    labels_np = np.where(np.arange(T)[None, :] < 2, -100, ids_np)
    mask_np = np.ones((B, T), bool)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def global_batch(arr):
        # each process contributes its local rows of the 'data'-sharded batch
        sh = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(
            sh, arr[rank * (B // nprocs): (rank + 1) * (B // nprocs)]
        )

    with jax.set_mesh(mesh):
        state = init_fn(jax.random.PRNGKey(0))
        losses = []
        for _ in range(2):
            state, metrics = step_fn(
                state, global_batch(ids_np), global_batch(labels_np),
                global_batch(mask_np),
            )
            losses.append(float(metrics["loss"]))
    # FSDP gradients are global: the loss must agree bit-for-bit across
    # processes (each holds replicas of the same global scalar), and
    # all_reduce_mean of an identical scalar is the scalar
    mean0 = all_reduce_mean(losses[-1])
    barrier("dryrun-train")

    # ---- TP SJD decode over the 2-host mesh ------------------------------
    from sjd_tpu.core import (
        EngineConfig,
        GrammarSpec,
        SamplingParams,
        SJDEngine,
    )
    from sjd_tpu.models import decoder_model_fns, init_params
    from sjd_tpu.parallel import apply_named_sharding, decoder_param_specs

    tp_mesh = make_mesh(data=1, model=n_dev)
    eng = SJDEngine(
        decoder_model_fns(cfg, max_positions=64),
        EngineConfig(window=4, scheme="speculative_jacobi", max_len=16,
                     cfg_mode="none"),
        GrammarSpec(kind="none", image_vocab_start=0, image_vocab_end=63),
        SamplingParams(do_cfg=False, greedy=True, image_top_k=64,
                       text_top_k=64),
    )
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(3))
    specs = decoder_param_specs(cfg, tp=True, fsdp=False)
    sharded = apply_named_sharding(tp_mesh, params, specs)
    with jax.set_mesh(tp_mesh):
        res = eng.generate(sharded, jax.random.PRNGKey(0),
                           jnp.asarray([[1, 2, 3, 4]], jnp.int32))
    # TP outputs are replicated across the mesh, so each process reads its
    # local copy directly; the parent asserts the copies agree bit-for-bit
    toks = np.asarray(jax.device_get(res.tokens))[0, : 4 + 16]
    barrier("dryrun-decode")

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({
            "rank": rank,
            "process_count": info["process_count"],
            "global_devices": info["global_devices"],
            "losses": losses,
            "loss_mean": mean0,
            "tokens": [int(t) for t in toks.reshape(-1)[: 4 + 16]],
        }, f)


def dryrun_multihost(nprocs: int = 2, timeout: float = 600.0) -> dict:
    """Spawn ``nprocs`` worker processes, wait, and assert cross-host
    agreement (identical train losses and identical TP-decoded tokens).
    Returns the rank-0 report."""
    import subprocess
    import tempfile

    outdir = tempfile.mkdtemp(prefix="mh_dryrun_")
    port = 12000 + (os.getpid() % 2000)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "sjd_tpu.parallel.multihost_dryrun",
             "--rank", str(r), "--nprocs", str(nprocs), "--port", str(port),
             "--outdir", outdir],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for r in range(nprocs)
    ]
    try:
        for p in procs:
            rc = p.wait(timeout=timeout)
            assert rc == 0, f"worker exited {rc}"
    finally:
        for p in procs:  # don't leak workers on a timeout/assert
            if p.poll() is None:
                p.kill()
    reports = []
    for r in range(nprocs):
        with open(os.path.join(outdir, f"rank{r}.json")) as f:
            reports.append(json.load(f))
    for rep in reports[1:]:
        assert rep["losses"] == reports[0]["losses"], (
            "FSDP train losses diverged across processes", reports)
        assert rep["tokens"] == reports[0]["tokens"], (
            "TP decode diverged across processes", reports)
    print("dryrun_multihost ok:", json.dumps(reports[0]))
    return reports[0]


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=12345)
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args()
    if args.rank is None:
        dryrun_multihost(args.nprocs)
    else:
        _worker(args.rank, args.nprocs, args.port, args.outdir)
