"""Execute (not just compile) a REAL-shape Chameleon-34B SJD decode under
TP=8 sharding.

Closes the gap between "34B TP decode compiles SPMD"
(tests/test_sharded_decode.py) and "it runs": builds the real 34B config
(48L, 8192d, 64H/8KV GQA, swin-norm —
reference configuration_chameleon.py:212 / modeling_chameleon.py:198-221,
669), shards bf16 random weights with the Megatron TP specs over an
8-device mesh, and runs a short speculative-Jacobi generation end-to-end,
checking every step executed and the grammar forced a valid grid.

On real hardware this is a v5e-8/v4-8 run; in this environment it executes
on 8 VIRTUAL CPU devices (xla_force_host_platform_device_count) — the same
SPMD program, partitioned buffers, and collectives, timeshared on the host
(~68 GB of bf16 weights; slow but REAL execution). Run:

    python examples/tp_decode_34b.py [--max-len 12] [--window 4]

`--layers N` is the cheap-repro mode: N real-WIDTH layers (8192d, 64H/8KV,
full 65536 vocab, swin-norm — every per-layer sharding identical to the
48-layer run) so the execution claim re-demonstrates in minutes on a
1-core host; the full 48-layer run takes hours there. The committed
artifacts live in ARTIFACTS/ (tp34b_2layer.json, tp34b_full.json).

Prints one JSON line with the generated span and NFE.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-len", type=int, default=12)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--layers", type=int, default=0,
                    help="cheap-repro: override the layer count (0 = the "
                    "real 48); width/heads/vocab/sharding stay 34B-real")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from sjd_tpu.core import SamplingParams
    from sjd_tpu.models import init_params
    from sjd_tpu.models.chameleon import (
        IMAGE_START_ID,
        SIZE_TOKEN_BASE,
        lumina_engine,
    )
    from sjd_tpu.parallel import decoder_param_specs, make_mesh

    model_cfg = None
    if args.layers:
        import dataclasses

        from sjd_tpu.models.chameleon import chameleon_config

        model_cfg = dataclasses.replace(
            chameleon_config("34B"), num_layers=args.layers
        )
    eng = lumina_engine(
        size="34B", target_size=512, window=args.window,
        max_len=args.max_len, kv_quant=False, guidance_scale=1.0,
        model_cfg=model_cfg,
    )
    # greedy + no CFG keeps the virtual-mesh run to one forward per step
    # at the smallest batch; the SJD acceptance path still runs in full
    eng.sampling = SamplingParams(do_cfg=False, greedy=True,
                                  image_top_k=2000, text_top_k=10)
    cfg = eng.model_cfg
    mesh = make_mesh(data=1, model=args.devices)
    specs = decoder_param_specs(cfg, tp=True, fsdp=False)
    shardings = jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, p), specs
    )

    t0 = time.time()
    with jax.set_mesh(mesh):
        params = jax.jit(
            lambda k: init_params(k, cfg), out_shardings=shardings
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        t_init = time.time() - t0

        grid = 512 // 16
        size_tok = SIZE_TOKEN_BASE + grid // 2
        prompt = jnp.asarray(
            [list(range(9000, 9008)) + [IMAGE_START_ID, size_tok, size_tok]],
            jnp.int32,
        )
        t0 = time.time()
        res = eng.generate(params, jax.random.PRNGKey(0), prompt)
        toks = np.asarray(res.tokens[0, 11 : int(res.length[0])])
        t_gen = time.time() - t0

    n_shards = len(jax.tree_util.tree_leaves(params)[3].addressable_shards)
    print(json.dumps({
        "config": (
            "Chameleon-34B 48L/8192d/64H-8KV swin-norm (real shapes)"
            if not args.layers else
            f"Chameleon-34B width, {args.layers}L cheap-repro "
            "(8192d/64H-8KV swin-norm, full vocab; per-layer sharding "
            "identical to the 48L run)"
        ),
        "tp": args.devices,
        "param_shards_per_leaf": n_shards,
        "init_s": round(t_init, 1),
        "generate_s": round(t_gen, 1),
        "nfe": int(res.nfe),
        "generated": toks.tolist(),
        "grammar_ok": bool(
            all(4 <= t <= 8195 or t in (8803, 8196) for t in toks)
        ),
    }))


if __name__ == "__main__":
    main()
