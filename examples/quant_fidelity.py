"""Quantization-fidelity report: per-layer output MSE + end-logits KL of
int8 / int4-equilibrated / int4-raw against the bf16 forward.

With checkpoints:   --ckpt-dir <dir> evaluates the real weights (the
                    checkpoint-day procedure; see README).
Without (default):  real Chameleon-7B layer shapes (4096/11008/65536) at a
                    reduced layer count (--layers, default 8 — bf16 + quant
                    variants must fit HBM together), with dominant input
                    columns injected (--outlier-scale) to reproduce the
                    weight-outlier regime real LLM checkpoints exhibit —
                    plain random weights have no outliers, making the
                    equilibration fold a trivial no-op.

Prints one JSON object. See tests/test_quant_fidelity.py for the asserted
ordering (int8 <= int4_equil < int4_raw).
"""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--outlier-scale", type=float, default=20.0)
    ap.add_argument("--outlier-cols", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from sjd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from sjd_tpu.models import init_params
    from sjd_tpu.models.chameleon import chameleon_config
    from sjd_tpu.models.quant_eval import compare_quant_variants

    cfg = chameleon_config("7B", jnp.bfloat16)
    if args.ckpt_dir:
        from sjd_tpu.loader import _load_sharded_state
        from sjd_tpu.utils.port import port_hf_llama_like

        params = port_hf_llama_like(_load_sharded_state(args.ckpt_dir), cfg)
        mode = "checkpoint"
    else:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
        rs = np.random.RandomState(args.seed + 1)
        proj = ("wq", "wk", "wv", "w_gate", "w_up", "w_down", "wo")
        dims = {"wq": cfg.hidden_size, "wk": cfg.hidden_size,
                "wv": cfg.hidden_size, "w_gate": cfg.hidden_size,
                "w_up": cfg.hidden_size, "w_down": cfg.intermediate_size,
                "wo": cfg.q_dim}
        cols = {k: rs.choice(dims[k], args.outlier_cols, replace=False)
                for k in proj}

        def make(key):
            # inject dominant input columns in-jit (no multi-GB host
            # round-trips through the device tunnel)
            p = init_params(key, cfg)
            lay = dict(p["layers"])
            for k in proj:
                mask = jnp.zeros((dims[k],), jnp.float32).at[
                    jnp.asarray(cols[k])].set(1.0)
                scale = 1.0 + (args.outlier_scale - 1.0) * mask
                lay[k] = (lay[k].astype(jnp.float32) * scale).astype(
                    jnp.bfloat16)
            return dict(p, layers=lay)

        params = jax.jit(make)(jax.random.PRNGKey(args.seed))
        jax.block_until_ready(params)
        mode = f"synthetic-outliers x{args.outlier_scale}"

    ids = jax.random.randint(
        jax.random.PRNGKey(7), (1, args.tokens), 0, cfg.vocab_size
    )
    res = compare_quant_variants(params, cfg, ids)
    print(json.dumps({
        "mode": mode,
        "config": f"{cfg.hidden_size}d/{cfg.intermediate_size}ff/"
                  f"{cfg.vocab_size}V x {cfg.num_layers}L",
        "variants": {
            k: {"kl": round(v["kl"], 6),
                "top1_agree": round(v["top1_agree"], 4),
                "rel_mse_last_layer": round(v["rel_mse_last"], 6),
                "rel_mse_per_layer": [round(x, 6) for x in v["rel_mse_per_layer"]]}
            for k, v in res.items()
        },
    }))


if __name__ == "__main__":
    main()
