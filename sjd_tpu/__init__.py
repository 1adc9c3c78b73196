"""sjd_tpu — TPU-native Speculative Jacobi Decoding for autoregressive T2I.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of
tyshiwo1/Accelerating-T2I-AR-with-SJD (SJD, ICLR 2025): training-free
acceleration of autoregressive text-to-image generation via multi-token
Jacobi fixed-point decoding with probabilistic speculative acceptance.

Design (vs. the PyTorch reference, see SURVEY.md):
  * ONE jit-compiled fixed-point decode loop (`sjd_tpu.core.engine`) replaces
    the reference's three per-model `_sample` overrides
    (reference: scheduler/jacobi_iteration_{lumina_mgpt,emu3,anhole}.py).
  * Static shapes everywhere: a preallocated KV buffer + per-sample length
    scalar replaces HF DynamicCache truncation
    (reference: delete_false_key_value, jacobi_iteration_lumina_mgpt.py:47-54).
  * The per-token Python acceptance loop (reference:
    SpeculativeSampler.__call__, jacobi_iteration_lumina_mgpt.py:247-315)
    becomes a vectorized accept/cumprod/resample computed on device.
  * Image grammar (end-of-line / end-of-image forcing, image-vs-text top-k)
    is a pure function of absolute position (reference:
    scheduler/logit_processor_3dim.py) — no data-dependent control flow.
"""

__version__ = "0.1.0"
