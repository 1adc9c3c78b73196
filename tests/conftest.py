"""Test environment: force CPU with 8 virtual devices so sharding/pjit tests
run without TPU hardware.

The container's sitecustomize re-exports JAX_PLATFORMS=axon (the TPU tunnel)
at interpreter start, so the env var alone is not enough — the platform is
re-pinned via jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402

_ORACLE_FILES = (
    "_vs_reference", "test_port_parity", "test_vq.py", "test_emu3_vq",
    "test_vq_train", "test_emu3_tokenizer", "test_vocab_translation",
)
# these additionally import the reference repo itself (read-only oracle)
_NEEDS_REFERENCE = ("_vs_reference", "test_emu3_tokenizer", "test_vocab_translation")


def pytest_collection_modifyitems(config, items):
    """Auto-mark reference/torch oracle parity tests so day-to-day iteration
    can skip them: `pytest -m "not oracle"` (~half the suite wall time).
    Tests importing the reference checkout skip cleanly when it is absent
    (e.g. public CI)."""
    have_ref = os.path.isdir("/root/reference")
    for item in items:
        path = str(item.fspath)
        if any(k in path for k in _ORACLE_FILES):
            item.add_marker(pytest.mark.oracle)
        if not have_ref and any(k in path for k in _NEEDS_REFERENCE):
            item.add_marker(
                pytest.mark.skip(reason="reference checkout not present")
            )
