"""Sub-byte (s4) jit-input workaround for the axon TPU tunnel.

The decode stack stores int4 weights at rest as PACKED uint8 nibbles and
unpacks to s4 INSIDE every jitted generate/resume/refill because an s4
jax.Array passed as a jit input crashes on this backend — the round-1
"Recursively calling jit" bug (PERF_NOTES "int4 weights"). That forces HBM
to hold BOTH copies (packed input + materialized s4 temp, ~6 GB for the 7B,
~8 GB for the 8B) for the duration of every call — the dominant term in the
serving slot budget (PERF_NOTES slot sweeps).

Root cause (diagnosed round 4, jax 0.9.0): the layout metadata of an s4
array produced by a TPU executable reports ``sub_byte_element_size_in_bits=0``
while a consuming executable expects the same layout with ``=4``. The
equality check in ``jax._src.array._array_shard_arg`` therefore fails, the
handler issues a relayout ``device_put`` whose own output reports 0 again,
and the dispatch recurses forever (array.py:1264). The PHYSICAL layout is
identical — only the metadata field differs — verified by exact numerics of
an s4 @ bf16 matmul through the boundary with the workaround installed.

``install_subbyte_layout_workaround()`` wraps the shard-arg handler: when a
sub-byte-dtype argument's layout differs from the executable's expected
layout ONLY in ``sub_byte_element_size_in_bits`` (with one side reporting
the buggy 0), the arg is accepted as-is instead of relayouted. Everything
else — real relayouts, resharding, every other dtype — takes the original
path unchanged. Idempotent; a no-op wherever the metadata bug is absent.

With it installed, ``persist_int4_params`` (models/transformer.py) unpacks
ONCE with the packed buffers donated, leaving the s4 arrays as the only
at-rest weight copy.
"""

from __future__ import annotations

_installed = False


def _strippable(x_layout, expected) -> bool:
    """True iff the two layouts differ ONLY in the sub-byte metadata field
    (the bug signature: one side reports 0 where a sub-byte dtype can't be).
    """
    def sub_byte(l):
        # private in jax._src.layout.Layout (repr shows it unprefixed)
        v = getattr(l, "_sub_byte_element_size_in_bits", None)
        if v is None:
            v = getattr(l, "sub_byte_element_size_in_bits", None)
        return v

    try:
        sx, se = sub_byte(x_layout), sub_byte(expected)
        return (
            sx is not None
            and se is not None
            and x_layout != expected
            and x_layout.major_to_minor == expected.major_to_minor
            and x_layout.tiling == expected.tiling
            and 0 in (sx, se)
        )
    except AttributeError:
        return False


def install_subbyte_layout_workaround() -> None:
    global _installed
    if _installed:
        return
    import jax._src.array as arr_mod
    from jax._src.interpreters import pxla

    orig = pxla.shard_arg_handlers[arr_mod.ArrayImpl]

    def patched(xs, shardings, layouts, copy_semantics):
        fixed = None
        for i, (x, l) in enumerate(zip(xs, layouts)):
            if l is None or str(x.dtype) not in ("int4", "uint4"):
                continue
            try:
                xl = x.format.layout
            except Exception:  # noqa: BLE001 — fall through to original path
                continue
            if _strippable(xl, l):
                if fixed is None:
                    fixed = list(layouts)
                fixed[i] = None  # accept the buffer as-is (layouts match
                #                  physically; only the metadata bit differs)
        return orig(xs, shardings, fixed if fixed is not None else layouts,
                    copy_semantics)

    pxla.shard_arg_handlers[arr_mod.ArrayImpl] = patched
    _installed = True
