"""Serialized-executable cache: warm process starts skip trace AND lowering.

The persistent XLA compilation cache (``compile_cache.py``) removes
recompilation, but its key is computed from the *lowered* program — so every
process start still pays Python tracing + jaxpr->StableHLO lowering of the
decode loop before the first cache hit. Measured on the serving graph
(ARTIFACTS/warm_start.json): a fully-warm start hit 34/34 cached programs
(compile_s 4.9) yet spent 325 s inside lowering — under remote-compile-service
congestion the supposedly-host-side phases block on I/O for minutes
(user CPU ~6 s vs wall ~5 min on the same run).

This module removes that tax structurally: the *compiled executable* is
serialized to disk (``jax.experimental.serialize_executable``) keyed on the
argument avals + an engine-config string + jax/platform versions + a hash of
the sjd_tpu sources. A warm start deserializes and loads the executable
directly — no trace, no lowering, no cache-key computation (measured 0.24 s
cross-process for a small program; a few seconds for the 7B decode loop).

The reference has no equivalent concern (PyTorch eager starts immediately);
this is the TPU-native answer to its "serving restarts are free" property.

Correctness contract: the key covers everything that determines the traced
program IN THIS REPO — argument shapes/dtypes/tree, the engine's config
reprs, and the package source hash. Custom user ``ModelFns`` whose closures
differ while every repr and aval matches are outside the key; disable with
``SJD_TPU_AOT_CACHE=0`` in that (unusual) situation.

Not every PJRT client can round-trip executables; capability is probed once
per process with a trivial program and the cache silently degrades to plain
``jax.jit`` where unsupported. The CPU backend is excluded by policy even
where its client can round-trip: CPU pays no remote-lowering tax (nothing to
save), and XLA:CPU AOT results embed host machine features — reloading one
on a different host risks SIGILL (cpu_aot_loader warns exactly this). So CPU
test runs exercise the fallback path automatically.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from typing import Any, Callable, Optional

_LOCK = threading.Lock()
_SOURCE_HASH: Optional[str] = None
_CAPABLE: Optional[bool] = None

# process-global accounting, surfaced in bench artifacts: deserialize+load
# of a persisted executable is the one remaining warm-start cost (the 7B
# decode loop serializes to ~50 MB; loading it through the axon tunnel is
# tens of seconds — still 3-10x cheaper and, unlike lowering, CONSTANT).
STATS = {"loads": 0, "load_s": 0.0, "aot_compiles": 0, "saves": 0}


def cache_dir() -> Optional[str]:
    """Resolve the executable-cache directory (``<xla cache dir>/aot``).

    ``SJD_TPU_AOT_CACHE=0`` disables persistence; the env var can also name
    an explicit directory. Returns None when disabled.
    """
    env = os.environ.get("SJD_TPU_AOT_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return None
    if env and env != "1":
        return env
    from .compile_cache import enable_persistent_cache

    base = enable_persistent_cache()
    return os.path.join(base, "aot") if base else None


def _source_hash() -> str:
    """Hash of every .py file in the sjd_tpu package — a code-version salt so
    editing the engine/model source invalidates persisted executables."""
    global _SOURCE_HASH
    with _LOCK:
        if _SOURCE_HASH is not None:
            return _SOURCE_HASH
        import sjd_tpu

        root = os.path.dirname(os.path.abspath(sjd_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for name in sorted(filenames):
                if name.endswith(".py"):
                    p = os.path.join(dirpath, name)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SOURCE_HASH = h.hexdigest()[:16]
        return _SOURCE_HASH


def _backend_capable() -> bool:
    """One-time probe: can this PJRT client round-trip a serialized
    executable? CPU is excluded by policy (memo-only) regardless of client
    support: there is no lowering tax to save there, and XLA:CPU AOT blobs
    are machine-feature-pinned — loading one on a different host can SIGILL.
    """
    global _CAPABLE
    with _LOCK:
        if _CAPABLE is not None:
            return _CAPABLE
        try:
            import jax

            if jax.default_backend() == "cpu":
                _CAPABLE = False
                return False
            import jax.numpy as jnp
            from jax.experimental import serialize_executable as se

            f = jax.jit(lambda x: x + 1)
            c = f.lower(jnp.zeros((2,), jnp.float32)).compile()
            blob = se.serialize(c)
            loaded = se.deserialize_and_load(*blob)
            loaded(jnp.zeros((2,), jnp.float32))
            _CAPABLE = True
        except Exception:
            _CAPABLE = False
        return _CAPABLE


def _leaf_sig(a: Any) -> tuple:
    shape = getattr(a, "shape", None)
    dtype = getattr(a, "dtype", None)
    if shape is None or dtype is None:
        # python scalar operand: jit traces it as a weak-typed 0-d array, so
        # only its TYPE (not value) belongs in the key
        return ("py", type(a).__name__)
    # the sharding is part of the compiled executable's contract: the same
    # avals laid out differently over a mesh must not collide
    return (
        tuple(shape),
        str(dtype),
        bool(getattr(a, "weak_type", False)),
        str(getattr(a, "sharding", None)),
    )


def _args_key(args: tuple) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    return repr((tuple(_leaf_sig(leaf) for leaf in leaves), str(treedef)))


class PersistedJit:
    """``jax.jit`` with a disk-persisted executable per argument signature.

    Call-compatible with the wrapped jit for positional-arg call sites (the
    engine's internal jits). First call per signature either loads the
    serialized executable (skipping trace+lowering entirely) or compiles
    AOT and persists it. Degrades to plain jit when the backend can't
    round-trip executables or persistence is disabled.
    """

    def __init__(
        self,
        fn: Callable,
        *,
        donate_argnums: tuple = (),
        key_fn: Optional[Callable[[], str]] = None,
        tag: str = "jit",
    ):
        import jax

        self._jit = jax.jit(fn, donate_argnums=donate_argnums)
        self._key_fn = key_fn
        self._tag = tag
        self._memo: dict = {}

    def lower(self, *args, **kwargs):
        """AOT escape hatch — delegate to the wrapped jit (used by the
        sharded-decode tests to inspect the lowered module)."""
        return self._jit.lower(*args, **kwargs)

    def _entry_path(self, args: tuple) -> Optional[str]:
        d = cache_dir()
        if d is None:
            return None
        import jax

        extra = self._key_fn() if self._key_fn is not None else ""
        key = "\x00".join(
            (
                jax.__version__,
                jax.default_backend(),
                jax.devices()[0].device_kind,
                str(jax.device_count()),
                _source_hash(),
                extra,
                _args_key(args),
            )
        )
        digest = hashlib.sha256(key.encode()).hexdigest()[:24]
        return os.path.join(d, f"{self._tag}-{digest}.aotx")

    def __call__(self, *args):
        memo_key = _args_key(args)
        hit = self._memo.get(memo_key)
        if hit is not None:
            return hit(*args)
        if not _backend_capable():
            self._memo[memo_key] = self._jit
            return self._jit(*args)

        path = self._entry_path(args)
        from jax.experimental import serialize_executable as se

        if path is not None and os.path.exists(path):
            try:
                import time

                t0 = time.time()
                with open(path, "rb") as f:
                    loaded = se.deserialize_and_load(*pickle.load(f))
                with _LOCK:
                    STATS["loads"] += 1
                    STATS["load_s"] += time.time() - t0
                self._memo[memo_key] = loaded
                return loaded(*args)
            except Exception:
                pass  # stale/corrupt entry: fall through to recompile

        compiled = self._jit.lower(*args).compile()
        with _LOCK:
            STATS["aot_compiles"] += 1
        if path is not None:
            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                blob = pickle.dumps(se.serialize(compiled))
                fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
                with os.fdopen(fd, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)  # atomic vs concurrent starts
                with _LOCK:
                    STATS["saves"] += 1
            except Exception:
                pass  # persistence is best-effort; the compile still serves
        self._memo[memo_key] = compiled
        return compiled(*args)


def persisted_jit(
    fn: Callable,
    *,
    donate_argnums: tuple = (),
    key_fn: Optional[Callable[[], str]] = None,
    tag: str = "jit",
) -> PersistedJit:
    return PersistedJit(
        fn, donate_argnums=donate_argnums, key_fn=key_fn, tag=tag
    )
