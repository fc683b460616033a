"""AOT executable warm path: serialize compiled XLA executables to disk and
reload them in fresh processes, sidestepping the remote compile entirely.

Motivation (VERDICT r4 #5): driver/serving processes through the axon
tunnel are always cold, and the JAX persistent compilation cache proved
unreliable for the big remote-compiled programs (measured in round 4:
three consecutive e2e runs paid 542-714 s of stage-1 compiles before one
hit at 55 s). tools/coldstart_probe.py measured the two mechanisms on this
backend (v5e, 1.3B DiT forward, fresh processes):

  - persistent cache hit:  first call 5.2 s (vs 10.3 s compile+write)
  - AOT serialize/load:    payload 18.8 MB; deserialize_and_load 0.2 s;
                           first run 2.43 s == the steady call

So `jax.experimental.serialize_executable` works through the tunnel and is
deterministic where the cache is probabilistic. This module wraps it as a
drop-in warm path for the serving programs (DiT denoise chunk, VAE tiles,
GSM apply): set ``INFINICUBE_AOT_DIR`` to enable.

The on-disk key hashes the lowered HLO text, so a stale executable can
never be loaded after a code/shape/config change — any drift changes the
HLO and therefore the file name. Lowering is pure tracing (measured 1.6 s
for the 1.3B DiT — cheap); only the compile (minutes through the tunnel)
is skipped.

Reference counterpart: none — the reference re-pays torch CUDA kernel
JIT/cudnn autotuning per process and relies on driver caches
(/root/reference/infinicube/videogen/inference.py loads weights per run).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path

import jax

__all__ = ["aot_dir", "cached_compile"]


def aot_dir() -> Path | None:
    """The AOT executable cache directory, or None when disabled."""
    d = os.environ.get("INFINICUBE_AOT_DIR")
    return Path(d) if d else None


def cached_compile(jitted, *args, tag: str = "fn", directory=None,
                   **kwargs):
    """Compile ``jitted`` (a jax.jit-wrapped callable) for ``args``/
    ``kwargs``, loading a serialized executable when one matches.

    Returns a ``Compiled`` object (call it with the same tree structure /
    shapes). Falls back to plain ``.lower().compile()`` when the directory
    is unset or serialization is unsupported; corrupt or incompatible cache
    files are ignored and overwritten.
    """
    d = Path(directory) if directory is not None else aot_dir()
    lowered = jitted.lower(*args, **kwargs)
    # Serialized single-device executables mis-load on multi-device
    # backends (deserialize_and_load produces an execute_sharded call that
    # expects one shard per device — measured on the 8-virtual-device CPU
    # mesh). The serving processes this targets are single-chip; disable
    # the disk path elsewhere.
    if d is None or len(jax.devices()) != 1:
        return lowered.compile()
    key = hashlib.sha256(
        lowered.as_text().encode()).hexdigest()[:24]
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{tag}-{key}.aotx"
    if path.exists():
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load)
            payload = pickle.loads(path.read_bytes())
            return (deserialize_and_load(*payload)
                    if isinstance(payload, tuple)
                    else deserialize_and_load(payload))
        except Exception:
            pass  # stale/incompatible — recompile below and overwrite
    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize
        path.write_bytes(pickle.dumps(serialize(compiled)))
    except Exception:
        pass  # serialization unsupported on this backend — still compiled
    return compiled
