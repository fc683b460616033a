"""Tracing / profiling / timing utilities.

Mirror of the reference's vendored pycg exp tooling
(/root/reference/infinicube/voxelgen/utils/exp.py): ``pt_profile_named``
torch-profiler context gated by the PT_PROFILE env (:588-645) becomes a
``jax.profiler`` trace gated by JAX_PROFILE; ``@mem_profile`` (:648-748)
becomes device-memory-stats deltas gated by MEM_PROFILE; wall-clock
``Timer``/``TimerCollections`` (:434-533) and Average/RunningAverage meters
(:233-400) carry over directly."""

from __future__ import annotations

import contextlib
import functools
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def profile_named(name: str, logdir: str = "/tmp/jax_traces"):
    """Perfetto/TensorBoard trace of the enclosed region when JAX_PROFILE is
    set (view with tensorboard or ui.perfetto.dev)."""
    if os.environ.get("JAX_PROFILE"):
        import jax
        with jax.profiler.trace(os.path.join(logdir, name)):
            yield
    else:
        yield


def annotate(name: str):
    """Named sub-region inside an active trace (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def mem_profile(every: int = 1):
    """Decorator: log per-call device memory deltas when MEM_PROFILE is set."""
    def deco(fn):
        count = {"n": 0}

        @functools.wraps(fn)
        def wrapper(*a, **kw):
            if not os.environ.get("MEM_PROFILE"):
                return fn(*a, **kw)
            count["n"] += 1
            if count["n"] % every:
                return fn(*a, **kw)
            import jax
            dev = jax.devices()[0]
            before = (dev.memory_stats() or {}).get("bytes_in_use", 0)
            out = fn(*a, **kw)
            after = (dev.memory_stats() or {}).get("bytes_in_use", 0)
            print(f"[mem] {fn.__name__}: {(after - before) / 2 ** 20:+.1f} MiB"
                  f" (now {after / 2 ** 20:.1f} MiB)")
            return out
        return wrapper
    return deco


class Timer:
    """Wall-clock timer; on accelerators, call ``fence(x)`` on an output
    before reading to get true device time."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def reset(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @staticmethod
    def fence(x):
        import jax
        jax.block_until_ready(x)
        return x


class TimerCollection:
    """Named accumulating timers (exp.TimerCollections)."""

    def __init__(self):
        self.acc = defaultdict(float)
        self.n = defaultdict(int)
        self._open: dict[str, float] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        yield
        self.acc[name] += time.perf_counter() - t0
        self.n[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": self.acc[k], "mean_s": self.acc[k] / self.n[k],
                    "count": self.n[k]} for k in self.acc}


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, v, n: int = 1):
        self.sum += float(v) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class RunningAverageMeter:
    def __init__(self, alpha: float = 0.95):
        self.alpha = alpha
        self.val: float | None = None

    def update(self, v):
        v = float(v)
        self.val = v if self.val is None else \
            self.alpha * self.val + (1 - self.alpha) * v
