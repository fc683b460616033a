"""Cold-start mechanism probe (VERDICT r4 #5): why do fresh processes re-pay
remote compiles through the axon tunnel, and can AOT executable
serialization sidestep them?

Subject program: the 1.3B Wan DiT forward at the bench token count — big
enough that a compile is unmistakable (~30-60 s through the tunnel), small
enough to iterate.

Modes (run as separate processes; the whole point is cross-process behavior):

  python tools/coldstart_probe.py cache        # compile w/ persistent cache,
                                               # print timing + cache stats
  python tools/coldstart_probe.py aot-save     # lower+compile, serialize the
                                               # EXECUTABLE to /tmp/aot_dit.bin
  python tools/coldstart_probe.py aot-load     # deserialize_and_load + run

`cache` twice in a row (fresh processes) measures whether the JAX persistent
compilation cache actually works across processes on this backend;
JAX_EXPLAIN_CACHE_MISSES surfaces the reason when it does not.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

CACHE_DIR = "/tmp/jax_cache_probe"
AOT_PATH = "/tmp/aot_dit.bin"


def build():
    from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig
    cfg = WanDiTConfig.wan_1_3b(attn_quant="qk", quant_linear=True,
                                residual_dtype=jnp.bfloat16)
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 24, 60, 104, cfg.in_channels), jnp.bfloat16)
    buf = jnp.zeros((1, 24, 60, 104, cfg.buffer_channels), jnp.bfloat16)
    txt = jnp.zeros((1, 512, cfg.text_dim), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(rng, lat, t, txt, buf)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    jax.device_get(jax.tree.leaves(params)[0].ravel()[0])
    print(f"[probe] init: {time.perf_counter()-t0:.1f}s", flush=True)
    fwd = lambda p, x: model.apply(p, x, t, txt, buf)
    return fwd, params, lat


def fence():
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])


def mode_cache():
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass
    fwd, params, lat = build()
    f = jax.jit(fwd)
    t0 = time.perf_counter()
    f(params, lat)
    fence()
    print(f"[probe] first call (compile or cache hit): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    f(params, lat)
    fence()
    print(f"[probe] steady call: {time.perf_counter()-t0:.2f}s", flush=True)
    entries = list(Path(CACHE_DIR).glob("*")) if Path(CACHE_DIR).exists() \
        else []
    print(f"[probe] cache dir {CACHE_DIR}: {len(entries)} entries, "
          f"{sum(e.stat().st_size for e in entries)/1e6:.1f} MB", flush=True)


def mode_aot_save():
    fwd, params, lat = build()
    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(params, lat)
    print(f"[probe] lower: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"[probe] compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    try:
        from jax.experimental.serialize_executable import serialize
        import pickle
        payload = serialize(compiled)
        Path(AOT_PATH).write_bytes(pickle.dumps(payload))
        print(f"[probe] serialized executable: "
              f"{Path(AOT_PATH).stat().st_size/1e6:.1f} MB in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"[probe] executable serialization UNSUPPORTED: {e!r}",
              flush=True)
        return
    # sanity: the compiled object still runs
    t0 = time.perf_counter()
    compiled(params, lat)
    fence()
    print(f"[probe] compiled run: {time.perf_counter()-t0:.2f}s", flush=True)


def mode_aot_load():
    fwd, params, lat = build()
    import pickle
    t0 = time.perf_counter()
    from jax.experimental.serialize_executable import deserialize_and_load
    payload = pickle.loads(Path(AOT_PATH).read_bytes())
    compiled = deserialize_and_load(*payload) \
        if isinstance(payload, tuple) else deserialize_and_load(payload)
    print(f"[probe] deserialize_and_load: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    compiled(params, lat)
    fence()
    print(f"[probe] first AOT run: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    compiled(params, lat)
    fence()
    print(f"[probe] steady AOT run: {time.perf_counter()-t0:.2f}s",
          flush=True)


if __name__ == "__main__":
    {"cache": mode_cache, "aot-save": mode_aot_save,
     "aot-load": mode_aot_load}[sys.argv[1]]()
