"""AOT executable warm path (utils/aot.py; VERDICT r4 #5).

On-chip measurements (tools/coldstart_probe.py, v5e, 1.3B DiT forward):
serialize 18.8 MB, deserialize_and_load 0.2 s, first AOT run == steady
run. This test exercises the mechanism portably: round-trip when the
backend supports serialization, graceful fallback when not."""

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.utils.aot import cached_compile


def test_cached_compile_roundtrip(tmp_path):
    @jax.jit
    def f(a, b):
        return a @ b + 1.0

    x = jnp.ones((8, 8)), jnp.ones((8, 8))
    single = len(jax.devices()) == 1
    c1 = cached_compile(f, *x, tag="t", directory=tmp_path)
    out1 = np.asarray(c1(*x))
    np.testing.assert_allclose(out1, 9.0)
    files = list(tmp_path.glob("t-*.aotx"))
    if not single:
        # multi-device backends must NOT write/load the disk path (a
        # serialized single-device executable mis-loads there)
        assert not files
    # second call: loads from disk when the backend serialized, else
    # recompiles — both must produce a working executable
    c2 = cached_compile(f, *x, tag="t", directory=tmp_path)
    np.testing.assert_allclose(np.asarray(c2(*x)), 9.0)
    if files:
        # corrupt the payload: must fall back to a fresh compile
        files[0].write_bytes(b"garbage")
        c3 = cached_compile(f, *x, tag="t", directory=tmp_path)
        np.testing.assert_allclose(np.asarray(c3(*x)), 9.0)


def test_cached_compile_keys_on_hlo(tmp_path):
    @jax.jit
    def f(a):
        return a * 2.0

    @jax.jit
    def g(a):
        return a * 3.0

    x = (jnp.ones((4,)),)
    cached_compile(f, *x, tag="k", directory=tmp_path)
    cached_compile(g, *x, tag="k", directory=tmp_path)
    names = {p.name for p in tmp_path.glob("k-*.aotx")}
    # distinct HLO -> distinct files (or zero files if serialization
    # unsupported on this backend)
    assert len(names) in (0, 2)
