import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infinicube_tpu.ops.ring_attention import ring_attention


def reference_attention(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    a = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def test_ring_attention_matches_full():
    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs).reshape(1, 8), axis_names=("data", "seq"))
    rng = jax.random.PRNGKey(0)
    B, N, h, d = 2, 64, 4, 16
    q = jax.random.normal(rng, (B, N, h, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, N, h, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, N, h, d))
    ref = reference_attention(q, k, v)
    sh = NamedSharding(mesh, P(None, "seq"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = ring_attention(qs, ks, vs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # output keeps the sequence sharding
    assert out.sharding.spec == P(None, "seq", None, None)


def test_ring_attention_gradients():
    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs).reshape(1, 4), axis_names=("data", "seq"))
    rng = jax.random.PRNGKey(3)
    B, N, h, d = 1, 16, 2, 8
    q = jax.random.normal(rng, (B, N, h, d))

    def loss_ring(x):
        return jnp.sum(ring_attention(x, x, x, mesh) ** 2)

    def loss_ref(x):
        return jnp.sum(reference_attention(x, x, x) ** 2)

    g_ring = jax.grad(loss_ring)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               atol=5e-4)
