import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.ops.attention import _einsum_attention, multi_head_attention


def ref_attn(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    a = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def test_einsum_path_matches_reference():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 64, 4, 16))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 4, 16))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (2, 32, 4, 16))
    out = multi_head_attention(q, k, v)  # CPU -> einsum path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_attn(q, k, v)),
                               atol=2e-5)


def test_cross_attention_mixed_lengths():
    # q length != kv length (the DiT text cross-attention shape)
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(rng, (1, 100, 2, 8))
    kv = jax.random.normal(jax.random.fold_in(rng, 1), (1, 7, 2, 8))
    out = multi_head_attention(q, kv, kv)
    assert out.shape == (1, 100, 2, 8)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_attn(q, kv, kv)), atol=2e-5)
