"""Ring attention: sequence-parallel exact attention over the mesh ``seq``
axis.

A NEW capability vs the reference (SURVEY.md §5 long-context: the reference
caps video at 93 frames and offloads to CPU; here token sequences shard over
ICI and attention runs as a ring): each device holds its local Q/K/V shard,
K/V blocks rotate around the ring with ``jax.lax.ppermute`` while a running
online-softmax (flash-style max/sum accumulators) folds in each block — exact
attention, memory O(N/devices), bandwidth-optimal on a ring ICI topology.

Built on shard_map so XLA schedules the collective-permute against the block
matmuls; works on any backend (tested on the CPU mesh)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _block_attend(q, k, v, scale):
    """q [Nq, h, d]; k/v [Nk, h, d] -> (out_unnorm, row_max, row_sum)."""
    logits = jnp.einsum("qhd,khd->hqk", q, k).astype(jnp.float32) * scale
    m = jnp.max(logits, axis=-1)                       # [h, Nq]
    p = jnp.exp(logits - m[..., None])
    s = jnp.sum(p, axis=-1)                            # [h, Nq]
    o = jnp.einsum("hqk,khd->qhd", p.astype(v.dtype), v)
    return o, m, s


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh | None = None,
                   axis: str = "seq") -> jnp.ndarray:
    """q/k/v f32[B, N, h, d] sharded over N on ``axis``. Exact softmax
    attention; returns [B, N, h, d] with the same sharding. With
    ``mesh=None`` the ambient mesh (jax.set_mesh / Mesh context) is used —
    how the Wan DiT invokes it under sequence parallelism."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))

    def local(qb, kb, vb):
        # qb/kb/vb: [B, N_local, h, d] on this device
        n_dev = jax.lax.psum(1, axis)

        def one_batch(qq, kk, vv):
            o0, m0, s0 = _block_attend(qq, kk, vv, scale)

            def body(i, carry):
                o, m, s, kr, vr = carry
                kr = jax.lax.ppermute(
                    kr, axis, [(j, (j + 1) % n_dev) for j in range(n_dev)])
                vr = jax.lax.ppermute(
                    vr, axis, [(j, (j + 1) % n_dev) for j in range(n_dev)])
                ob, mb, sb = _block_attend(qq, kr, vr, scale)
                m_new = jnp.maximum(m, mb)
                c1 = jnp.exp(m - m_new)
                c2 = jnp.exp(mb - m_new)
                o = o * c1.transpose(1, 0)[..., None].astype(o.dtype) + \
                    ob * c2.transpose(1, 0)[..., None].astype(o.dtype)
                s = s * c1 + sb * c2
                return o, m_new, s, kr, vr

            o, m, s, _, _ = jax.lax.fori_loop(
                1, n_dev, body, (o0, m0, s0, kk, vv))
            return o / s.transpose(1, 0)[..., None].astype(o.dtype)

        return jax.vmap(one_batch)(qb, kb, vb)

    spec = P(None, axis, None, None)
    kw = {} if mesh is None else {"mesh": mesh}
    fn = shard_map(local, in_specs=(spec, spec, spec), out_specs=spec, **kw)
    return fn(q, k, v)
