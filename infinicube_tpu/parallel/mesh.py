"""Device mesh + sharding helpers — the framework's parallelism substrate.

Replaces the reference's distributed stack (SURVEY.md §2.2 "Parallelism"):
PyTorch-Lightning DDP + NCCL all-reduce (train.py:279-291), per-rank batch
division (base_model.py:586) and shard-by-rank input lists (waymo_wds.py:249)
become a single global ``jax.sharding.Mesh`` with axes:

- ``data``  — data parallelism (DP): batches sharded, gradients psum'd by XLA.
- ``model`` — tensor parallelism (TP): Wan-DiT attention heads / FFN sharded
  over ICI (a NEW capability vs the reference, which has no TP/SP).
- ``seq``   — sequence parallelism (SP) for long-video DiT attention.

The mesh is the only place device topology appears; everything else annotates
shardings with ``NamedSharding``/``PartitionSpec`` and lets XLA insert the
collectives (psum / all-gather / reduce-scatter over ICI)."""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1     # -1 = all remaining devices
    model: int = 1
    seq: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model, seq = cfg.model, cfg.seq
    data = cfg.data if cfg.data > 0 else n // (model * seq)
    assert data * model * seq == n, \
        f"mesh {data}x{model}x{seq} != {n} devices"
    arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, axis_names=("data", "model", "seq"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading dim sharded over ``data``.
    Leaves whose leading dim does not divide the data axis (or scalars) are
    replicated instead."""
    sh = data_parallel_sharding(mesh)
    rep = replicate(mesh)
    n = mesh.shape["data"]

    def put(x):
        divisible = hasattr(x, "shape") and x.ndim > 0 and \
            x.shape[0] % n == 0
        return jax.device_put(x, sh if divisible else rep)

    return jax.tree.map(put, batch)


def shard_params_replicated(mesh: Mesh, params):
    rep = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)
