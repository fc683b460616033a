from infinicube_tpu.ops import raycast, segment  # noqa: F401
