from infinicube_tpu.nn.sparse import (  # noqa: F401
    SparseConv3d, GroupNormSparse, SparseResBlock, sparse_attention,
)
