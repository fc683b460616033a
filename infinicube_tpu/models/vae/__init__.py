from infinicube_tpu.models.vae.sunet import (  # noqa: F401
    SparseVAEConfig, SparseStructureVAE, build_hash_tree,
)
