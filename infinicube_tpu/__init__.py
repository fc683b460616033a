"""infinicube_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for unbounded,
controllable, dynamic 3D driving-scene generation.

Re-designed from scratch with the capabilities of nv-tlabs/InfiniCube
(reference mounted at /root/reference):

- stage 1: sparse-voxel latent diffusion (VAE + dense/sparse 3D UNet denoiser)
  conditioned on HD-map polylines and 3D boxes, chunk-extrapolated with
  SDEdit-style overlap into an unbounded semantic voxel world.
- stage 2: guidance-buffer raycasting (semantic / depth / instance / coordinate
  buffers) + a buffer-conditioned Wan2.1-style DiT video model.
- stage 3: feed-forward 3D Gaussian Splatting scene reconstruction (dual
  voxel/pixel branch + learned sky), static background + dynamic objects.

The compute path is pure JAX (XLA + Pallas kernels); parallelism is expressed
with `jax.sharding` over a device mesh (data-parallel training, tensor/sequence
sharded DiT inference). The sparse-voxel core is a capacity-padded sorted-key
grid (`infinicube_tpu.grid`) replacing fVDB; raycasting is a vectorized DDA
(`infinicube_tpu.ops.raycast`) replacing fvdb ray ops; Gaussian splatting is a
tile-based JAX/Pallas rasterizer (`infinicube_tpu.ops.gsplat`) replacing the
CUDA gsplat wheel.
"""

__version__ = "0.1.0"

from infinicube_tpu.grid.grid import Grid  # noqa: F401
