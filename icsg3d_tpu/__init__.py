"""icsg3d-tpu: a TPU-native JAX/Flax framework for 3D inorganic crystal structure
generation and property prediction.

Built from scratch with the capabilities of the reference pipeline (by256/icsg3d):

- a conditional deep-feature-consistent VAE over voxelized electron-density grids
  (reference: vae/lattice_vae.py),
- a 3D U-Net species segmenter doubling as the VAE's perceptual network
  (reference: unet/unet.py),
- a CGCNN crystal-graph property regressor (reference: cgcnn/cgcnn.py),
- on-device Gaussian voxelization of crystal structures (reference:
  create_matrices.py + utils.py, which used an MPI-parallel host loop),
- watershed atom extraction, end-to-end generation, and evaluation apps.

Everything on the compute path is JAX/XLA (with Pallas TPU kernels for hot ops);
parallelism is expressed over `jax.sharding.Mesh` (data parallelism + spatial
sharding with halo exchange), not MPI.
"""

from icsg3d_tpu import config

__version__ = "0.1.0"

__all__ = ["config", "__version__"]
