"""Single configuration tree for the whole framework.

The reference scattered its configuration over per-script argparse flags
(train_unet.py:29-79, train_vae.py:30-84, train_cgcnn.py:29-68,
create_matrices.py:41-81) and hardcoded grid size 32 in post-processing
(watershed.py:178-180, generate.py:211-221).  Here every knob lives in one
dataclass tree; `GridSpec` owns all voxel-grid geometry so nothing downstream
hardcodes the resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Geometry of the voxel grids.

    The cell of a structure with lattice lengths (a, b, c) is padded by
    ``eps_frac`` of each length on both sides, then divided into ``d`` voxels
    per axis (reference: utils.py:98-115 for the density grid,
    utils.py:88-94 for the coordinate grid).
    """

    d: int = 32                 # voxels per axis
    eps_frac: float = 0.25      # fractional cell padding per side
    density_channels: int = 1   # electron-density channel count
    coord_channels: int = 3     # absolute-coordinate channels

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.d, self.d, self.d)

    @property
    def channels(self) -> int:
        return self.density_channels + self.coord_channels

    @property
    def input_shape(self) -> Tuple[int, int, int, int]:
        return (self.d, self.d, self.d, self.channels)

    @property
    def num_voxels(self) -> int:
        return self.d ** 3

    def voxel_sizes(self, abc):
        """Per-axis voxel edge lengths dv for lattice lengths abc.

        Reference: utils.py:105-108 (dx = (a + 2*a*eps)/d etc.).
        """
        abc = jnp.asarray(abc)
        return abc * (1.0 + 2.0 * self.eps_frac) / self.d


@dataclasses.dataclass(frozen=True)
class VoxelizerConfig:
    """Voxelization of structures into density/species grids.

    Reference: create_matrices.py:41-81 CLI defaults.
    """

    grid: GridSpec = GridSpec()
    sigma_frac: float = 1.0     # Gaussian width as fraction of ionic radius
    label_frac: float = 1.0     # labeling radius as fraction of ionic radius
    max_sites: int = 40         # skip structures with more sites
    site_pad: int = 64          # padded site-array length (device shapes)
    n_rot: int = 10             # 90-degree rotation augmentations per sample


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """3D U-Net species segmenter (reference: unet/unet.py:272-355).

    Encoder convs (32,64 | 64,128 | 128,256) with 2x maxpool between levels,
    bottleneck (512,512), decoder (512,256 | 256,128 | 128,128) with 2x
    upsampling and skip concats; two 1x1x1 heads: `soft` (num_classes-way
    softmax) and `sig` (binary sigmoid).
    """

    num_classes: int = 95
    in_channels: int = 4
    enc_filters: Tuple[Tuple[int, int], ...] = ((32, 64), (64, 128), (128, 256))
    bottom_filters: Tuple[int, int] = (512, 512)
    dec_filters: Tuple[Tuple[int, int], ...] = ((512, 256), (256, 128), (128, 128))
    bn_momentum: float = 0.99   # Keras BatchNormalization default
    bn_epsilon: float = 1e-3    # Keras BatchNormalization default
    dtype: str = "bfloat16"     # compute dtype; params stay float32
    # "ndcs" runs large-plane conv blocks in the spatial-major
    # (B, D, C, H*W) layout on the tap-packed Pallas conv (see
    # VAEConfig.layout); parameter trees are layout-independent.
    layout: str = "ndhwc"


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Conditional DFC-VAE (reference: vae/lattice_vae.py:89-230).

    The condition is a `cond_bins`-way one-hot broadcast over the spatial grid
    and concatenated to the input channels.

    ``cond_repeat`` pins the reference's cond-tiling quirk, derived
    analytically (the Keras 2.3/TF 2.1 stack cannot run in this environment):

    * The reference reshapes the (B, 10) condition to (B, 1, 1, 1, 10) and
      applies ``Lambda(K.tile, arguments={"n": (32, 32, 32, 4)})``
      (vae/lattice_vae.py:167-168) — rank-4 multiples on a rank-5 tensor.
    * Raw ``tf.tile`` REJECTS that (it requires ``len(multiples) == rank``),
      but the call goes through the Keras 2.3.1 backend wrapper
      ``keras.backend.tensorflow_backend.tile(x, n)``, which LEFT-pads short
      multiples with 1s before delegating ("if len(n) < len(shape): n =
      [1]*(len(shape)-len(n)) + n").
    * Effective multiples are therefore (1, 32, 32, 32, 4) applied to
      (B, 1, 1, 1, 10): a (B, 32, 32, 32, 40) condition block — the one-hot
      broadcast over the grid AND redundantly repeated 4x along channels —
      giving a 44-channel encoder input after concatenation.  This holds for
      any TF backend of that Keras version; there is no backend dependence.

    Reference-parity mode is therefore ``cond_repeat=4`` (exact encoder
    width 44).  The default stays 1 (clean single copy, width 14): the 4x
    repeat is an artifact, carries no extra information, and the round-1
    training campaign's checkpoints were trained at width 14.
    """

    grid: GridSpec = GridSpec()
    filters: Tuple[int, ...] = (16, 32, 64, 128)
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    latent_dim: int = 256
    cond_bins: int = 10
    cond_repeat: int = 1
    alpha: float = 0.5          # perceptual-loss weight (vae/lattice_vae.py:97)
    beta: float = 3e-4          # KLD weight (vae/lattice_vae.py:96)
    # Free-bits floor on the per-sample KLD (nats): the beta-weighted term
    # becomes beta * max(kld, kld_floor), so once a sample's KLD drops to
    # the floor the prior stops pulling it down and reconstruction pressure
    # sets the equilibrium.  0 = off (exact reference loss).  Lever for the
    # round-3 finding that a low KLD equilibrium (~20 vs round 2's ~69)
    # decodes fringier densities and costs generation charge balance.
    kld_floor: float = 0.0
    leaky_slope: float = 0.3    # Keras LeakyReLU default alpha
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    # 1-based indices of encoder-path convs of the U-Net whose post-ReLU
    # activations feed the perceptual loss.  The reference taps Keras layers
    # re_lu_2/4/6/8 (vae/lattice_vae.py:100) = the ReLUs after the 3rd, 5th,
    # 7th and 9th Conv3D of the saved U-Net.
    perceptual_taps: Tuple[int, ...] = (3, 5, 7, 9)
    perceptual_tap_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    dtype: str = "bfloat16"
    # Activation layout for the conv stacks.  "ndhwc" is the plain XLA
    # path; "ndcs" runs large-grid blocks in the spatial-major
    # (B, D, C, H*W) layout on the tap-packed Pallas conv
    # (ops/lowc_conv.py) — XLA executes these small-channel convs at
    # 2-12% of peak, the kernel several times faster (measured in
    # tools/lowc_shapes_bench.py).  Parameter trees are identical in both
    # layouts, so checkpoints are interchangeable.
    layout: str = "ndhwc"

    def __post_init__(self):
        # The encoder halves the grid once per filter block, so the grid must
        # survive len(filters) poolings; the decoder needs the seed grid
        # d / 2^(len-1) to upsample back exactly.  Catch the misconfiguration
        # here — downstream it surfaces as a cryptic reshape(B, -1) error on
        # a zero-sized tensor.
        n = len(self.filters)
        if self.grid.d < 2 ** n or self.grid.d % 2 ** (n - 1) != 0:
            raise ValueError(
                f"grid d={self.grid.d} is incompatible with {n} filter "
                f"blocks (needs d >= {2 ** n} and d divisible by "
                f"{2 ** (n - 1)}); use fewer/more filter blocks, e.g. "
                f"filters={(16, 32, 64)!r} for d=8"
            )


@dataclasses.dataclass(frozen=True)
class CGCNNConfig:
    """Crystal-graph convnet property regressor (reference: cgcnn/cgcnn.py:145-160).

    Fixed device shapes: graphs padded to ``max_atoms`` nodes with
    ``max_neighbors`` edges each; bond distances expanded on a Gaussian basis
    of ``num_bond_features`` centers in [dmin, radius] with spacing ``step``
    (reference: cgcnn/data.py:75-112,149-155).
    """

    atom_input_dim: int = 93
    atom_fea_len: int = 64
    max_atoms: int = 50
    max_neighbors: int = 12
    radius: float = 8.0
    dmin: float = 0.0
    step: float = 0.2
    n_conv: int = 1
    hidden_dim: int = 128
    bn_epsilon: float = 1e-5
    dtype: str = "float32"

    @property
    def num_bond_features(self) -> int:
        # delegate to GraphSpec — the single owner of the basis width
        # (a duplicated closed form disagreed with np.arange for
        # non-commensurate steps)
        from icsg3d_tpu.data.graphs import GraphSpec

        return GraphSpec(
            radius=self.radius, dmin=self.dmin, step=self.step
        ).num_bond_features


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization + checkpointing knobs shared by the training drivers.

    Reference defaults: U-Net bs=10 lr=3e-6 (train_unet.py:53-61), VAE bs=20
    lr=5e-4 250 epochs (train_vae.py:46-52, vae/lattice_vae.py:98), CGCNN
    bs=32 lr=1e-3 60 epochs (train_cgcnn.py:38,89,102).
    """

    batch_size: int = 20
    learning_rate: float = 5e-4
    epochs: int = 50
    split_frac: float = 0.8
    split_seed: int = 28        # utils.py:36 default seed
    n_rot: int = 10
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    keep_best_only: bool = True
    log_every_steps: int = 50


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map parallelism.

    ``data`` shards the batch (DP); ``spatial`` shards the depth axis of the
    voxel grids with halo exchange for large-grid training — the conv-net
    analog of sequence parallelism (no attention exists in these models).
    """

    data_axis: str = "data"
    spatial_axis: str = "spatial"
    data_parallel: int = -1     # -1: all devices
    spatial_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end pipeline (generation/eval) knobs.

    Reference: generate.py:50-103, eval.py:57-105.
    """

    grid: GridSpec = GridSpec()
    cond_bins: int = 10
    target: str = "formation_energy_per_atom"
    # latent sampling variance (generate.py:204); generation entry points
    # take `var` explicitly — this records the reference default
    sample_var: float = 0.5
    binary_threshold: float = 0.8   # occupancy threshold (generate.py:224)
    watershed_max_iters: int = 5
    watershed_wmin: int = 8
    watershed_min_convexity: float = 0.8
    cell_angles: Tuple[float, float, float] = (90.0, 90.0, 90.0)


def replace(cfg, **kwargs):
    """Convenience wrapper over dataclasses.replace."""
    return dataclasses.replace(cfg, **kwargs)
