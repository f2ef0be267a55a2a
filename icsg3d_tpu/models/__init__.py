"""Flax model families: 3D U-Net segmenter, conditional DFC-VAE, CGCNN.

All modules are NDHWC / channels-last (the native TPU conv layout), compute
in bfloat16 with float32 parameters and batch statistics, and are built for
whole-graph jit: no Python control flow depends on data.
"""

from icsg3d_tpu.models.unet import UNet3D
from icsg3d_tpu.models.vae import ConditionalDFCVAE, Encoder, Decoder
from icsg3d_tpu.models.cgcnn import CGCNN

__all__ = ["UNet3D", "ConditionalDFCVAE", "Encoder", "Decoder", "CGCNN"]
