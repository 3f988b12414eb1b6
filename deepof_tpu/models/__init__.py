"""Model zoo: graph-aware sequence autoencoders for behavior clustering.

Flax/JAX rebuild of the reference's clustering models
(deepof/clustering/models_new.py): recurrent / TCN / transformer encoders
and decoders, CensNet graph convolution, and three heads — VQ-VAE codebook,
VaDE Gaussian-mixture latent, and a contrastive encoder.
"""

from deepof_tpu.models.gnn import CensNetConv, censnet_operators
from deepof_tpu.models.encoders import (
    RecurrentEncoder,
    TCNEncoder,
    TransformerEncoder,
)
from deepof_tpu.models.decoders import (
    MaskedNormal,
    RecurrentDecoder,
    TCNDecoder,
    TransformerDecoder,
)
from deepof_tpu.models.heads import GaussianMixtureLatent, VectorQuantizer
from deepof_tpu.models.zoo import Contrastive, VaDE, VQVAE, build_model, init_variables

__all__ = [
    "CensNetConv",
    "censnet_operators",
    "RecurrentEncoder",
    "TCNEncoder",
    "TransformerEncoder",
    "MaskedNormal",
    "RecurrentDecoder",
    "TCNDecoder",
    "TransformerDecoder",
    "GaussianMixtureLatent",
    "VectorQuantizer",
    "Contrastive",
    "VaDE",
    "VQVAE",
    "build_model",
    "init_variables",
]
