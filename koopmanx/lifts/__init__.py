from .base import (
    Dictionary,
    constant_augmented,
    identity_dictionary,
    state_augmented,
    zero_offset,
)
from .mlp import (
    autoencoder_dictionary,
    encoder_dictionary,
    mlp_apply,
    mlp_init,
    reference_autoencoder_sizes,
)
from .fourier import fourier_dictionary, rff_init
from .poly import hermite_dictionary, monomial_dictionary
from .rbf import kmeans, rbf_dictionary
