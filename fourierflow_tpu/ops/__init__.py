from .dft import dct2_basis, idct2_basis, irdft_basis, rdft_basis
from .spectral import (
    dct_mix_axis,
    resolve_impl,
    spectral_conv_2d_full,
    spectral_lowpass_axis,
    spectral_mix_axis,
)

__all__ = [
    "dct2_basis",
    "idct2_basis",
    "irdft_basis",
    "rdft_basis",
    "dct_mix_axis",
    "resolve_impl",
    "spectral_conv_2d_full",
    "spectral_lowpass_axis",
    "spectral_mix_axis",
]
