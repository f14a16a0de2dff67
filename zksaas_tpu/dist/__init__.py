from .dfft import FftMask, d_fft, d_ifft, fft1_local, fft2_king
from .deg_red import DegRedMask, deg_red
from .dmsm import MsmMask, d_msm, d_msm_local, d_msm_reduce
from .dpp import PpBlind, d_pp

__all__ = [
    "FftMask",
    "d_fft",
    "d_ifft",
    "fft1_local",
    "fft2_king",
    "DegRedMask",
    "deg_red",
    "MsmMask",
    "d_msm",
    "d_msm_local",
    "d_msm_reduce",
    "d_pp",
    "PpBlind",
]
