from .domain import Radix2Domain, domain
from .ref import fft_ref, ifft_ref

__all__ = ["Radix2Domain", "domain", "fft_ref", "ifft_ref"]
