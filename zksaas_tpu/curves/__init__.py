from . import ref
from .jcurve import Fq2Ring, FqRing, JCurve, curve_g1, curve_g2

__all__ = ["ref", "JCurve", "FqRing", "Fq2Ring", "curve_g1", "curve_g2"]
