from .r1cs import R1CS, ConstraintBuilder, load_r1cs, load_wtns
from .witness_calc import WitnessCalculator, generate_witness

__all__ = [
    "R1CS",
    "ConstraintBuilder",
    "load_r1cs",
    "load_wtns",
    "WitnessCalculator",
    "generate_witness",
]
