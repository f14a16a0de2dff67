from .r1cs import R1CS, ConstraintBuilder, load_r1cs, load_wtns

__all__ = ["R1CS", "ConstraintBuilder", "load_r1cs", "load_wtns"]
