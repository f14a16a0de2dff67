from .spec import (
    BLS12_377_FQ,
    BLS12_377_FR,
    BLS12_381_FQ,
    BLS12_381_FR,
    BN254_FQ,
    BN254_FR,
    FIELDS,
    LIMB_BITS,
    LIMB_MASK,
    FieldSpec,
)
from .jfield import Field, field

__all__ = [
    "FieldSpec",
    "Field",
    "field",
    "FIELDS",
    "LIMB_BITS",
    "LIMB_MASK",
    "BN254_FR",
    "BN254_FQ",
    "BLS12_381_FR",
    "BLS12_381_FQ",
    "BLS12_377_FR",
    "BLS12_377_FQ",
]
