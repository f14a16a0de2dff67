from .ext_wit import circom_h, circom_masks, libsnark_h, libsnark_masks
from .local import Groth16Keys, Proof, local_prove, qap_evals, setup, verify, witness_map
from .proving_key import PackedProvingKeyShare, pack_proving_key
from .prove import (
    ProveMasks,
    d_prove,
    pack_scalar_repeated,
    pack_witness,
    prove_a,
    prove_b_g1,
    prove_b_g2,
    prove_c,
)
from .qap import PackedQAPShare, qap_pack

__all__ = [
    "Groth16Keys",
    "Proof",
    "setup",
    "local_prove",
    "verify",
    "qap_evals",
    "witness_map",
    "circom_h",
    "libsnark_h",
    "circom_masks",
    "libsnark_masks",
    "PackedQAPShare",
    "qap_pack",
    "PackedProvingKeyShare",
    "pack_proving_key",
    "ProveMasks",
    "d_prove",
    "prove_a",
    "prove_b_g1",
    "prove_b_g2",
    "prove_c",
    "pack_witness",
    "pack_scalar_repeated",
]
