"""Circom binary-artifact ingestion (.r1cs / .wtns) end to end.

The reference front end reads circom artifacts through ark-circom
(groth16/examples/sha256.rs:162-177); here the equivalent parsers are
zksaas_tpu.circom.load_r1cs / load_wtns (iden3 binary spec).  This test
serializes a real circuit in those exact binary formats (writer below
mirrors the spec the parsers read, scripts/compile_circuit.sh analog),
parses it back, proves it locally, verifies, and runs a distributed
d_ifft round on the qap-packed shares."""

import io
import random
import struct

import jax
import jax.numpy as jnp
import pytest

from zksaas_tpu.circom import load_r1cs, load_wtns
from zksaas_tpu.comm import LocalNet
from zksaas_tpu.dist import FftMask, d_ifft
from zksaas_tpu.fields import BN254_FR
from zksaas_tpu.groth16 import local_prove, setup, verify
from zksaas_tpu.groth16.local import qap_evals
from zksaas_tpu.groth16.qap import qap_pack
from zksaas_tpu.ntt import domain, ifft_ref
from zksaas_tpu.pss import pss

FS = 32  # field element byte size (BN254)


def _sections(magic: bytes, secs: list[tuple[int, bytes]]) -> bytes:
    out = io.BytesIO()
    out.write(magic)
    out.write(struct.pack("<II", 1, len(secs)))
    for sec_type, body in secs:
        out.write(struct.pack("<IQ", sec_type, len(body)))
        out.write(body)
    return out.getvalue()


def _fe(x: int) -> bytes:
    return (x % BN254_FR.p).to_bytes(FS, "little")


def _prime() -> bytes:
    # The header stores the prime itself, NOT a field element — reducing it
    # mod p would serialize 0 and load_r1cs would (correctly) reject it.
    return BN254_FR.p.to_bytes(FS, "little")


def write_r1cs(n_wires, n_pub_out, n_pub_in, n_prv_in, constraints) -> bytes:
    """Serialize the iden3 .r1cs binary format (the format circom emits
    and load_r1cs parses)."""
    header = struct.pack("<I", FS) + _prime()
    header += struct.pack(
        "<IIIIQI", n_wires, n_pub_out, n_pub_in, n_prv_in, n_wires, len(constraints)
    )
    body = io.BytesIO()
    for rows in constraints:
        for lc in rows:
            body.write(struct.pack("<I", len(lc)))
            for coeff, widx in lc:
                body.write(struct.pack("<I", widx))
                body.write(_fe(coeff))
    return _sections(b"r1cs", [(1, header), (2, body.getvalue())])


def write_wtns(values) -> bytes:
    header = struct.pack("<I", FS) + _prime() + struct.pack("<I", len(values))
    body = b"".join(_fe(v) for v in values)
    return _sections(b"wtns", [(1, header), (2, body)])


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """A multiplication-chain circuit in circom wire order
    [1, pub_out, prv_in..., internal...]: u = x*y, v = u*u, w = v*u,
    out = w."""
    p = BN254_FR.p
    x, y = 5, 7
    u = x * y % p
    v = u * u % p
    w = v * u % p
    # wires: 0=1, 1=out, 2=x, 3=y, 4=u, 5=v, 6=w
    constraints = [
        ([(1, 2)], [(1, 3)], [(1, 4)]),
        ([(1, 4)], [(1, 4)], [(1, 5)]),
        ([(1, 5)], [(1, 4)], [(1, 6)]),
        ([(1, 6)], [(1, 0)], [(1, 1)]),
    ]
    d = tmp_path_factory.mktemp("circom")
    r1cs_path = d / "mulchain.r1cs"
    wtns_path = d / "mulchain.wtns"
    r1cs_path.write_bytes(write_r1cs(7, 1, 0, 2, constraints))
    wtns_path.write_bytes(write_wtns([1, w, x, y, u, v, w]))
    return str(r1cs_path), str(wtns_path)


def test_parse_prove_verify(artifacts):
    """load_r1cs + load_wtns -> satisfied R1CS -> Groth16 prove+verify
    (the sha256.rs:162-199 flow on a checked-in-format fixture)."""
    r1cs_path, wtns_path = artifacts
    r1cs = load_r1cs(r1cs_path)
    z = load_wtns(wtns_path)
    assert r1cs.num_instance == 2 and r1cs.num_witness == 5
    assert len(z) == r1cs.num_vars
    assert r1cs.is_satisfied(z)

    rng = random.Random(7)
    keys = setup(r1cs, rng, reduction="circom")
    proof = local_prove(keys, r1cs, z, rng.randrange(r1cs.spec.p), rng.randrange(r1cs.spec.p))
    assert verify(keys, z[1 : r1cs.num_instance], proof)
    # tampered public input must not verify
    assert not verify(keys, [(z[1] + 1) % r1cs.spec.p], proof)


def test_qap_pack_round_on_parsed_circuit(artifacts):
    """qap_pack on the parsed R1CS feeds a distributed ifft whose
    unpacked output equals the local ifft of the QAP a-vector."""
    r1cs_path, wtns_path = artifacts
    r1cs = load_r1cs(r1cs_path)
    z = load_wtns(wtns_path)
    pp = pss(BN254_FR, 2)
    key = jax.random.PRNGKey(17)
    k1, k2, k3 = jax.random.split(key, 3)
    qap_share = qap_pack(pp, r1cs, z, k1)
    m = qap_share.dom.n
    a_evals, _, _, _ = qap_evals(r1cs, z)
    dom = domain(BN254_FR, m)
    mask = FftMask.sample(False, 1, dom.group_gen_inv, m, pp, k2)
    net = LocalNet(pp.n)
    out = d_ifft(pp, qap_share.a, mask, False, dom, 1, net, k3)
    sh = jnp.swapaxes(out, 0, 1)
    got = list(pp.F.decode(pp.unpack(sh).reshape(-1, pp.F.k)))
    assert got == ifft_ref(BN254_FR, a_evals)
