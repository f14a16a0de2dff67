"""zksaas_tpu — a TPU-native zkSaaS proving stack.

A from-scratch JAX/XLA/Pallas implementation of the zkSaaS protocol
(eprint 2023/905): a (t, N)-threshold MPC that produces Groth16 zkSNARK
proofs by distributing the prover's FFTs and MSMs across N parties while
keeping the witness private against up to t corruptions.

Layer map (mirrors the reference's crate layout, re-designed TPU-first;
see SURVEY.md):

  fields/   Fr/Fq modular arithmetic as 16-bit-limb uint32 vector kernels
            (reference: arkworks ark-ff, used throughout)
  curves/   short-Weierstrass G1/G2 point ops, pairings (host oracle)
            (reference: arkworks ark-ec)
  ntt/      radix-2 (I)NTT + evaluation domains, arkworks-compatible
            (reference: ark-poly Radix2EvaluationDomain)
  pss/      packed secret sharing + Gao RS decode
            (reference: secret-sharing/src/{pss,gao,utils}.rs)
  comm/     the star-topology protocol transport: local simulator and
            SPMD device-mesh backends
            (reference: mpc-net/src/{lib,multi,prod,ser_net}.rs)
  dist/     distributed primitives d_fft/d_ifft, d_msm, deg_red, d_pp
            (reference: dist-primitives/src/{dfft,dmsm,dpp,utils}/)
  groth16/  QAP, packed CRS, extended witness, proof builders, plus a
            self-contained CPU Groth16 oracle (setup/prove/verify)
            (reference: groth16/src/*)
  circom/   .r1cs / .wtns ingestion and fixture circuit builders
            (reference: ark-circom usage in groth16/examples)
"""

__version__ = "0.1.0"
