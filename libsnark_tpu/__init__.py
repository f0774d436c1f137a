"""libsnark_tpu: a TPU-native zkSNARK proving framework.

A from-scratch re-design of the capabilities of clearmatics/libsnark for
TPU hardware: batched packed-limb finite-field kernels (JAX/XLA/Pallas),
Pippenger multi-scalar multiplication and radix-2 NTT sharded over device
meshes, and the full proof-system / constraint-system / gadget stack on
top.

Layers (bottom-up; compare SURVEY.md section 1):
  fields / curves     host-side oracle math + pairings (verifier path)
  ops                 batched device kernels: Fp, Fp2, EC, MSM, NTT
  parallel            mesh sharding for MSM / NTT (pjit / shard_map)
  relations           R1CS / USCS / BACS / TBCS / QAP / SAP / SSP
  reductions          r1cs->qap, r1cs->sap, uscs->ssp, bacs->r1cs, tbcs->uscs
  proof_systems       Groth16, GM17, BCTV14, DFGK14, wrappers
  polynomial_commitments  KZG10, batched KZG, BDFG21
  gadgets             protoboard + gadget DSL (gadgetlib1 equivalent)
  common              sparse/accumulation vectors, merkle tree, routing
"""

__version__ = "0.1.0"

from .curves import get_curve, available_curves  # noqa: F401
