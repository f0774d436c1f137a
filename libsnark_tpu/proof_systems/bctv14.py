"""BCTV14a PGHR-style SNARK (r1cs_ppzksnark).

Behavioral parity with zk_proof_systems/ppzksnark/r1cs_ppzksnark/
r1cs_ppzksnark.tcc (generator :259, prover :507, verifiers :658-830).
Proof = 8 elements: knowledge commitments g_A=(G1,G1), g_B=(G2,G1),
g_C=(G1,G1) plus g_H, g_K in G1.

TPU re-design: the reference's sparse knowledge_commitment_vectors
(kc_batch_exp + kc_multi_exp_with_mixed_addition, kc_multiexp.tcc:31-112)
become DENSE device affine arrays whose zero entries are points at
infinity -- the Pippenger kernel's bucket-0 skip and infinity-aware
mixed-add subsume the reference's zero-skip/one-mixed-add special cases.
Prover = one jitted program: ZK-patched QAP witness map + 8 MSMs
(A.g, A.h, B.g in G2, B.h, C.g, C.h, H, K).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import PairingSystem
from ..common.sparse_vector import AccumulationVector
from ..common.knowledge_commitment import KnowledgeCommitment
from ..ops.msm import default_window_bits
from ..reductions.r1cs_to_qap import (
    qap_domain, qap_instance_map_with_evaluation, qap_witness_map_zk)


@dataclasses.dataclass
class BCTV14ProvingKey:
    A_query_g: tuple     # device affine G1, len nv+2 (incl. Zt slot)
    A_query_h: tuple     # device affine G1 (alphaA shadow)
    B_query_g: tuple     # device affine G2
    B_query_h: tuple     # device affine G1
    C_query_g: tuple     # device affine G1
    C_query_h: tuple     # device affine G1
    H_query: tuple       # device affine G1, len m+1
    K_query: tuple       # device affine G1, len nv+4
    r1cs_dev: object
    cs: object


@dataclasses.dataclass
class BCTV14VerificationKey:
    alphaA_g2: object
    alphaB_g1: object
    alphaC_g2: object
    gamma_g2: object
    gamma_beta_g1: object
    gamma_beta_g2: object
    rC_Z_g2: object
    encoded_IC_query: AccumulationVector


@dataclasses.dataclass
class BCTV14Keypair:
    pk: BCTV14ProvingKey
    vk: BCTV14VerificationKey


@dataclasses.dataclass
class BCTV14Proof:
    g_A: KnowledgeCommitment
    g_B: KnowledgeCommitment
    g_C: KnowledgeCommitment
    g_H: object
    g_K: object

    def is_well_formed(self):
        return (self.g_A.is_well_formed() and self.g_B.is_well_formed()
                and self.g_C.is_well_formed()
                and self.g_H.is_well_formed()
                and self.g_K.is_well_formed())


class BCTV14(PairingSystem):
    """r1cs_ppzksnark over a named curve."""

    def generator(self, cs, seed: Optional[int] = None):
        rand = self._rng(seed)
        secrets_ = [rand() for _ in range(8)]
        return self.generator_from_secrets(cs, *secrets_)

    def generator_from_secrets(self, cs, t, alphaA, alphaB, alphaC,
                               rA, rB, beta, gamma):
        curve, r = self.curve, self.curve.r
        cs.swap_AB_if_beneficial()
        domain = qap_domain(self.fr, curve.fr_params, cs)
        qap = qap_instance_map_with_evaluation(cs, domain, t)
        nv, k, m = qap.num_variables, qap.num_inputs, qap.degree
        rC = rA * rB % r
        G1, G2 = curve.G1.one(), curve.G2.one()

        At = list(qap.At) + [qap.Zt]
        Bt = list(qap.Bt) + [qap.Zt]
        Ct = list(qap.Ct) + [qap.Zt]
        # K query uses At BEFORE the IC prefix is zeroed (tcc:332-341)
        Kt = [beta * (rA * At[i] + rB * Bt[i] + rC * Ct[i]) % r
              for i in range(nv + 1)]
        Kt += [beta * rA * qap.Zt % r, beta * rB * qap.Zt % r,
               beta * rC * qap.Zt % r]
        IC = [At[i] for i in range(k + 1)]
        for i in range(k + 1):
            At[i] = 0

        A_query_g = self.fixed_base_g1(G1, [rA * a % r for a in At])
        A_query_h = self.fixed_base_g1(G1, [rA * alphaA * a % r for a in At])
        B_query_g = self.fixed_base_g2(G2, [rB * b % r for b in Bt])
        B_query_h = self.fixed_base_g1(G1, [rB * alphaB * b % r for b in Bt])
        C_query_g = self.fixed_base_g1(G1, [rC * c % r for c in Ct])
        C_query_h = self.fixed_base_g1(G1, [rC * alphaC * c % r for c in Ct])
        H_query = self.fixed_base_g1(G1, qap.Ht)
        K_query = self.fixed_base_g1(G1, Kt)

        pk = BCTV14ProvingKey(
            A_query_g=A_query_g, A_query_h=A_query_h,
            B_query_g=B_query_g, B_query_h=B_query_h,
            C_query_g=C_query_g, C_query_h=C_query_h,
            H_query=H_query, K_query=K_query,
            r1cs_dev=cs.to_device(self.fr), cs=cs)
        vk = BCTV14VerificationKey(
            alphaA_g2=G2 * alphaA, alphaB_g1=G1 * alphaB,
            alphaC_g2=G2 * alphaC, gamma_g2=G2 * gamma,
            gamma_beta_g1=G1 * (gamma * beta % r),
            gamma_beta_g2=G2 * (gamma * beta % r),
            rC_Z_g2=G2 * (rC * qap.Zt % r),
            encoded_IC_query=AccumulationVector.from_values(
                G1 * (rA * IC[0] % r),
                [G1 * (rA * v % r) for v in IC[1:]]))
        return BCTV14Keypair(pk=pk, vk=vk)

    # -- prover ------------------------------------------------------------
    def prover(self, pk, primary: list, auxiliary: list,
               seed: Optional[int] = None):
        curve, r = self.curve, self.curve.r
        rand = self._rng(seed)
        d1, d2, d3 = rand(), rand(), rand()

        dev = pk.r1cs_dev
        domain = qap_domain(self.fr, curve.fr_params, pk.cs)
        nv = dev.num_variables
        full = [1] + [v % r for v in primary] + [v % r for v in auxiliary]
        assignment_mont = jnp.asarray(self.fr.encode(full))
        msm_c = default_window_bits(nv + 1)

        d_m = [jnp.asarray(self.fr.encode([d])) for d in (d1, d2, d3)]

        wm = getattr(pk, "_wm_jit", None)
        if wm is None:
            def wm_fn(assign_mont, d1_m, d2_m, d3_m):
                H = qap_witness_map_zk(dev, domain, assign_mont,
                                       d1_m, d2_m, d3_m)
                H_plain = self.pad_to(self.fr.from_mont(H),
                                      pk.H_query[0].shape[-1])
                assign_plain = self.fr.from_mont(assign_mont)
                # padded scalars: lanes beyond nv (the Zt slots and bucket
                # padding) get zero; the d_i * Zt terms are added on host
                full = self.pad_to(assign_plain, pk.A_query_g[0].shape[-1])
                kfull = self.pad_to(assign_plain, pk.K_query[0].shape[-1])
                return H_plain, full, kfull
            wm = pk._wm_jit = jax.jit(wm_fn)

        H_plain, full_p, kfull_p = wm(assignment_mont, d_m[0], d_m[1],
                                      d_m[2])
        Ag_a = self.msm_affine("g1", pk.A_query_g, full_p, msm_c)
        Ah_a = self.msm_affine("g1", pk.A_query_h, full_p, msm_c)
        Bg_a = self.msm_affine("g2", pk.B_query_g, full_p, msm_c)
        Bh_a = self.msm_affine("g1", pk.B_query_h, full_p, msm_c)
        Cg_a = self.msm_affine("g1", pk.C_query_g, full_p, msm_c)
        Ch_a = self.msm_affine("g1", pk.C_query_h, full_p, msm_c)
        H_a = self.msm_affine("g1", pk.H_query, H_plain, msm_c)
        K_a = self.msm_affine("g1", pk.K_query, kfull_p, msm_c)

        dec1, dec2 = self.decode_g1, self.decode_g2
        zt = nv + 1   # logical index of the Zt entry (queries are padded)
        g_A = KnowledgeCommitment(
            dec1(Ag_a) + dec1(pk.A_query_g, lane=zt) * d1,
            dec1(Ah_a) + dec1(pk.A_query_h, lane=zt) * d1)
        g_B = KnowledgeCommitment(
            dec2(Bg_a) + dec2(pk.B_query_g, lane=zt) * d2,
            dec1(Bh_a) + dec1(pk.B_query_h, lane=zt) * d2)
        g_C = KnowledgeCommitment(
            dec1(Cg_a) + dec1(pk.C_query_g, lane=zt) * d3,
            dec1(Ch_a) + dec1(pk.C_query_h, lane=zt) * d3)
        # K-query ZK terms live at indices nv+1, nv+2, nv+3
        Kx, Ky, Kinf = pk.K_query
        kpt = lambda i: self._decode_affine(
            self.g1, (Kx, Ky, Kinf), curve.G1, lane=i)
        g_K = (dec1(K_a) + kpt(nv + 1) * d1 + kpt(nv + 2) * d2
               + kpt(nv + 3) * d3)
        return BCTV14Proof(g_A=g_A, g_B=g_B, g_C=g_C, g_H=dec1(H_a), g_K=g_K)

    # -- verifier ------------------------------------------------------------
    def verifier_strong_IC(self, vk, primary: list, proof) -> bool:
        if len(primary) != vk.encoded_IC_query.domain_size():
            return False
        return self.verifier_weak_IC(vk, primary, proof)

    def verifier_weak_IC(self, vk, primary: list, proof) -> bool:
        curve, r = self.curve, self.curve.r
        if len(primary) > vk.encoded_IC_query.domain_size():
            return False
        acc = vk.encoded_IC_query.accumulate_chunk(
            [x % r for x in primary], 0).first
        if not proof.is_well_formed():
            return False
        G1_one, G2_one = curve.G1.one(), curve.G2.one()
        # knowledge commitment checks (tcc:707-768)
        kc_A = curve.pairing_check([
            (proof.g_A.g, vk.alphaA_g2), (-proof.g_A.h, G2_one)])
        kc_B = curve.pairing_check([
            (vk.alphaB_g1, proof.g_B.g), (-proof.g_B.h, G2_one)])
        kc_C = curve.pairing_check([
            (proof.g_C.g, vk.alphaC_g2), (-proof.g_C.h, G2_one)])
        # QAP divisibility: e(A+acc, B) = e(H, rC_Z) e(C, 1)
        qap_ok = curve.pairing_check([
            (proof.g_A.g + acc, proof.g_B.g),
            (-proof.g_H, vk.rC_Z_g2),
            (-proof.g_C.g, G2_one)])
        # same-coefficient: e(K, gamma) = e(A+acc+C, gamma*beta) e(gamma*beta, B)
        k_ok = curve.pairing_check([
            (proof.g_K, vk.gamma_g2),
            (-(proof.g_A.g + acc + proof.g_C.g), vk.gamma_beta_g2),
            (-vk.gamma_beta_g1, proof.g_B.g)])
        return kc_A and kc_B and kc_C and qap_ok and k_ok
