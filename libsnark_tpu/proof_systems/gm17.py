"""GM17 simulation-extractable SNARK (r1cs_se_ppzksnark).

Behavioral parity with zk_proof_systems/ppzksnark/r1cs_se_ppzksnark/
r1cs_se_ppzksnark.tcc (generator :246, prover :438, verifier :561-692),
via the R1CS->SAP reduction. TPU re-design: all queries are dense device
arrays built by fixed-base batch-exp; the prover is one jitted program --
SAP witness map (batched NTT pipeline) + five Pippenger MSMs
(A, B in G2, C_1, C_2, H).

Proof = (A in G1, B in G2, C in G1).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import PairingSystem
from ..ops.msm import default_window_bits
from ..reductions.r1cs_to_sap import (
    sap_domain, sap_instance_map_with_evaluation, sap_num_variables,
    SAPDevice, sap_extend_assignment, sap_witness_map)


@dataclasses.dataclass
class GM17ProvingKey:
    A_query: tuple            # device affine G1, len nv_sap+1
    B_query: tuple            # device affine G2, len nv_sap+1
    C_query_1: tuple          # device affine G1, len nv_sap - k
    C_query_2: tuple          # device affine G1, len nv_sap+1
    G_gamma2_Z_t: tuple       # device affine G1, len degree+1
    G_gamma_Z: object         # host G1
    H_gamma_Z: object         # host G2
    G_ab_gamma_Z: object      # host G1
    G_gamma2_Z2: object       # host G1
    G_gamma2_Z_t0: object     # host G1 (= G_gamma2_Z_t[0], d2 ZK-patch)
    sap_dev: SAPDevice
    cs: object


@dataclasses.dataclass
class GM17VerificationKey:
    H: object                 # host G2
    G_alpha: object           # host G1
    H_beta: object            # host G2
    G_gamma: object           # host G1
    H_gamma: object           # host G2
    query: list               # host G1, len num_inputs + 1


@dataclasses.dataclass
class GM17Keypair:
    pk: GM17ProvingKey
    vk: GM17VerificationKey


@dataclasses.dataclass
class GM17Proof:
    A: object   # host G1
    B: object   # host G2
    C: object   # host G1

    def is_well_formed(self):
        return (self.A.is_well_formed() and self.B.is_well_formed()
                and self.C.is_well_formed())


class GM17(PairingSystem):
    """r1cs_se_ppzksnark over a named curve."""

    def generator(self, cs, seed: Optional[int] = None):
        rand = self._rng(seed)
        t, alpha, beta, gamma, g_s, h_s = (rand() for _ in range(6))
        return self.generator_from_secrets(cs, t, alpha, beta, gamma,
                                           g_s, h_s)

    def generator_from_secrets(self, cs, t, alpha, beta, gamma,
                               g_scalar=1, h_scalar=1):
        curve, r = self.curve, self.curve.r
        domain = sap_domain(self.fr, curve.fr_params, cs)
        sap = sap_instance_map_with_evaluation(cs, domain, t)
        nv, k, m = sap.num_variables, sap.num_inputs, sap.degree
        G = curve.G1.one() * g_scalar
        H = curve.G2.one() * h_scalar

        ab = (alpha + beta) % r
        query_s = [(gamma * sap.Ct[i] + ab * sap.At[i]) % r
                   for i in range(k + 1)]
        A_s = [gamma * a % r for a in sap.At]
        gz2 = gamma * gamma % r * sap.Zt % r
        C1_s = [gamma * (gamma * sap.Ct[i] + ab * sap.At[i]) % r
                for i in range(k + 1, nv + 1)]
        C2_s = [2 * gz2 * a % r for a in sap.At]
        Gz_t_s = [gz2 * sap.Ht[i] % r for i in range(m + 1)]

        A_query = self.fixed_base_g1(G, A_s)
        B_query = self.fixed_base_g2(H, A_s)
        C_query_1 = self.fixed_base_g1(G, C1_s)
        C_query_2 = self.fixed_base_g1(G, C2_s)
        G_gamma2_Z_t = self.fixed_base_g1(G, Gz_t_s)

        G_gamma_Z = G * (gamma * sap.Zt % r)
        H_gamma_Z = H * (gamma * sap.Zt % r)
        pk = GM17ProvingKey(
            A_query=A_query, B_query=B_query, C_query_1=C_query_1,
            C_query_2=C_query_2, G_gamma2_Z_t=G_gamma2_Z_t,
            G_gamma_Z=G_gamma_Z, H_gamma_Z=H_gamma_Z,
            G_ab_gamma_Z=G_gamma_Z * ab,
            G_gamma2_Z2=G_gamma_Z * (sap.Zt * gamma % r),
            G_gamma2_Z_t0=G * Gz_t_s[0],
            sap_dev=SAPDevice.build(cs, self.fr), cs=cs)
        vk = GM17VerificationKey(
            H=H, G_alpha=G * alpha, H_beta=H * beta,
            G_gamma=G * gamma, H_gamma=H * gamma,
            query=[G * s for s in query_s])
        return GM17Keypair(pk=pk, vk=vk)

    # -- prover ------------------------------------------------------------
    def prover(self, pk, primary: list, auxiliary: list,
               seed: Optional[int] = None):
        curve, r = self.curve, self.curve.r
        rand = self._rng(seed)
        d1, d2, rnd_r = rand(), rand(), rand()

        dev = pk.sap_dev
        domain = sap_domain(self.fr, curve.fr_params, pk.cs)
        full = [1] + [v % r for v in primary] + [v % r for v in auxiliary]
        assignment_mont = jnp.asarray(self.fr.encode(full))
        k = dev.num_inputs
        msm_c = default_window_bits(dev.sap_num_variables + 1)

        d1_m = jnp.asarray(self.fr.encode([d1]))
        d2_m = jnp.asarray(self.fr.encode([d2]))

        wm = getattr(pk, "_wm_jit", None)
        if wm is None:
            def wm_fn(assign_mont, d1_m, d2_m):
                ext = sap_extend_assignment(dev, self.fr, assign_mont)
                H = sap_witness_map(dev, domain, ext, d1_m, d2_m)
                H_plain = self.pad_to(self.fr.from_mont(H),
                                      pk.G_gamma2_Z_t[0].shape[-1])
                ext_plain = self.fr.from_mont(ext)
                full = self.pad_to(ext_plain, pk.A_query[0].shape[-1])
                wit = self.pad_to(ext_plain[..., k + 1:],
                                  pk.C_query_1[0].shape[-1])
                return H_plain, full, wit
            wm = pk._wm_jit = jax.jit(wm_fn)

        H_plain, full_p, wit_p = wm(assignment_mont, d1_m, d2_m)
        A_a = self.msm_affine("g1", pk.A_query, full_p, msm_c)
        B_a = self.msm_affine("g2", pk.B_query, full_p, msm_c)
        C1_a = self.msm_affine("g1", pk.C_query_1, wit_p, msm_c)
        C2_a = self.msm_affine("g1", pk.C_query_2, full_p, msm_c)
        H_a = self.msm_affine("g1", pk.G_gamma2_Z_t, H_plain, msm_c)
        A_m, C1_m, C2_m, H_m = (self.decode_g1(A_a), self.decode_g1(C1_a),
                                self.decode_g1(C2_a), self.decode_g1(H_a))
        B_m = self.decode_g2(B_a)

        # final combination (tcc:487-560)
        A = pk.G_gamma_Z * ((rnd_r + d1) % r) + A_m
        B = pk.H_gamma_Z * ((rnd_r + d1) % r) + B_m
        C = (C1_m
             + pk.G_gamma2_Z2 * (rnd_r * rnd_r % r)
             + pk.G_ab_gamma_Z * ((rnd_r + d1) % r)
             + C2_m * rnd_r
             + pk.G_gamma2_Z2 * (2 * rnd_r * d1 % r)
             + pk.G_gamma2_Z_t0 * d2
             + H_m)
        return GM17Proof(A=A, B=B, C=C)

    # -- verifier ------------------------------------------------------------
    def verifier_process_vk(self, vk):
        return vk  # host pairings are computed on demand

    def verifier_strong_IC(self, vk, primary: list, proof) -> bool:
        if len(primary) + 1 != len(vk.query):
            return False
        return self.verifier_weak_IC(vk, primary, proof)

    def verifier_weak_IC(self, vk, primary: list, proof) -> bool:
        curve, r = self.curve, self.curve.r
        if len(primary) + 1 > len(vk.query):
            return False
        if not proof.is_well_formed():
            return False
        G_psi = vk.query[0]
        for i, x in enumerate(primary):
            G_psi = G_psi + vk.query[i + 1] * (x % r)
        # test 1: e(A + G_alpha, B + H_beta)
        #         = e(G_alpha, H_beta) e(psi, H_gamma) e(C, H)
        ok1 = curve.pairing_check([
            (-(proof.A + vk.G_alpha), proof.B + vk.H_beta),
            (vk.G_alpha, vk.H_beta),
            (G_psi, vk.H_gamma),
            (proof.C, vk.H),
        ])
        # test 2: e(A, H_gamma) = e(G_gamma, B)
        ok2 = curve.pairing_check([
            (proof.A, vk.H_gamma),
            (-vk.G_gamma, proof.B),
        ])
        return ok1 and ok2
