"""DFGK14 USCS SNARK (uscs_ppzksnark).

Behavioral parity with zk_proof_systems/ppzksnark/uscs_ppzksnark/
uscs_ppzksnark.tcc (generator :214, prover :389, verifier :518-640), via
the USCS->SSP reduction. Queries:
  V_g1_query       = [Vt[k+1..nv], Zt] * G             (G1)
  alpha_V_g1_query = alpha * same                      (G1)
  H_g1_query       = [t^0..t^degree] * G               (G1)
  V_g2_query       = [Vt[0..nv], Zt] * H               (G2)
vk = (tilde_g2, alpha_tilde_g2, Z_g2, accumulation of Xt = Vt[0..k]).
Proof = (V_g1, alpha_V_g1, H_g1, V_g2).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import PairingSystem
from ..common.sparse_vector import AccumulationVector
from ..ops.msm import default_window_bits
from ..reductions.uscs_to_ssp import (
    ssp_domain, ssp_instance_map_with_evaluation, SSPDevice, ssp_witness_map)


@dataclasses.dataclass
class DFGK14ProvingKey:
    V_g1_query: tuple          # device affine G1, len nv-k+1
    alpha_V_g1_query: tuple    # device affine G1, len nv-k+1
    H_g1_query: tuple          # device affine G1, len degree+1
    V_g2_query: tuple          # device affine G2, len nv+2
    ssp_dev: SSPDevice
    cs: object


@dataclasses.dataclass
class DFGK14VerificationKey:
    tilde_g2: object
    alpha_tilde_g2: object
    Z_g2: object
    encoded_IC_query: AccumulationVector


@dataclasses.dataclass
class DFGK14Keypair:
    pk: DFGK14ProvingKey
    vk: DFGK14VerificationKey


@dataclasses.dataclass
class DFGK14Proof:
    V_g1: object
    alpha_V_g1: object
    H_g1: object
    V_g2: object

    def is_well_formed(self):
        return (self.V_g1.is_well_formed()
                and self.alpha_V_g1.is_well_formed()
                and self.H_g1.is_well_formed()
                and self.V_g2.is_well_formed())


class DFGK14(PairingSystem):
    """uscs_ppzksnark over a named curve."""

    def generator(self, cs, seed: Optional[int] = None):
        rand = self._rng(seed)
        t, alpha, tilde = rand(), rand(), rand()
        return self.generator_from_secrets(cs, t, alpha, tilde)

    def generator_from_secrets(self, cs, t, alpha, tilde):
        curve, r = self.curve, self.curve.r
        domain = ssp_domain(self.fr, curve.fr_params, cs)
        ssp = ssp_instance_map_with_evaluation(cs, domain, t)
        nv, k, m = ssp.num_variables, ssp.num_inputs, ssp.degree
        G1, G2 = curve.G1.one(), curve.G2.one()

        Vt_full = list(ssp.Vt) + [ssp.Zt]          # len nv + 2
        Xt = Vt_full[: k + 1]
        V_rest = Vt_full[k + 1:]

        V_g1_query = self.fixed_base_g1(G1, V_rest)
        alpha_V_g1_query = self.fixed_base_g1(
            G1, [alpha * v % r for v in V_rest])
        H_g1_query = self.fixed_base_g1(G1, ssp.Ht)
        V_g2_query = self.fixed_base_g2(G2, Vt_full)

        pk = DFGK14ProvingKey(
            V_g1_query=V_g1_query, alpha_V_g1_query=alpha_V_g1_query,
            H_g1_query=H_g1_query, V_g2_query=V_g2_query,
            ssp_dev=SSPDevice.build(cs, self.fr, m), cs=cs)
        vk = DFGK14VerificationKey(
            tilde_g2=G2 * tilde,
            alpha_tilde_g2=G2 * (alpha * tilde % r),
            Z_g2=G2 * ssp.Zt,
            encoded_IC_query=AccumulationVector.from_values(
                G1 * Xt[0], [G1 * x for x in Xt[1:]]))
        return DFGK14Keypair(pk=pk, vk=vk)

    # -- prover ------------------------------------------------------------
    def prover(self, pk, primary: list, auxiliary: list,
               seed: Optional[int] = None):
        curve, r = self.curve, self.curve.r
        d = self._rng(seed)()
        dev = pk.ssp_dev
        domain = ssp_domain(self.fr, curve.fr_params, pk.cs)
        nv, k = dev.num_variables, dev.num_inputs
        full = [1] + [v % r for v in primary] + [v % r for v in auxiliary]
        assignment_mont = jnp.asarray(self.fr.encode(full))
        msm_c = default_window_bits(nv + 2)

        d_m = jnp.asarray(self.fr.encode([d]))

        wm = getattr(pk, "_wm_jit", None)
        if wm is None:
            def wm_fn(assign_mont, d_m):
                H = ssp_witness_map(dev, domain, assign_mont, d_m)
                H_plain = self.pad_to(self.fr.from_mont(H),
                                      pk.H_g1_query[0].shape[-1])
                assign_plain = self.fr.from_mont(assign_mont)
                # V_g1 / alpha_V_g1: query vars k+1..nv; the trailing Zt
                # entry (ZK-patch) and pad lanes get scalar zero
                wit = self.pad_to(assign_plain[..., k + 1:],
                                  pk.V_g1_query[0].shape[-1])
                full = self.pad_to(assign_plain, pk.V_g2_query[0].shape[-1])
                return H_plain, wit, full
            wm = pk._wm_jit = jax.jit(wm_fn)

        H_plain, wit_p, full_p = wm(assignment_mont, d_m)
        V1_a = self.msm_affine("g1", pk.V_g1_query, wit_p, msm_c)
        aV1_a = self.msm_affine("g1", pk.alpha_V_g1_query, wit_p, msm_c)
        H_a = self.msm_affine("g1", pk.H_g1_query, H_plain, msm_c)
        V2_a = self.msm_affine("g2", pk.V_g2_query, full_p, msm_c)
        V1_m, aV1_m, H_m = (self.decode_g1(V1_a), self.decode_g1(aV1_a),
                            self.decode_g1(H_a))
        V2_m = self.decode_g2(V2_a)

        # the Zt entries sit at LOGICAL last positions (queries are padded)
        last1 = self.decode_g1(pk.V_g1_query, lane=nv - k)
        alast1 = self.decode_g1(pk.alpha_V_g1_query, lane=nv - k)
        last2 = self.decode_g2(pk.V_g2_query, lane=nv + 1)
        V_g1 = last1 * d + V1_m
        alpha_V_g1 = alast1 * d + aV1_m
        V_g2 = last2 * d + V2_m
        return DFGK14Proof(V_g1=V_g1, alpha_V_g1=alpha_V_g1, H_g1=H_m,
                           V_g2=V_g2)

    # -- verifier ------------------------------------------------------------
    def verifier_strong_IC(self, vk, primary: list, proof) -> bool:
        if len(primary) != vk.encoded_IC_query.domain_size():
            return False
        return self.verifier_weak_IC(vk, primary, proof)

    def verifier_weak_IC(self, vk, primary: list, proof) -> bool:
        curve, r = self.curve, self.curve.r
        if len(primary) > vk.encoded_IC_query.domain_size():
            return False
        acc_vec = vk.encoded_IC_query.accumulate_chunk(
            [x % r for x in primary], 0)
        acc = acc_vec.first
        if not proof.is_well_formed():
            return False
        G1_one, G2_one = curve.G1.one(), curve.G2.one()
        V_with_acc = proof.V_g1 + acc
        # knowledge commitment: e(V_g1 + acc, H) = e(G, V_g2)
        ok1 = curve.pairing_check([
            (V_with_acc, G2_one),
            (-G1_one, proof.V_g2),
        ])
        # SSP divisibility: e(V, V) = e(H, Z) e(G, H2)^1 -> V^2 = H Z + 1
        ok2 = curve.pairing_check([
            (-V_with_acc, proof.V_g2),
            (proof.H_g1, vk.Z_g2),
            (G1_one, G2_one),
        ])
        # same-coefficient check
        ok3 = curve.pairing_check([
            (proof.V_g1, vk.alpha_tilde_g2),
            (-proof.alpha_V_g1, vk.tilde_g2),
        ])
        return ok1 and ok2 and ok3
