"""Groth16 (r1cs_gg_ppzksnark): generator / prover / verifier.

Behavioral parity with the reference's primary proof system
(zk_proof_systems/ppzksnark/r1cs_gg_ppzksnark/r1cs_gg_ppzksnark.tcc:
generator :226/:430, prover :464, verifiers :605-745), re-architected for
TPU:

* generator: secrets + QAP evaluation host-side (one-time), all query
  exponentiations as device fixed-base batch-exp over window tables built
  on-device (replaces libff get_window_table/batch_exp,
  tcc:316-398);
* prover: QAP witness map = batched NTT pipeline; A/B/H/L multi-exps =
  Pippenger MSM kernels (replaces multi_exp_with_mixed_addition BDLO12
  signed, tcc:521-594). The four MSMs are independent given the witness
  map output and can be dispatched together (XLA overlaps them);
* verifier: a handful of host pairings (tcc:625-684).

Both a seeded (deterministic, for parity tests; mirrors
generator_from_secrets tcc:226 + MPC entry points hpp:383-395) and a
secure-random path are provided.
"""
from __future__ import annotations

import dataclasses
import secrets
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import PairingSystem
from ..ops.msm import default_window_bits
from ..reductions.r1cs_to_qap import (
    qap_domain, qap_instance_map_with_evaluation, qap_witness_map)


# --------------------------------------------------------------------- types

@dataclasses.dataclass
class Groth16ProvingKey:
    alpha_g1: object
    beta_g1: object
    beta_g2: object
    delta_g1: object
    delta_g2: object
    A_query: tuple          # device affine (x, y, inf) G1, len nv+1
    B_query_g2: tuple       # device affine G2, len nv+1
    B_query_g1: tuple       # device affine G1, len nv+1
    H_query: tuple          # device affine G1, len m-1
    L_query: tuple          # device affine G1, len nv - num_inputs
    r1cs_dev: object
    cs: object

    def size_summary(self):
        nv = self.r1cs_dev.num_variables
        return dict(A=nv + 1, B=nv + 1, H=self.H_query[0].shape[-1],
                    L=self.L_query[0].shape[-1])


@dataclasses.dataclass
class Groth16VerificationKey:
    alpha_g1: object
    beta_g2: object
    gamma_g2: object
    delta_g2: object
    gamma_ABC: list          # host G1 points, len num_inputs + 1


@dataclasses.dataclass
class Groth16ProcessedVK:
    """Online-verification state (r1cs_gg_ppzksnark_processed_verification_key,
    tcc:605-621): e(alpha, beta) plus G2 Miller-loop embeddings."""
    alpha_beta_gt: object
    gamma_g2_precomp: object
    delta_g2_precomp: object
    gamma_ABC: list


@dataclasses.dataclass
class Groth16Keypair:
    pk: Groth16ProvingKey
    vk: Groth16VerificationKey


@dataclasses.dataclass
class Groth16Proof:
    g_A: object   # host G1
    g_B: object   # host G2
    g_C: object   # host G1

    def __eq__(self, o):
        return (self.g_A, self.g_B, self.g_C) == (o.g_A, o.g_B, o.g_C)


# ------------------------------------------------------------------- system

class Groth16(PairingSystem):
    """Groth16 over a named curve; holds the device kernel bundle.

    Queries are device affine arrays padded to power-of-two buckets
    (PairingSystem.bucket) so different circuit sizes share XLA
    executables; pad lanes are infinity points / zero scalars.
    """

    # force_pow_2 mirrors the reference's force_pow_2_domain option
    # (r1cs_gg_ppzksnark.hpp:386): generator/prover/prover_sharded must
    # agree on it (the sharded four-step witness map needs a pow-2
    # domain, so set it True before keygen when proving sharded).
    force_pow_2 = False

    # legacy aliases (base class provides the public names)
    def _fixed_base_g1(self, base_host, scalars, c=8):
        return self.fixed_base_g1(base_host, scalars, c)

    def _fixed_base_g2(self, base_host, scalars, c=8):
        return self.fixed_base_g2(base_host, scalars, c)

    # -- generator ----------------------------------------------------------------
    def generator(self, cs, seed: Optional[int] = None):
        """Trusted setup. seed=None -> secure randomness; otherwise
        deterministic (generator_from_secrets-style parity path)."""
        rand = self._rng(seed)
        t, alpha, beta, gamma, delta = (rand() for _ in range(5))
        return self.generator_from_secrets(cs, t, alpha, beta, gamma, delta)

    def generator_from_secrets(self, cs, t, alpha, beta, gamma, delta):
        curve, r = self.curve, self.curve.r
        cs.swap_AB_if_beneficial()
        domain = qap_domain(self.fr, curve.fr_params, cs,
                            self.force_pow_2)
        qap = qap_instance_map_with_evaluation(cs, domain, t)
        m, nv, k = qap.degree, qap.num_variables, qap.num_inputs

        gamma_inv = pow(gamma, -1, r)
        delta_inv = pow(delta, -1, r)
        # beta*A_i + alpha*B_i + C_i
        ABC = [(beta * qap.At[i] + alpha * qap.Bt[i] + qap.Ct[i]) % r
               for i in range(nv + 1)]
        gamma_ABC_s = [v * gamma_inv % r for v in ABC[: k + 1]]
        L_s = [v * delta_inv % r for v in ABC[k + 1:]]
        H_s = [qap.Ht[i] * qap.Zt % r * delta_inv % r for i in range(m - 1)]

        G1, G2 = curve.G1.one(), curve.G2.one()
        A_query = self.fixed_base_g1(G1, qap.At)
        B_query_g2 = self.fixed_base_g2(G2, qap.Bt)
        B_query_g1 = self.fixed_base_g1(G1, qap.Bt)
        H_query = self.fixed_base_g1(G1, H_s)
        L_query = self.fixed_base_g1(G1, L_s)
        gamma_ABC = [G1 * s for s in gamma_ABC_s]

        pk = Groth16ProvingKey(
            alpha_g1=G1 * alpha, beta_g1=G1 * beta, beta_g2=G2 * beta,
            delta_g1=G1 * delta, delta_g2=G2 * delta,
            A_query=A_query, B_query_g2=B_query_g2, B_query_g1=B_query_g1,
            H_query=H_query, L_query=L_query,
            r1cs_dev=cs.to_device(self.fr), cs=cs)
        vk = Groth16VerificationKey(
            alpha_g1=G1 * alpha, beta_g2=G2 * beta, gamma_g2=G2 * gamma,
            delta_g2=G2 * delta, gamma_ABC=gamma_ABC)
        return Groth16Keypair(pk=pk, vk=vk)

    # -- prover ----------------------------------------------------------------------
    def prover(self, pk, primary: list, auxiliary: list,
               seed: Optional[int] = None):
        curve, r = self.curve, self.curve.r
        if seed is None:
            rnd_r = secrets.randbelow(r)
            rnd_s = secrets.randbelow(r)
        else:
            import random as _random
            rng = _random.Random(seed)
            rnd_r, rnd_s = rng.randrange(r), rng.randrange(r)

        cs = pk.cs
        dev = pk.r1cs_dev
        domain = qap_domain(self.fr, curve.fr_params, cs,
                            self.force_pow_2)
        full = [1] + [v % r for v in primary] + [v % r for v in auxiliary]
        assignment_mont = jnp.asarray(self.fr.encode(full))

        msm_c = default_window_bits(dev.num_variables + 1)

        # witness map as its own program; each MSM as a sibling program
        # (shared compile cache across queries/systems, and every compile
        # stays in the size class the compile service handles)
        wm = getattr(pk, "_wm_jit", None)
        if wm is None:
            # the CSR matrices and NTT tables are passed as jit ARGUMENT
            # pytrees: as inline literals the 2^20 HLO is hundreds of MB
            # and overflows the compile service's request limit
            def wm_fn(assign_mont, dev_arrs, dt):
                H = qap_witness_map(dev, domain, assign_mont,
                                    dev_arrs, dt)        # (N, m) mont
                H_plain = self.pad_to(
                    self.fr.from_mont(H)[..., : domain.m - 1],
                    pk.H_query[0].shape[-1])
                assign_plain = self.fr.from_mont(assign_mont)
                full = self.pad_to(assign_plain, pk.A_query[0].shape[-1])
                aux_plain = self.pad_to(
                    assign_plain[..., dev.num_inputs + 1:],
                    pk.L_query[0].shape[-1])
                return H_plain, full, aux_plain
            wm = pk._wm_jit = (jax.jit(wm_fn), dev.device_arrays(),
                               domain.device_tables())

        H_plain, full_p, aux_plain = wm[0](assignment_mont, wm[1], wm[2])
        At_a = self.msm_affine("g1", pk.A_query, full_p, msm_c)
        Bt2_a = self.msm_affine("g2", pk.B_query_g2, full_p, msm_c)
        Bt1_a = self.msm_affine("g1", pk.B_query_g1, full_p, msm_c)
        Ht_a = self.msm_affine("g1", pk.H_query, H_plain, msm_c)
        Lt_a = self.msm_affine("g1", pk.L_query, aux_plain, msm_c)

        dec1, dec2 = self.decode_g1, self.decode_g2
        At, Bt1, Ht, Lt = dec1(At_a), dec1(Bt1_a), dec1(Ht_a), dec1(Lt_a)
        Bt2 = dec2(Bt2_a)

        # final combination (a handful of host ops, tcc:583-592)
        g_A = pk.alpha_g1 + At + pk.delta_g1 * rnd_r
        g_B = pk.beta_g2 + Bt2 + pk.delta_g2 * rnd_s
        g_B1 = pk.beta_g1 + Bt1 + pk.delta_g1 * rnd_s
        g_C = (Ht + Lt + g_A * rnd_s + g_B1 * rnd_r
               - pk.delta_g1 * (rnd_r * rnd_s % r))
        return Groth16Proof(g_A=g_A, g_B=g_B, g_C=g_C)

    def prover_sharded(self, pk, primary: list, auxiliary: list, mesh,
                       axis: str, seed: Optional[int] = None,
                       msm_method: str = "pippenger"):
        """Multi-device prove: four-step distributed NTT witness map +
        point-sharded MSMs over `mesh[axis]` (the reference's OpenMP
        chunking, re-designed as SPMD; SURVEY.md section 2.9).

        msm_method="simple" swaps the local MSM for the scan-based
        double-and-add (compile-budgeted mesh validation)."""
        from ..parallel.ntt_sharded import (FourStepDomain,
                                            ShardedTwoPartDomain)
        from ..parallel.msm_sharded import sharded_msm, pad_for_mesh
        from ..ops.ntt import get_domain_size

        curve, r = self.curve, self.curve.r
        if seed is None:
            rnd_r, rnd_s = secrets.randbelow(r), secrets.randbelow(r)
        else:
            import random as _random
            rng = _random.Random(seed)
            rnd_r, rnd_s = rng.randrange(r), rng.randrange(r)

        cs, dev = pk.cs, pk.r1cs_dev
        D = mesh.devices.size
        base = qap_domain(self.fr, curve.fr_params, cs, self.force_pow_2)
        m = base.m
        if m & (m - 1) == 0:
            domain = FourStepDomain(self.fr, curve.fr_params,
                                    m.bit_length() - 1, mesh, axis)
        else:
            # reference-default natural domain selection (extended/step,
            # r1cs_to_qap.tcc:40-41): both subtransforms distribute as
            # four-step NTTs, folds/CRT partition elementwise
            domain = ShardedTwoPartDomain(
                self.fr, curve.fr_params, base.n1.bit_length() - 1,
                base.n2.bit_length() - 1, mesh, axis)
        full = [1] + [v % r for v in primary] + [v % r for v in auxiliary]
        assignment_mont = jnp.asarray(self.fr.encode(full))
        msm_c = max(4, default_window_bits(dev.num_variables + 1))

        with mesh:
            # witness map as ONE jitted program (cached per pk); eager
            # op-by-op dispatch on a mesh compiles hundreds of tiny
            # partitioned executables -- the round-1 dryrun timeout
            wm = getattr(pk, "_wm_sharded_jit", None)
            if wm is None:
                def wm_fn(assign_mont, dev_arrs, dt):
                    H = qap_witness_map(dev, domain, assign_mont,
                                        dev_arrs, dt)
                    H_plain = self.fr.from_mont(H)[..., : domain.m - 1]
                    assign_plain = self.fr.from_mont(assign_mont)
                    aux_plain = assign_plain[..., dev.num_inputs + 1:]
                    return H_plain, assign_plain, aux_plain
                wm = pk._wm_sharded_jit = (jax.jit(wm_fn),
                                           dev.device_arrays(),
                                           domain.device_tables())
            H_plain, assign_plain, aux_plain = wm[0](assignment_mont,
                                                     wm[1], wm[2])

            def smsm(mk, q, sc):
                sc = self.pad_to(sc, q[0].shape[-1])  # match query bucket
                q2, sc2 = pad_for_mesh(q, sc, D)
                return sharded_msm(mk, mesh, axis, q2, sc2, c=msm_c,
                                   affine=True, method=msm_method)

            outs = (smsm(self.msm_g1, pk.A_query, assign_plain),
                    smsm(self.msm_g2, pk.B_query_g2, assign_plain),
                    smsm(self.msm_g1, pk.B_query_g1, assign_plain),
                    smsm(self.msm_g1, pk.H_query, H_plain),
                    smsm(self.msm_g1, pk.L_query, aux_plain))

        At_a, Bt2_a, Bt1_a, Ht_a, Lt_a = outs
        dec1, dec2 = self.decode_g1, self.decode_g2
        At, Bt1, Ht, Lt = dec1(At_a), dec1(Bt1_a), dec1(Ht_a), dec1(Lt_a)
        Bt2 = dec2(Bt2_a)
        g_A = pk.alpha_g1 + At + pk.delta_g1 * rnd_r
        g_B = pk.beta_g2 + Bt2 + pk.delta_g2 * rnd_s
        g_B1 = pk.beta_g1 + Bt1 + pk.delta_g1 * rnd_s
        g_C = (Ht + Lt + g_A * rnd_s + g_B1 * rnd_r
               - pk.delta_g1 * (rnd_r * rnd_s % r))
        return Groth16Proof(g_A=g_A, g_B=g_B, g_C=g_C)

    # -- verifier -------------------------------------------------------------------------
    def verifier_strong_IC(self, vk, primary: list, proof) -> bool:
        if len(primary) + 1 != len(vk.gamma_ABC):
            return False
        return self.verifier_weak_IC(vk, primary, proof)

    def verifier_weak_IC(self, vk, primary: list, proof) -> bool:
        curve, r = self.curve, self.curve.r
        if len(primary) + 1 > len(vk.gamma_ABC):
            return False
        acc = vk.gamma_ABC[0]
        for i, x in enumerate(primary):
            acc = acc + vk.gamma_ABC[i + 1] * (x % r)
        if not (proof.g_A.is_well_formed() and proof.g_B.is_well_formed()
                and proof.g_C.is_well_formed()):
            return False
        # e(A, B) = e(alpha, beta) e(acc, gamma) e(C, delta)
        return curve.pairing_check([
            (proof.g_A, proof.g_B),
            (-vk.alpha_g1, vk.beta_g2),
            (-acc, vk.gamma_g2),
            (-proof.g_C, vk.delta_g2),
        ])

    # -- processed vk + online verifiers --------------------------------------
    # (r1cs_gg_ppzksnark_verifier_process_vk / online_verifier_*_IC,
    # reference r1cs_gg_ppzksnark.tcc:605-745: hoist the e(alpha, beta)
    # pairing and the G2 Miller-loop embeddings out of per-proof work)
    def verifier_process_vk(self, vk):
        eng = self.curve.pairing_engine
        return Groth16ProcessedVK(
            alpha_beta_gt=self.curve.pairing(vk.alpha_g1, vk.beta_g2),
            gamma_g2_precomp=eng.embed_g2(vk.gamma_g2),
            delta_g2_precomp=eng.embed_g2(vk.delta_g2),
            gamma_ABC=vk.gamma_ABC)

    def online_verifier_strong_IC(self, pvk, primary: list, proof) -> bool:
        if len(primary) + 1 != len(pvk.gamma_ABC):
            return False
        return self.online_verifier_weak_IC(pvk, primary, proof)

    def online_verifier_weak_IC(self, pvk, primary: list, proof) -> bool:
        curve, r = self.curve, self.curve.r
        eng = curve.pairing_engine
        if len(primary) + 1 > len(pvk.gamma_ABC):
            return False
        if not (proof.g_A.is_well_formed() and proof.g_B.is_well_formed()
                and proof.g_C.is_well_formed()):
            return False
        acc = pvk.gamma_ABC[0]
        for i, x in enumerate(primary):
            acc = acc + pvk.gamma_ABC[i + 1] * (x % r)
        # e(A, B) / (e(acc, gamma) e(C, delta)) == e(alpha, beta)
        f = eng.miller_loop(eng.embed_g2(proof.g_B), eng.embed_g1(proof.g_A))
        if not acc.is_zero():
            f = f * eng.miller_loop(pvk.gamma_g2_precomp,
                                    eng.embed_g1(-acc))
        if not proof.g_C.is_zero():
            f = f * eng.miller_loop(pvk.delta_g2_precomp,
                                    eng.embed_g1(-proof.g_C))
        return eng.final_exponentiation(f) == pvk.alpha_beta_gt

    def verifier_affine(self, vk, primary: list, proof) -> bool:
        """Affine-ate verifier variant (tcc:748-816). The host engine's
        Miller loop already works on affine embeddings (no projective
        line state), so this is the same computation -- kept as a
        separate entry point for API parity."""
        return self.verifier_strong_IC(vk, primary, proof)
