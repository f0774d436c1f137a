"""Round-trip tests for GM17 / BCTV14 / DFGK14 / BACS / TBCS proof systems.

Mirrors the reference's run_* harnesses (examples/run_r1cs_se_ppzksnark.tcc
etc.): generator -> prover -> verifier accepts; corrupted input rejected.
"""
import pytest

from libsnark_tpu.relations.examples import (
    generate_r1cs_example, generate_uscs_example, generate_bacs_example,
    generate_tbcs_example)


def test_sap_reduction_satisfied(bn254):
    """SAP instance evaluation + witness map consistency at a random t."""
    import numpy as np
    from libsnark_tpu.ops.fp import FpKernel
    from libsnark_tpu.reductions.r1cs_to_sap import (
        sap_domain, sap_instance_map_with_evaluation, SAPDevice,
        sap_extend_assignment, sap_witness_map)
    from libsnark_tpu.relations.arithmetic_programs import (
        SAPWitness, sap_eval_is_satisfied)
    import jax.numpy as jnp

    curve = bn254
    p = curve.r
    cs, primary, aux = generate_r1cs_example(p, 10, 2)
    fr = FpKernel(curve.fr_params)
    domain = sap_domain(fr, curve.fr_params, cs)
    t = 0xDEADBEEF1234567
    sap = sap_instance_map_with_evaluation(cs, domain, t)

    dev = SAPDevice.build(cs, fr)
    full = [1] + primary + aux
    am = jnp.asarray(fr.encode(full))
    ext = sap_extend_assignment(dev, fr, am)
    d1, d2 = 12345, 67890
    H = sap_witness_map(dev, domain, ext,
                        jnp.asarray(fr.encode([d1])),
                        jnp.asarray(fr.encode([d2])))
    H_vals = [int(v) for v in fr.decode(H)]
    ext_vals = [int(v) for v in fr.decode(ext)]
    wit = SAPWitness(d1=d1, d2=d2, num_inputs=cs.num_inputs,
                     num_variables=dev.sap_num_variables,
                     degree=domain.m,
                     coefficients_for_ACs=ext_vals[1:],
                     coefficients_for_H=H_vals)
    assert sap_eval_is_satisfied(sap, wit, p)


def test_ssp_reduction_satisfied(bn254):
    from libsnark_tpu.ops.fp import FpKernel
    from libsnark_tpu.reductions.uscs_to_ssp import (
        ssp_domain, ssp_instance_map_with_evaluation, SSPDevice,
        ssp_witness_map)
    from libsnark_tpu.relations.arithmetic_programs import (
        SSPWitness, ssp_eval_is_satisfied)
    import jax.numpy as jnp

    curve = bn254
    p = curve.r
    cs, primary, aux = generate_uscs_example(p, 12, 3)
    fr = FpKernel(curve.fr_params)
    domain = ssp_domain(fr, curve.fr_params, cs)
    ssp = ssp_instance_map_with_evaluation(cs, domain, 0xABCDEF987)
    dev = SSPDevice.build(cs, fr, domain.m)
    full = [1] + primary + aux
    am = jnp.asarray(fr.encode(full))
    d = 424242
    H = ssp_witness_map(dev, domain, am, jnp.asarray(fr.encode([d])))
    H_vals = [int(v) for v in fr.decode(H)]
    # Vt in the instance evaluation has nv+1 entries; the witness check
    # uses them directly
    wit = SSPWitness(d=d, num_inputs=cs.num_inputs,
                     num_variables=cs.num_variables, degree=domain.m,
                     coefficients_for_Vs=(primary + aux),
                     coefficients_for_H=H_vals)
    assert ssp_eval_is_satisfied(ssp, wit, p)


def test_gm17_round_trip(bn254):
    from libsnark_tpu.proof_systems.gm17 import GM17
    gm = GM17(bn254)
    cs, primary, aux = generate_r1cs_example(bn254.r, 8, 2)
    kp = gm.generator(cs, seed=11)
    proof = gm.prover(kp.pk, primary, aux, seed=22)
    assert gm.verifier_strong_IC(kp.vk, primary, proof)
    bad = [ (primary[0] + 1) % bn254.r ] + primary[1:]
    assert not gm.verifier_strong_IC(kp.vk, bad, proof)


def test_bctv14_round_trip(bn254):
    from libsnark_tpu.proof_systems.bctv14 import BCTV14
    ps = BCTV14(bn254)
    cs, primary, aux = generate_r1cs_example(bn254.r, 8, 2)
    kp = ps.generator(cs, seed=33)
    proof = ps.prover(kp.pk, primary, aux, seed=44)
    assert ps.verifier_strong_IC(kp.vk, primary, proof)
    bad = [(primary[0] + 1) % bn254.r] + primary[1:]
    assert not ps.verifier_strong_IC(kp.vk, bad, proof)


def test_dfgk14_round_trip(bn254):
    from libsnark_tpu.proof_systems.dfgk14 import DFGK14
    ps = DFGK14(bn254)
    cs, primary, aux = generate_uscs_example(bn254.r, 10, 2)
    kp = ps.generator(cs, seed=55)
    proof = ps.prover(kp.pk, primary, aux, seed=66)
    assert ps.verifier_strong_IC(kp.vk, primary, proof)
    bad = [(primary[0] + 1) % bn254.r] + primary[1:]
    assert not ps.verifier_strong_IC(kp.vk, bad, proof)


def test_bacs_round_trip(bn254):
    from libsnark_tpu.proof_systems.bacs_ppzksnark import BACSPpzksnark
    ps = BACSPpzksnark(bn254)
    circuit, primary, aux = generate_bacs_example(bn254.r, 8, 2)
    kp = ps.bacs_generator(circuit, seed=77)
    proof = ps.bacs_prover(kp.pk, primary, aux, seed=88)
    assert ps.verifier_strong_IC(kp.vk, primary, proof)


def test_tbcs_round_trip(bn254):
    from libsnark_tpu.proof_systems.tbcs_ppzksnark import TBCSPpzksnark
    ps = TBCSPpzksnark(bn254)
    circuit, bits, aux = generate_tbcs_example(8, 2)
    kp = ps.tbcs_generator(circuit, seed=99)
    proof = ps.tbcs_prover(kp.pk, bits, aux, seed=111)
    assert ps.tbcs_verifier_strong_IC(kp.vk, bits, proof)
