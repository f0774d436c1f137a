"""Deterministic satisfiable R1CS instance generators.

Behavioral parity with the reference's test-instance generators
(relations/.../examples/r1cs_examples.tcc:25 `generate_r1cs_example_with_field_input`,
:70 `_with_binary_input`): given (num_constraints, input_size), produce a
valid, satisfiable R1CS plus a witness, deterministically (no RNG state
needed for reproducible tests). The construction here is our own:
a multiplicative chain z_{j+1} = z_j * (z_{j-1} + j).
"""
from __future__ import annotations

from .r1cs import R1CSConstraintSystem
from .variable import Variable, ONE


def generate_r1cs_example(p: int, num_constraints: int, num_inputs: int):
    """Returns (cs, primary_input, auxiliary_input)."""
    assert num_inputs >= 1 and num_constraints >= num_inputs
    # variables: x_1..x_{num_inputs} primary; z_1..z_{num_constraints} aux
    num_aux = num_constraints
    cs = R1CSConstraintSystem(p, num_inputs, num_aux)
    xs = [Variable(i + 1) for i in range(num_inputs)]
    zs = [Variable(num_inputs + 1 + j) for j in range(num_aux)]

    # seed values for the chain
    vals_x = [(3 * i * i + 7 * i + 5) % p for i in range(num_inputs)]
    # constraint j: (prev2 + j) * prev1 = z_j
    aux_vals = []
    prev1_v, prev2_v = vals_x[0], (vals_x[1] if num_inputs > 1 else 1)
    prev1, prev2 = xs[0], (xs[1] if num_inputs > 1 else ONE)
    for j in range(num_aux):
        a_lc = prev2 + j
        b_lc = prev1 * 1
        zv = (prev2_v + j) * prev1_v % p
        cs.add_constraint(a_lc, b_lc, zs[j], f"chain_{j}")
        aux_vals.append(zv)
        prev2, prev2_v = prev1, prev1_v
        prev1, prev1_v = zs[j], zv
    return cs, vals_x, aux_vals


def generate_r1cs_example_with_binary_input(p: int, num_constraints: int,
                                            num_inputs: int):
    """Variant with 0/1 primary inputs (parity with
    generate_r1cs_example_with_binary_input semantics)."""
    assert num_inputs >= 1 and num_constraints >= num_inputs + 1
    num_aux = num_constraints
    cs = R1CSConstraintSystem(p, num_inputs, num_aux)
    xs = [Variable(i + 1) for i in range(num_inputs)]
    zs = [Variable(num_inputs + 1 + j) for j in range(num_aux)]
    vals_x = [(i * 7919) % 2 for i in range(num_inputs)]

    # booleanity of inputs uses the first num_inputs constraints' pattern:
    # x_i * (1 - x_i) = 0 is implied by inputs being bits; here we chain
    # products so the witness depends on every input bit.
    aux_vals = []
    prev, prev_v = ONE, 1
    for j in range(num_aux):
        x = xs[j % num_inputs]
        xv = vals_x[j % num_inputs]
        cs.add_constraint(prev + j, x + 1, zs[j], f"bchain_{j}")
        zv = (prev_v + j) * (xv + 1) % p
        aux_vals.append(zv)
        prev, prev_v = zs[j], zv
    return cs, vals_x, aux_vals
