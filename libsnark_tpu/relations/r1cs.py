"""Rank-1 constraint systems (reference relations/constraint_satisfaction_problems/r1cs).

Host authoring class mirroring r1cs_constraint_system
(r1cs.hpp:50,114,134) -- including swap_AB_if_beneficial (r1cs.tcc:198-242)
and satisfaction checks -- plus compilation to a device-side CSR form where
witness evaluation <A_j, s> is a batched sparse matvec: gather + Montgomery
mul + segment-sum + lazy reduction (the TPU replacement for the reference's
per-constraint dot-product loop, r1cs_to_qap.tcc:240-248).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .variable import LinearCombination, LinearTerm


class R1CSConstraint:
    __slots__ = ("a", "b", "c", "annotation")

    def __init__(self, a, b, c, annotation: str = ""):
        self.a = LinearCombination._coerce(a)
        self.b = LinearCombination._coerce(b)
        self.c = LinearCombination._coerce(c)
        self.annotation = annotation

    def __repr__(self):
        return f"<{self.a}> * <{self.b}> = <{self.c}>"


class R1CSConstraintSystem:
    """Constraint system over scalar field of prime order p."""

    def __init__(self, p: int, primary_input_size: int = 0,
                 auxiliary_input_size: int = 0):
        self.p = p
        self.primary_input_size = primary_input_size
        self.auxiliary_input_size = auxiliary_input_size
        self.constraints: List[R1CSConstraint] = []

    # -- libsnark API parity ---------------------------------------------------
    @property
    def num_inputs(self):
        return self.primary_input_size

    @property
    def num_variables(self):
        return self.primary_input_size + self.auxiliary_input_size

    @property
    def num_constraints(self):
        return len(self.constraints)

    def add_constraint(self, a, b, c, annotation: str = ""):
        self.constraints.append(R1CSConstraint(a, b, c, annotation))

    def is_valid(self) -> bool:
        nv = self.num_variables
        return all(c.a.is_valid(nv) and c.b.is_valid(nv) and c.c.is_valid(nv)
                   for c in self.constraints)

    def is_satisfied(self, primary: list, auxiliary: list) -> bool:
        full = [1] + [v % self.p for v in primary] + [v % self.p for v in auxiliary]
        for i, c in enumerate(self.constraints):
            if (c.a.evaluate(full, self.p) * c.b.evaluate(full, self.p)
                    - c.c.evaluate(full, self.p)) % self.p != 0:
                return False
        return True

    def swap_AB_if_beneficial(self):
        """Swap A<->B when B is denser in non-input variables (the reference
        heuristic reduces prover G2 work since the B query is the G2 MSM)."""
        a_nz, b_nz = set(), set()
        for c in self.constraints:
            for t in c.a.terms:
                if t.index > self.primary_input_size:
                    a_nz.add(t.index)
            for t in c.b.terms:
                if t.index > self.primary_input_size:
                    b_nz.add(t.index)
        if len(b_nz) > len(a_nz):
            for c in self.constraints:
                c.a, c.b = c.b, c.a
            return True
        return False

    # -- device compilation ----------------------------------------------------------
    def to_device(self, fr_kernel):
        return R1CSDevice.build(self, fr_kernel)

    def __eq__(self, o):
        if not isinstance(o, R1CSConstraintSystem):
            return NotImplemented
        def norm(cs):
            return [[sorted((t.index, t.coeff % cs.p) for t in lc.compact(cs.p).terms)
                     for lc in (c.a, c.b, c.c)] for c in cs.constraints]
        return (self.p == o.p
                and self.primary_input_size == o.primary_input_size
                and self.auxiliary_input_size == o.auxiliary_input_size
                and norm(self) == norm(o))


@dataclasses.dataclass
class SparseMatrix:
    """COO sparse matrix of field coefficients for the device."""
    rows: np.ndarray        # (nnz,) int32 constraint indices
    cols: np.ndarray        # (nnz,) int32 variable indices
    coeffs: np.ndarray      # (N, nnz) uint32 Montgomery limbs
    num_rows: int
    num_cols: int

    def device_arrays(self):
        """Matrix data as a pytree of device arrays -- pass through a
        jit boundary so the (large) integer tables become executable
        PARAMETERS instead of inline HLO literals (at 2^20 the literal
        form overflows the compile service's request-size limit)."""
        import jax.numpy as jnp
        return {"rows": jnp.asarray(self.rows),
                "cols": jnp.asarray(self.cols),
                "coeffs": jnp.asarray(self.coeffs)}

    def evaluate(self, fk, assignment, num_segments: int, arrs=None):
        """<M_j, s> for all rows j.

        assignment: (N, num_vars+1) device Montgomery limbs (index 0 = 1).
        arrs: optional device_arrays() pytree (traced arguments).
        Returns (N, num_segments) Montgomery values.
        """
        import jax
        import jax.numpy as jnp
        if arrs is None:
            arrs = self.device_arrays()
        vals = jnp.take(assignment, arrs["cols"], axis=-1)
        prod = fk.mul(vals, arrs["coeffs"])               # (N, nnz)
        sums = jax.ops.segment_sum(jnp.moveaxis(prod, -1, 0),
                                   arrs["rows"],
                                   num_segments=num_segments)  # (S, N)
        return fk.reduce_lazy(jnp.moveaxis(sums, 0, -1))


@dataclasses.dataclass
class R1CSDevice:
    """Device-ready CSR form of an R1CS."""
    A: SparseMatrix
    B: SparseMatrix
    C: SparseMatrix
    num_constraints: int
    num_inputs: int
    num_variables: int
    p: int

    @classmethod
    def build(cls, cs: R1CSConstraintSystem, fk):
        def mat(select):
            rows, cols, coefs = [], [], []
            for j, con in enumerate(cs.constraints):
                lc = select(con).compact(cs.p)
                for t in lc.terms:
                    rows.append(j)
                    cols.append(t.index)
                    coefs.append(t.coeff)
            if not rows:  # keep shapes non-empty
                rows, cols, coefs = [0], [0], [0]
            return SparseMatrix(
                rows=np.asarray(rows, np.int32),
                cols=np.asarray(cols, np.int32),
                coeffs=fk.encode(coefs),
                num_rows=cs.num_constraints,
                num_cols=cs.num_variables + 1)
        return cls(A=mat(lambda c: c.a), B=mat(lambda c: c.b),
                   C=mat(lambda c: c.c),
                   num_constraints=cs.num_constraints,
                   num_inputs=cs.num_inputs,
                   num_variables=cs.num_variables, p=cs.p)

    def device_arrays(self):
        """All three matrices as a jit-argument pytree."""
        return {"A": self.A.device_arrays(), "B": self.B.device_arrays(),
                "C": self.C.device_arrays()}
