"""gadgetlib2-equivalent: the reference's second circuit-authoring DSL
(reference libsnark/gadgetlib2/: protoboard.hpp:38-54, variable.hpp:31-151,
gadget.hpp:81-456, adapters.{hpp,cpp}, integration.hpp:18-21).

Where gadgetlib1 is template/index-centric (caller allocates variables on
a protoboard), gadgetlib2 is object-centric: Variables are first-class
objects bound to a board lazily, gadgets are constructed through
factories (createAndGadget, ...), and an ADAPTER converts the authored
circuit into the core R1CS consumed by the proof systems
(get_constraint_system_from_gadgetlib2 /
get_variable_assignment_from_gadgetlib2).
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Optional

from .relations.r1cs import R1CSConstraintSystem
from .relations.variable import LinearCombination as CoreLC, Variable as CoreVar


_var_ids = itertools.count(1)


class GL2Variable:
    """A first-class variable object; board-independent identity."""

    def __init__(self, name: str = ""):
        self.vid = next(_var_ids)
        self.name = name or f"v{self.vid}"

    def __add__(self, o):
        return GL2LinearCombination(self) + o

    __radd__ = __add__

    def __sub__(self, o):
        return GL2LinearCombination(self) - o

    def __rsub__(self, o):
        return -(GL2LinearCombination(self) - o)

    def __mul__(self, k):
        return GL2LinearCombination(self) * k

    __rmul__ = __mul__

    def __neg__(self):
        return GL2LinearCombination(self) * -1

    def __repr__(self):
        return self.name


class GL2VariableArray(list):
    def __init__(self, n: int, name: str = "arr"):
        super().__init__(GL2Variable(f"{name}[{i}]") for i in range(n))


class GL2LinearCombination:
    """Affine combination of GL2Variables (variable.hpp LinearCombination)."""

    def __init__(self, init=None):
        self.terms: Dict[int, int] = {}
        self.const = 0
        self._vars: Dict[int, GL2Variable] = {}
        if isinstance(init, GL2Variable):
            self.terms[init.vid] = 1
            self._vars[init.vid] = init
        elif isinstance(init, int):
            self.const = init
        elif isinstance(init, GL2LinearCombination):
            self.terms = dict(init.terms)
            self.const = init.const
            self._vars = dict(init._vars)
        elif init is not None:
            raise TypeError(type(init))

    @staticmethod
    def _coerce(o):
        if isinstance(o, GL2LinearCombination):
            return o
        return GL2LinearCombination(o)

    def __add__(self, o):
        o = self._coerce(o)
        out = GL2LinearCombination(self)
        for vid, c in o.terms.items():
            out.terms[vid] = out.terms.get(vid, 0) + c
            out._vars[vid] = o._vars[vid]
        out.const += o.const
        return out

    __radd__ = __add__

    def __sub__(self, o):
        return self + (self._coerce(o) * -1)

    def __rsub__(self, o):
        return self._coerce(o) - self

    def __neg__(self):
        return self * -1

    def __mul__(self, k: int):
        out = GL2LinearCombination()
        out.terms = {vid: c * k for vid, c in self.terms.items()}
        out._vars = dict(self._vars)
        out.const = self.const * k
        return out

    __rmul__ = __mul__


class GL2Protoboard:
    """gadgetlib2 Protoboard (create() factory parity)."""

    @classmethod
    def create(cls, p: int) -> "GL2Protoboard":
        return cls(p)

    def __init__(self, p: int):
        self.p = p
        self.values: Dict[int, int] = {}
        self.constraints: List[tuple] = []    # (a, b, c, annotation)
        self.gadgets: List["GL2Gadget"] = []
        self._inputs: List[GL2Variable] = []

    def set_public(self, variables):
        """Mark variables as the public input (ordering preserved)."""
        self._inputs.extend(variables)

    def val(self, v: GL2Variable) -> int:
        return self.values.get(v.vid, 0)

    def setval(self, v: GL2Variable, x: int):
        self.values[v.vid] = int(x) % self.p

    def add_rank1_constraint(self, a, b, c, annotation=""):
        self.constraints.append(
            (GL2LinearCombination._coerce(a),
             GL2LinearCombination._coerce(b),
             GL2LinearCombination._coerce(c), annotation))

    def enforce_booleanity(self, v):
        self.add_rank1_constraint(v, 1 - GL2LinearCombination(v), 0,
                                  f"{v} boolean")

    def eval_lc(self, lc) -> int:
        lc = GL2LinearCombination._coerce(lc)
        return (lc.const + sum(c * self.val(lc._vars[vid])
                               for vid, c in lc.terms.items())) % self.p

    def is_satisfied(self) -> bool:
        for a, b, c, _ in self.constraints:
            if (self.eval_lc(a) * self.eval_lc(b)
                    - self.eval_lc(c)) % self.p != 0:
                return False
        return True


class GL2Gadget:
    """Virtual-dispatch gadget base (gadget.hpp); subclasses implement
    init / generateConstraints / generateWitness."""

    def __init__(self, pb: GL2Protoboard):
        self.pb = pb
        pb.gadgets.append(self)

    def generateConstraints(self):
        raise NotImplementedError

    def generateWitness(self):
        raise NotImplementedError


class ANDGadget(GL2Gadget):
    def __init__(self, pb, inputs, result):
        super().__init__(pb)
        self.inputs, self.result = list(inputs), result
        self.inv = GL2Variable("and_inv")

    def generateConstraints(self):
        n = len(self.inputs)
        s = GL2LinearCombination(n)
        for x in self.inputs:
            s = s - x
        self.pb.add_rank1_constraint(self.inv, s,
                                     1 - GL2LinearCombination(self.result),
                                     "and_inv")
        self.pb.add_rank1_constraint(self.result, s, 0, "and_zero")

    def generateWitness(self):
        pb = self.pb
        s = (len(self.inputs)
             - sum(pb.val(x) for x in self.inputs)) % pb.p
        if s == 0:
            pb.setval(self.result, 1)
            pb.setval(self.inv, 0)
        else:
            pb.setval(self.result, 0)
            pb.setval(self.inv, pow(s, -1, pb.p))


class ORGadget(GL2Gadget):
    def __init__(self, pb, inputs, result):
        super().__init__(pb)
        self.inputs, self.result = list(inputs), result
        self.inv = GL2Variable("or_inv")

    def generateConstraints(self):
        s = GL2LinearCombination(0)
        for x in self.inputs:
            s = s + x
        self.pb.add_rank1_constraint(self.inv, s, self.result, "or_inv")
        self.pb.add_rank1_constraint(
            1 - GL2LinearCombination(self.result), s, 0, "or_zero")

    def generateWitness(self):
        pb = self.pb
        s = sum(pb.val(x) for x in self.inputs) % pb.p
        if s == 0:
            pb.setval(self.result, 0)
            pb.setval(self.inv, 0)
        else:
            pb.setval(self.result, 1)
            pb.setval(self.inv, pow(s, -1, pb.p))


class InnerProductGadget(GL2Gadget):
    def __init__(self, pb, A, B, result):
        super().__init__(pb)
        assert len(A) == len(B)
        self.A, self.B, self.result = list(A), list(B), result
        self.partials = [GL2Variable(f"ip_s{i}")
                         for i in range(len(A) - 1)]

    def generateConstraints(self):
        n = len(self.A)
        for i in range(n):
            out = (self.result if i == n - 1 else self.partials[i])
            c = GL2LinearCombination(out)
            if i > 0:
                c = c - self.partials[i - 1]
            self.pb.add_rank1_constraint(self.A[i], self.B[i], c,
                                         f"ip_{i}")

    def generateWitness(self):
        pb = self.pb
        total = 0
        n = len(self.A)
        for i in range(n):
            total = (total + pb.val(self.A[i]) * pb.val(self.B[i])) % pb.p
            pb.setval(self.result if i == n - 1 else self.partials[i],
                      total)


class CompressionPackingGadget(GL2Gadget):
    """bits <-> packed field element (bitpacking gadget parity)."""

    def __init__(self, pb, bits, packed):
        super().__init__(pb)
        self.bits, self.packed = list(bits), packed

    def generateConstraints(self):
        s = GL2LinearCombination(0)
        for i, b in enumerate(self.bits):
            self.pb.enforce_booleanity(b)
            s = s + GL2LinearCombination(b) * (1 << i)
        self.pb.add_rank1_constraint(1, s, self.packed, "pack")

    def generateWitness(self):
        v = 0
        for i, b in enumerate(self.bits):
            v |= (self.pb.val(b) & 1) << i
        self.pb.setval(self.packed, v)

    def generateWitnessFromPacked(self):
        v = self.pb.val(self.packed)
        for i, b in enumerate(self.bits):
            self.pb.setval(b, (v >> i) & 1)


class LooseMUXGadget(GL2Gadget):
    def __init__(self, pb, arr, index, result, success):
        super().__init__(pb)
        self.arr, self.index = list(arr), index
        self.result, self.success = result, success
        self.alpha = [GL2Variable(f"mux_a{i}") for i in range(len(arr))]
        self.ip = InnerProductGadget(pb, self.alpha, self.arr, result)

    def generateConstraints(self):
        s = GL2LinearCombination(0)
        for i, a in enumerate(self.alpha):
            self.pb.add_rank1_constraint(
                a, GL2LinearCombination(self.index) - i, 0, f"mux_{i}")
            s = s + a
        self.pb.add_rank1_constraint(1, s, self.success, "mux_sum")
        self.pb.enforce_booleanity(self.success)
        self.ip.generateConstraints()

    def generateWitness(self):
        pb = self.pb
        idx = pb.val(self.index)
        ok = idx < len(self.arr)
        for i, a in enumerate(self.alpha):
            pb.setval(a, 1 if (ok and i == idx) else 0)
        pb.setval(self.success, 1 if ok else 0)
        self.ip.generateWitness()


# ---------------------------------------------------------------- adapters

def get_constraint_system_from_gadgetlib2(pb: GL2Protoboard):
    """Convert an authored GL2 circuit to the core R1CS
    (integration.hpp:18 parity). Public-input variables come first."""
    order: Dict[int, int] = {}
    ordered_vars: List[GL2Variable] = []

    def visit(v: GL2Variable):
        if v.vid not in order:
            order[v.vid] = len(ordered_vars) + 1     # index 0 = constant
            ordered_vars.append(v)

    for v in pb._inputs:
        visit(v)
    for a, b, c, _ in pb.constraints:
        for lc in (a, b, c):
            for vid in lc.terms:
                visit(lc._vars[vid])

    def conv(lc: GL2LinearCombination) -> CoreLC:
        out = CoreLC(lc.const)
        for vid, coeff in lc.terms.items():
            out = out + CoreVar(order[vid]) * coeff
        return out

    cs = R1CSConstraintSystem(
        pb.p, primary_input_size=len(pb._inputs),
        auxiliary_input_size=len(ordered_vars) - len(pb._inputs))
    for a, b, c, ann in pb.constraints:
        cs.add_constraint(conv(a), conv(b), conv(c), ann)
    return cs, ordered_vars


def get_variable_assignment_from_gadgetlib2(pb: GL2Protoboard,
                                            ordered_vars) -> list:
    """Full assignment in adapter order (integration.hpp:21 parity)."""
    return [pb.val(v) for v in ordered_vars]
