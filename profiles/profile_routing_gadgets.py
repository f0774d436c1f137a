"""Routing-GADGET profiling harness (reference
gadgetlib1/gadgets/routing/profiling/profile_routing_gadgets.cpp):
constraint counts + witness-generation time for Benes and AS-Waksman
routing networks over a range of sizes. Host-only (circuit layer).

usage: profile_routing_gadgets.py [max_log2_size] (default 5)
"""
import random
import sys

from _common import Timed

if __name__ == "__main__":
    max_l = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from libsnark_tpu.common.integer_permutation import IntegerPermutation
    from libsnark_tpu.gadgets.protoboard import (Protoboard,
                                                 PBVariableArray)
    from libsnark_tpu.gadgets.routing_gadgets import (
        BenesRoutingGadget, ASWaksmanRoutingGadget)

    p = (1 << 61) - 1
    rng = random.Random(5)
    w = 4                     # packet width (field elements)
    for l in range(2, max_l + 1):
        n = 1 << l
        perm = IntegerPermutation(n)
        perm.random_shuffle(rng)
        for name, cls in (("benes", BenesRoutingGadget),
                          ("as_waksman", ASWaksmanRoutingGadget)):
            pb = Protoboard(p)
            ins = [PBVariableArray().allocate(pb, w, f"in{i}")
                   for i in range(n)]
            outs = [PBVariableArray().allocate(pb, w, f"out{i}")
                    for i in range(n)]
            g = cls(pb, ins, outs, f"{name}_{n}")
            with Timed(f"{name} n={n}: constraints"):
                g.generate_r1cs_constraints()
            nc = len(pb.get_constraint_system().constraints)
            vals = [[rng.randrange(p) for _ in range(w)]
                    for _ in range(n)]
            for pkt, v in zip(ins, vals):
                for var, x in zip(pkt, v):
                    pb.setval(var, x)
            with Timed(f"{name} n={n}: witness"):
                g.generate_r1cs_witness(perm)
            ok = pb.first_unsatisfied() is None
            routed = all(
                [pb.val(v) for v in outs[perm.get(i)]] == vals[i]
                for i in range(n))
            print(f"{name} n={n}: {nc} constraints, satisfied={ok}, "
                  f"routed={routed}", flush=True)
            assert ok and routed
