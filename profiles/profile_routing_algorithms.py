"""Routing-algorithm profiling (reference
profile_routing_algorithms.cpp): Benes + AS-Waksman routing time vs
network size on random permutations, with simulate-correctness checks."""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libsnark_tpu.common.integer_permutation import IntegerPermutation
from libsnark_tpu.common.routing import (
    BenesNetwork, ASWaksmanNetwork, benes_num_columns)

if __name__ == "__main__":
    max_log = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = random.Random(1)
    for logn in range(2, max_log + 1):
        n = 1 << logn
        perm = list(range(n))
        rng.shuffle(perm)
        ip = IntegerPermutation(perm)
        bn = BenesNetwork(n)
        t0 = time.monotonic()
        rb = bn.route(ip)
        tb = time.monotonic() - t0
        wn = ASWaksmanNetwork(n)
        t0 = time.monotonic()
        rw = wn.route(ip)
        tw = time.monotonic() - t0
        pkts = list(range(n))
        outb = bn.simulate(rb, pkts)
        outw = wn.simulate(rw, pkts)
        expect = [None] * n
        for i in range(n):
            expect[ip.get(i)] = i
        assert outb == expect and outw == expect, f"misroute at n={n}"
        print(f"n=2^{logn:2d}  benes[{benes_num_columns(n)} cols] "
              f"{tb*1e3:8.2f}ms   as-waksman {tw*1e3:8.2f}ms", flush=True)
