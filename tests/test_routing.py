"""Routing networks: route random permutations, simulate, verify.

(The reference cross-checks C++ against a Python model,
common/routing_algorithms/tests/; here the property test IS the check.)
"""
import random

import pytest

from libsnark_tpu.common.integer_permutation import IntegerPermutation
from libsnark_tpu.common.routing import (
    BenesNetwork, ASWaksmanNetwork)


def test_integer_permutation_basics():
    p = IntegerPermutation(5)
    assert p.is_valid()
    p.random_shuffle(random.Random(1))
    assert p.is_valid()
    inv = p.inverse()
    for i in range(5):
        assert inv.get(p.get(i)) == i
    q = IntegerPermutation([2, 0, 1])
    assert q.is_valid()
    assert not IntegerPermutation([0, 0, 2]).is_valid()


@pytest.mark.parametrize("n", [2, 4, 8, 16, 32])
def test_benes_routes_all(n):
    rng = random.Random(n)
    net = BenesNetwork(n)
    for trial in range(10):
        perm = IntegerPermutation(n)
        perm.random_shuffle(rng)
        settings = net.route(perm)
        out = net.simulate(settings, list(range(n)))
        got = [out[perm.get(i)] for i in range(n)]
        assert all(out[perm.get(i)] == i for i in range(n)), \
            f"n={n} trial={trial}: {perm.contents} -> {out}"


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 7, 8, 9, 13, 16, 33])
def test_as_waksman_routes_all(n):
    rng = random.Random(100 + n)
    net = ASWaksmanNetwork(n)
    for trial in range(10):
        perm = IntegerPermutation(n)
        perm.random_shuffle(rng)
        settings = net.route(perm)
        out = net.simulate(settings, list(range(n)))
        assert all(out[perm.get(i)] == i for i in range(n)), \
            f"n={n} trial={trial}: {perm.contents} -> {out}"


def test_identity_and_reverse():
    for n in (4, 7, 8):
        net = ASWaksmanNetwork(n)
        ident = IntegerPermutation(n)
        s = net.route(ident)
        assert net.simulate(s, list(range(n))) == list(range(n))
        rev = IntegerPermutation(list(reversed(range(n))))
        s = net.route(rev)
        out = net.simulate(s, list(range(n)))
        assert all(out[rev.get(i)] == i for i in range(n))
