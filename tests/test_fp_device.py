"""Device packed-limb Fp kernels vs the host oracle: bit-exact parity."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel


import os

# default: one 16-limb and one 24-limb field; full matrix under RUN_SLOW=1
FIELDS = [("alt_bn128", "fr"), ("bls12_377", "fq")]
if os.environ.get("RUN_SLOW"):
    FIELDS += [("alt_bn128", "fq"), ("bls12_377", "fr")]


@pytest.fixture(params=FIELDS, ids=[f"{c}.{f}" for c, f in FIELDS], scope="module")
def fk(request):
    cname, fname = request.param
    curve = get_curve(cname)
    params = curve.fr_params if fname == "fr" else curve.fq_params
    return FpKernel(params)


def sample(fk, rng, n):
    return [rng.randrange(fk.p) for _ in range(n)]


def test_encode_decode_roundtrip(fk):
    rng = random.Random(10)
    xs = sample(fk, rng, 32) + [0, 1, fk.p - 1]
    arr = jnp.asarray(fk.encode(xs))
    back = fk.decode(arr)
    assert [int(v) for v in back] == [x % fk.p for x in xs]


def test_add_sub_neg(fk):
    rng = random.Random(11)
    B = 64
    xs, ys = sample(fk, rng, B), sample(fk, rng, B)
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = fk.p - 1, fk.p - 1
    a = jnp.asarray(fk.encode(xs))
    b = jnp.asarray(fk.encode(ys))
    add = fk.decode(jax.jit(fk.add)(a, b))
    sub = fk.decode(jax.jit(fk.sub)(a, b))
    neg = fk.decode(jax.jit(fk.neg)(a))
    for i in range(B):
        assert int(add[i]) == (xs[i] + ys[i]) % fk.p
        assert int(sub[i]) == (xs[i] - ys[i]) % fk.p
        assert int(neg[i]) == (-xs[i]) % fk.p


def test_mul_parity(fk):
    rng = random.Random(12)
    B = 64
    xs, ys = sample(fk, rng, B), sample(fk, rng, B)
    xs[0], ys[0] = 0, rng.randrange(fk.p)
    xs[1], ys[1] = fk.p - 1, fk.p - 1
    xs[2], ys[2] = 1, rng.randrange(fk.p)
    a = jnp.asarray(fk.encode(xs))
    b = jnp.asarray(fk.encode(ys))
    out = fk.decode(jax.jit(fk.mul)(a, b))
    for i in range(B):
        assert int(out[i]) == xs[i] * ys[i] % fk.p, f"mul mismatch at {i}"


def test_sqr_and_mont_roundtrip(fk):
    rng = random.Random(13)
    xs = sample(fk, rng, 16)
    a = jnp.asarray(fk.encode(xs))
    sq = fk.decode(jax.jit(fk.sqr)(a))
    for i, x in enumerate(xs):
        assert int(sq[i]) == x * x % fk.p
    # to_mont(from_mont(a)) == a
    rt = jax.jit(lambda v: fk.to_mont(fk.from_mont(v)))(a)
    assert np.array_equal(np.asarray(rt), np.asarray(a))


def test_inv_and_pow(fk):
    rng = random.Random(14)
    xs = sample(fk, rng, 8)
    xs = [x if x else 1 for x in xs]
    a = jnp.asarray(fk.encode(xs))
    inv = fk.decode(jax.jit(fk.inv)(a))
    for i, x in enumerate(xs):
        assert int(inv[i]) == pow(x, -1, fk.p)
    e = rng.randrange(1, fk.p)
    pw = fk.decode(jax.jit(lambda v: fk.pow_const(v, e))(a))
    for i, x in enumerate(xs):
        assert int(pw[i]) == pow(x, e, fk.p)


def test_reduce_lazy_segment_sums(fk):
    """Lazy column sums of many Montgomery values reduce exactly."""
    rng = random.Random(15)
    K, S = 300, 4  # 300 terms per segment
    vals = [[rng.randrange(fk.p) for _ in range(K)] for _ in range(S)]
    enc = jnp.stack([jnp.asarray(fk.encode(v)) for v in vals])  # (S, N, K)

    def f(e):
        cols = jnp.sum(e, axis=-1)  # (S, N) lazy sums
        return fk.reduce_lazy(jnp.moveaxis(cols, 0, -1))  # (N, S)

    out = fk.decode(jax.jit(f)(enc))
    for s in range(S):
        assert int(out[s]) == sum(vals[s]) % fk.p


def test_mul_small(fk):
    rng = random.Random(16)
    xs = sample(fk, rng, 8)
    a = jnp.asarray(fk.encode(xs))
    for k in (0, 1, 2, 3, 12345, fk.p - 1):
        out = fk.decode(jax.jit(lambda v: fk.mul_small(v, k))(a))
        for i, x in enumerate(xs):
            assert int(out[i]) == x * k % fk.p
