"""MXU digit-matmul NTT (ops/ntt_mxu.py) vs the radix-2 stage core and
host oracles. Parity target: libfqfft basic_radix2_domain semantics
(same as ops/ntt.py)."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from libsnark_tpu.curves import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ntt import Radix2Domain
from libsnark_tpu.ops.ntt_mxu import MxDft


def _host_dft(xs, w, p):
    n = len(xs)
    out = []
    for k in range(n):
        acc, xp = 0, 1
        wk = pow(w, k, p)
        for j in range(n):
            acc = (acc + xs[j] * xp) % p
            xp = xp * wk % p
        out.append(acc)
    return out


@pytest.fixture(scope="module")
def bn_fr():
    cv = get_curve("alt_bn128")
    return FpKernel(cv.fr_params), cv.fr_params


@pytest.mark.parametrize("logn", [1, 3, 4, 6, 9])
@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_mxdft_matches_host_oracle(bn_fr, logn, dtype):
    fk, frp = bn_fr
    n = 1 << logn
    random.seed(logn * 7 + len(dtype))
    dom = Radix2Domain(fk, frp, logn)
    xs = [random.randrange(frp.p) for _ in range(n)]
    mx = MxDft(fk, logn, dom.omega, dtype=dtype)
    got = fk.decode(mx.apply(jnp.asarray(fk.encode(xs))))
    want = _host_dft(xs, dom.omega, frp.p)
    assert [int(v) for v in got] == want


@pytest.mark.parametrize("logn", [4, 8])
def test_mxdft_matches_fft_core_and_roundtrips(bn_fr, logn):
    fk, frp = bn_fr
    n = 1 << logn
    random.seed(13 + logn)
    dom = Radix2Domain(fk, frp, logn)
    xs = [random.randrange(frp.p) for _ in range(n)]
    a = jnp.asarray(fk.encode(xs))
    ref = fk.decode(dom.fft(a))
    got = fk.decode(dom.fft_mxu(a))
    assert [int(v) for v in got] == [int(v) for v in ref]
    # inverse (1/m folded into the final constant) roundtrips
    back = fk.decode(dom.ifft_mxu(dom.fft_mxu(a)))
    assert [int(v) for v in back] == xs


def test_mxdft_flag_routes_fft(bn_fr, monkeypatch):
    fk, frp = bn_fr
    dom = Radix2Domain(fk, frp, 5)
    random.seed(99)
    xs = [random.randrange(frp.p) for _ in range(32)]
    a = jnp.asarray(fk.encode(xs))
    ref = fk.decode(dom.ifft(dom.coset_fft(a)))
    monkeypatch.setenv("LIBSNARK_TPU_NTT_MXU", "1")
    dom2 = Radix2Domain(fk, frp, 5)
    dt = dom2.device_tables()
    assert "mxu_fwd" in dt and "mxu_inv" in dt
    got = fk.decode(dom2.ifft(dom2.coset_fft(a, dt=dt), dt=dt))
    assert [int(v) for v in got] == [int(v) for v in ref]


@pytest.mark.parametrize("curve,logn", [("bw6_761", 4), ("mnt4", 5)])
def test_mxdft_other_scalar_fields(curve, logn):
    """Wide-limb fields: BW6-761 Fr (24 limbs), MNT4 Fr (19 limbs)."""
    cv = get_curve(curve)
    frp = cv.fr_params
    fk = FpKernel(frp)
    n = 1 << logn
    random.seed(hash(curve) % 1000)
    dom = Radix2Domain(fk, frp, logn)
    xs = [random.randrange(frp.p) for _ in range(n)]
    got = fk.decode(MxDft(fk, logn, dom.omega).apply(
        jnp.asarray(fk.encode(xs))))
    assert [int(v) for v in got] == _host_dft(xs, dom.omega, frp.p)


def test_mxdft_adversarial_max_values(bn_fr):
    """All inputs = p-1 (every nibble near max) -- worst-case int32
    column accumulation in the digit matmul and mul_wide carries."""
    fk, frp = bn_fr
    dom = Radix2Domain(fk, frp, 6)
    xs = [frp.p - 1] * 64
    got = fk.decode(MxDft(fk, 6, dom.omega).apply(
        jnp.asarray(fk.encode(xs))))
    assert [int(v) for v in got] == _host_dft(xs, dom.omega, frp.p)


def test_mul_wide_random_and_extremes(bn_fr):
    """mul_wide(a, b) == a*b*2^(-16*Wa) mod p for wide a, incl. the
    all-0xFFFF extreme and broadcastable b tables."""
    fk, frp = bn_fr
    p, N = frp.p, fk.N
    random.seed(77)
    Wa = 2 * N
    cases = [random.randrange(1 << (16 * Wa)) for _ in range(3)]
    cases.append((1 << (16 * Wa)) - 1)
    bs = [random.randrange(p) for _ in cases]
    a_np = np.zeros((Wa, len(cases)), dtype=np.uint32)
    for j, v in enumerate(cases):
        for i in range(Wa):
            a_np[i, j] = (v >> (16 * i)) & 0xFFFF
    b = jnp.asarray(fk.encode(bs, mont=False))
    out = fk.decode(fk.mul_wide(jnp.asarray(a_np), b), mont=False)
    rinv = pow(1 << (16 * Wa), -1, p)
    for j, (av, bv) in enumerate(zip(cases, bs)):
        assert int(out[j]) == av * bv * rinv % p


def test_mxdft_batch_dims(bn_fr):
    """Leading batch axes transform independently along the last axis."""
    fk, frp = bn_fr
    dom = Radix2Domain(fk, frp, 4)
    random.seed(5)
    rows = [[random.randrange(frp.p) for _ in range(16)] for _ in range(3)]
    flat = jnp.asarray(fk.encode([v for r in rows for v in r]))
    batched = flat.reshape(fk.N, 3, 16)
    out = MxDft(fk, 4, dom.omega).apply(batched)
    dec = fk.decode(out)
    for i, r in enumerate(rows):
        assert [int(v) for v in dec[i]] == _host_dft(r, dom.omega, frp.p)
