"""KZG10 polynomial commitments (reference polynomial_commitments/kzg10.{hpp,tcc}).

API parity: srs / setup / setup_from_secret / commit /
create_evaluation_witness / verify_evaluation / verify_poly
(kzg10.hpp:30; commit via MSM kzg10.tcc:81-84; verify = 2 pairings
tcc:149-182).

TPU re-design: ``commit`` is a Pippenger MSM over the alpha-power SRS;
``create_evaluation_witness`` avoids the reference's sequential synthetic
division -- the quotient q(x) = (phi(x) - phi(z)) / (x - z) is produced by
coset-evaluating phi, dividing pointwise by (g w^i - z) (batched Fermat
inversion), and interpolating back: two NTTs instead of an O(n) serial
recurrence.
"""
from __future__ import annotations

import dataclasses
import secrets
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fp import FpKernel
from ..ops.ec import CurveKernel
from ..ops.msm import MSMKernel, default_window_bits
from ..ops.ntt import Radix2Domain, get_domain_size, batch_inverse
from ..ops.limbs import ints_to_limbs


@dataclasses.dataclass
class KZG10SRS:
    """Structured reference string: [alpha^i]_1 for i <= degree, [alpha]_2."""
    alpha_powers_g1: tuple       # device affine (x, y, inf), len degree+1
    alpha_g2: object             # host G2 point
    degree: int


@dataclasses.dataclass
class KZG10Commitment:
    point: object                # host G1


class KZG10:
    def __init__(self, curve):
        self.curve = curve
        self.fr = FpKernel(curve.fr_params)
        self.fq = FpKernel(curve.fq_params)
        self.g1 = CurveKernel(self.fq, f"{curve.name}.G1")
        self.msm = MSMKernel(self.g1, curve.r.bit_length())
        self.scalar_limbs = -(-curve.r.bit_length() // 16)

    # -- setup -----------------------------------------------------------------
    def setup(self, degree: int, seed: Optional[int] = None):
        r = self.curve.r
        if seed is None:
            alpha = secrets.randbelow(r - 2) + 2
        else:
            import random as _random
            alpha = _random.Random(seed).randrange(2, r)
        return self.setup_from_secret(degree, alpha)

    def setup_from_secret(self, degree: int, alpha: int):
        r = self.curve.r
        powers = [1] * (degree + 1)
        for i in range(1, degree + 1):
            powers[i] = powers[i - 1] * alpha % r
        c = 8
        W = -(-r.bit_length() // c)
        ck = self.g1
        baff = ck.encode_points([self.curve.G1.one()], jacobian=False)

        @jax.jit
        def build(bx, by, sc):
            table = self.msm.window_table((bx, by), c, W)
            taff = ck.to_affine(table)
            return ck.to_affine(self.msm.batch_exp(taff, sc, c))

        powers += [0] * (self._bucket(len(powers)) - len(powers))
        sc = jnp.asarray(ints_to_limbs(powers, self.scalar_limbs))
        g1_powers = build(baff[0], baff[1], sc)
        return KZG10SRS(alpha_powers_g1=g1_powers,
                        alpha_g2=self.curve.G2.one() * alpha,
                        degree=degree)

    # -- commit ----------------------------------------------------------------
    @staticmethod
    def _bucket(n: int) -> int:
        """Power-of-two shape bucket so XLA executables are shared across
        polynomial degrees (pad scalars with zeros / points with inf)."""
        return max(16, 1 << max(0, n - 1).bit_length())

    def commit(self, srs: KZG10SRS, coeffs: List[int]):
        """coeffs: host ints, length <= degree+1."""
        n = len(coeffs)
        assert n <= srs.degree + 1
        nb = min(self._bucket(n), srs.alpha_powers_g1[0].shape[-1])
        padded = [c % self.curve.r for c in coeffs] + [0] * (nb - n)
        sc = jnp.asarray(ints_to_limbs(padded, self.scalar_limbs))
        pts = tuple(a[..., :nb] for a in srs.alpha_powers_g1)
        import os
        eager = os.environ.get("LIBSNARK_TPU_MSM_EAGER", "auto")
        if eager != "0" and (eager == "1" or nb > (1 << 21)):
            # 2^22-class scan programs are a v5e worker-crash risk
            # (see MSMKernel.msm_eager_segmented); host-loop segments
            out = self.msm.msm_eager_segmented(
                pts, sc, default_window_bits(nb))
        else:
            out = jax.jit(
                lambda p, s: self.msm.msm(p, s, default_window_bits(nb))
            )(pts, sc)
        return KZG10Commitment(self.g1.decode_points(out, self.curve.G1)[0])

    # -- evaluation + witness ------------------------------------------------------
    @staticmethod
    def evaluate_polynomial(coeffs: List[int], z: int, r: int) -> int:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * z + c) % r
        return acc

    def create_evaluation_witness(self, srs, coeffs: List[int], z: int):
        """Returns (eval_value, witness_commitment)."""
        r = self.curve.r
        v = self.evaluate_polynomial(coeffs, z, r)
        n = len(coeffs)
        if n <= 1:
            return v, KZG10Commitment(self.curve.G1.zero())
        # quotient via coset evaluate / divide / interpolate
        m = get_domain_size(n)
        dom = Radix2Domain(self.fr, self.curve.fr_params, m.bit_length() - 1)
        g = dom.generator
        # denominators (g w^i - z), batch-inverted host-side (cheap: O(m) muls)
        xs = [g * w % r for w in dom.domain_elements()]
        dinv = batch_inverse([(x - z) % r for x in xs], r)
        cs = coeffs + [0] * (m - n)
        a = jnp.asarray(self.fr.encode(cs))
        dinv_dev = jnp.asarray(self.fr.encode(dinv))
        v_enc = jnp.asarray(self.fr.encode([v] * m))
        # twiddle/coset tables as jit ARGUMENTS: inline literals at
        # 2^22 are hundreds of MB of HLO and break the remote compile
        # service (r5; same fix as the Groth16 witness map)
        dt = dom.device_tables()

        @jax.jit
        def quotient(a, dinv_dev, v_enc, dt):
            evals = dom.coset_fft(a, dt=dt)
            q_evals = self.fr.mul(self.fr.sub(evals, v_enc), dinv_dev)
            return self.fr.from_mont(dom.icoset_fft(q_evals, dt=dt))

        q_plain = quotient(a, dinv_dev, v_enc, dt)  # (N, m), deg <= n-2
        nq = n - 1
        nb = min(self._bucket(nq), srs.alpha_powers_g1[0].shape[-1])
        pts = tuple(arr[..., :nb] for arr in srs.alpha_powers_g1)
        sc = q_plain[..., :nq]
        if nb > nq:
            sc = jnp.pad(sc, [(0, 0)] * (sc.ndim - 1) + [(0, nb - nq)])
        import os
        eager = os.environ.get("LIBSNARK_TPU_MSM_EAGER", "auto")
        if eager != "0" and (eager == "1" or nb > (1 << 21)):
            out = self.msm.msm_eager_segmented(
                pts, sc, default_window_bits(nb))
        else:
            out = jax.jit(
                lambda p, s: self.msm.msm(p, s, default_window_bits(nb))
            )(pts, sc)
        return v, KZG10Commitment(self.g1.decode_points(out, self.curve.G1)[0])

    # -- verification -----------------------------------------------------------------
    def verify_evaluation(self, srs, commitment, z: int, value: int,
                          witness) -> bool:
        """e(C - [v]_1, [1]_2) == e(W, [alpha - z]_2)."""
        curve = self.curve
        C = commitment.point - curve.G1.one() * value
        S = srs.alpha_g2 - curve.G2.one() * (z % curve.r)
        return curve.pairing_check([(C, -curve.G2.one()), (witness.point, S)])

    def verify_poly(self, srs, commitment, coeffs: List[int]) -> bool:
        return self.commit(srs, coeffs).point == commitment.point
