"""Multi-device NTT: Bailey four-step factorization over a device mesh.

The "sequence-parallel" analogue for zkSNARKs (SURVEY.md section 5): QAP
degree m = n1*n2 is factored; the domain-size-m transform becomes
  1) n2 independent length-n1 NTTs   (local: shard the n2 axis),
  2) twiddle multiply by w^(k1*j2)    (local, elementwise),
  3) reshard (n2-sharded -> n1-sharded): XLA all-to-all over ICI,
  4) n1 independent length-n2 NTTs   (local),
  5) transpose to natural order.

Data never leaves the device mesh; the single all-to-all is the only
communication, matching the NTT-stage-exchange design in BASELINE.json.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ntt import Radix2Domain
from ..ops.domains import TwoPartDomain
from ..ops.limbs import ints_to_limbs


class FourStepDomain:
    """Distributed evaluation domain of size m = 2^logm = n1 * n2."""

    def __init__(self, fr_kernel, params, logm: int, mesh: Mesh, axis: str):
        self.fk = fr_kernel
        self.params = params
        self.logm = logm
        self.m = 1 << logm
        self.mesh = mesh
        self.axis = axis
        log1 = logm // 2
        self.n1 = 1 << log1
        self.n2 = 1 << (logm - log1)
        self.dom1 = Radix2Domain(fr_kernel, params, log1)
        self.dom2 = Radix2Domain(fr_kernel, params, logm - log1)
        self.p = params.p
        self.omega = pow(params.root_of_unity,
                         1 << (params.two_adicity - logm), self.p)
        self.omega_inv = pow(self.omega, -1, self.p)
        self.generator = params.multiplicative_generator
        self._tw = self._twiddle_matrix(self.omega)
        self._tw_inv = self._twiddle_matrix(self.omega_inv)

    def _twiddle_matrix(self, w):
        """(N, n1, n2) Montgomery table of w^(k1*j2)."""
        p, R = self.p, self.params.R
        rows = []
        wk1 = 1
        vals = np.empty((self.n1, self.n2), dtype=object)
        for k1 in range(self.n1):
            v = 1
            for j2 in range(self.n2):
                vals[k1, j2] = v * R % p
                v = v * wk1 % p
            wk1 = wk1 * w % p
        flat = ints_to_limbs(list(vals.reshape(-1)), self.fk.N)
        return flat.reshape(self.fk.N, self.n1, self.n2)

    # ------------------------------------------------------------------ core
    def _constraint(self, arr, spec):
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(self.mesh, spec))

    def _fft_along(self, dom, A, axis_idx):
        """Apply dom's fft on the given axis of (N, n1, n2). Routed
        through dom.fft so LIBSNARK_TPU_NTT_MXU=1 turns the local
        transforms into MXU digit matmuls (the all-to-all exchange is
        unchanged)."""
        Am = jnp.swapaxes(A, axis_idx, -1)
        out = dom.fft(Am)
        return jnp.swapaxes(out, axis_idx, -1)

    def _ifft_along(self, dom, A, axis_idx):
        Am = jnp.swapaxes(A, axis_idx, -1)
        out = dom.ifft(Am)
        return jnp.swapaxes(out, axis_idx, -1)

    def _four_step(self, a, fwd: bool):
        fk = self.fk
        N, n1, n2 = fk.N, self.n1, self.n2
        lead = a.shape[1:-1]        # extra batch dims between limbs and m
        nl = len(lead)
        # domains smaller than the mesh (n1 or n2 not divisible by D)
        # fall back to replicated compute on the affected steps -- the
        # transform is still correct, just not distributed
        D = self.mesh.shape[self.axis]
        pre = (None,) * (1 + nl)
        shard_n2 = (P(*pre, None, self.axis) if n2 % D == 0 else P())
        shard_n1 = (P(*pre, self.axis, None) if n1 % D == 0 else P())
        A = a.reshape((N,) + lead + (n1, n2))
        A = self._constraint(A, shard_n2)
        # step 1: length-n1 NTTs along axis -2 (local under n2 sharding)
        A = (self._fft_along(self.dom1, A, -2) if fwd
             else self._ifft_along(self.dom1, A, -2))
        # step 2: twiddle (local)
        tw = jnp.asarray(self._tw if fwd else self._tw_inv)
        tw = tw.reshape((N,) + (1,) * nl + (n1, n2))
        A = fk.mul(A, jnp.broadcast_to(tw, A.shape))
        A = self._constraint(A, shard_n2)
        # step 3: reshard (the all-to-all) then length-n2 NTTs along axis -1
        A = self._constraint(A, shard_n1)
        A = (self._fft_along(self.dom2, A, -1) if fwd
             else self._ifft_along(self.dom2, A, -1))
        # step 4: transpose to natural order k = k2*n1 + k1
        out = jnp.swapaxes(A, -2, -1).reshape((N,) + lead + (self.m,))
        return self._constraint(
            out, P(*pre, self.axis) if self.m % D == 0 else P())

    def fft(self, a, dt=None):
        return self._four_step(a, fwd=True)

    def ifft(self, a, dt=None):
        return self._four_step(a, fwd=False)

    def device_tables(self):
        """Signature parity with Radix2Domain (twiddles are member
        arrays here; nothing to thread as jit arguments)."""
        return None

    # -- coset variants (same surface as Radix2Domain; the dt pytree is
    # accepted for signature parity and ignored -- four-step tables are
    # small at dryrun scale) --------------------------------------------------
    def _mul_by_powers(self, a, g: int):
        fk = self.fk
        pw = [1] * self.m
        for i in range(1, self.m):
            pw[i] = pw[i - 1] * g % self.p
        tbl = jnp.asarray(ints_to_limbs(
            [v * self.params.R % self.p for v in pw], fk.N))
        tbl = tbl.reshape((fk.N,) + (1,) * (a.ndim - 2) + (self.m,))
        return fk.mul(a, jnp.broadcast_to(tbl, a.shape))

    def coset_fft(self, a, g: int = None, dt=None):
        g = self.generator if g is None else g
        return self.fft(self._mul_by_powers(a, g))

    def icoset_fft(self, a, g: int = None, dt=None):
        g = self.generator if g is None else g
        return self._mul_by_powers(self.ifft(a), pow(g, -1, self.p))

    def divide_by_z_on_coset(self, a, g: int = None):
        g = self.generator if g is None else g
        zi = pow((pow(g, self.m, self.p) - 1) % self.p, -1, self.p)
        return self.fk.mul_small(a, zi)

    def icoset_fft_divz(self, a, dt=None):
        """Same surface as Radix2Domain.icoset_fft_divz (the witness
        map calls it on whichever domain it is handed)."""
        return self.icoset_fft(self.divide_by_z_on_coset(a), dt=dt)

    def vanishing_eval(self, t: int) -> int:
        return (pow(t, self.m, self.p) - 1) % self.p

    def lagrange_coeffs_at(self, t: int):
        tmp = Radix2Domain(self.fk, self.params, self.logm)
        return tmp.lagrange_coeffs_at(t)

    def domain_elements(self):
        out = [1] * self.m
        for i in range(1, self.m):
            out[i] = out[i - 1] * self.omega % self.p
        return out


class ShardedTwoPartDomain(TwoPartDomain):
    """Distributed extended/step domain (VERDICT r3 item 5): the
    TwoPartDomain's two radix-2 subtransforms become four-step
    distributed NTTs over the mesh; the binomial folds and the CRT lift
    are elementwise / chunk-sum ops that XLA partitions under the same
    sharding. This lets ``prover_sharded`` run the reference-DEFAULT
    domain selection (libfqfft get_evaluation_domain,
    r1cs_to_qap.tcc:40-41) instead of requiring force_pow_2.

    Parts smaller than 2 * mesh size stay replicated (FourStepDomain
    falls back internally when a factor is not divisible by D)."""

    def __init__(self, fk, params, log1: int, log2: int, mesh: Mesh,
                 axis: str):
        super().__init__(fk, params, log1, log2)
        self.mesh = mesh
        self.axis = axis
        D = mesh.shape[axis]
        # distribute a part only when its four-step factors split over
        # the mesh; tiny parts run as plain (replicated) radix-2
        if self.n1 >= 4 * D * D:
            self.dom1 = FourStepDomain(fk, params, log1, mesh, axis)
        if self.n2 >= 4 * D * D and log2 != log1:
            self.dom2 = FourStepDomain(fk, params, log2, mesh, axis)
        elif log2 == log1:
            self.dom2 = self.dom1
