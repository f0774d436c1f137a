"""Hierarchical profiling (libff enter_block/leave_block equivalent).

The reference wraps every phase in nested wall-clock timers
(r1cs_gg_ppzksnark.tcc:236,316,341,470,521; 64 call sites). Here the same
API is a context manager that also understands JAX async dispatch
(block_until_ready on exit when requested) and exposes op-count counters
(PROFILE_OP_COUNTS analogue) as plain dict increments.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Profiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.depth = 0
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.op_counts = defaultdict(int)
        self._start = time.monotonic()

    def start_profiling(self):
        self._start = time.monotonic()
        self.totals.clear()
        self.counts.clear()

    @contextlib.contextmanager
    def block(self, name: str, sync=None):
        """enter_block/leave_block pair. ``sync``: optional jax array (or
        pytree) to block_until_ready before stopping the clock."""
        if not self.enabled:
            yield
            return
        indent = "  " * self.depth
        print(f"{indent}(enter) {name}")
        self.depth += 1
        t0 = time.monotonic()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            dt = time.monotonic() - t0
            self.depth -= 1
            self.totals[name] += dt
            self.counts[name] += 1
            print(f"{indent}(leave) {name}  [{dt:.4f}s]")

    def count_op(self, name: str, n: int = 1):
        self.op_counts[name] += n

    def print_summary(self):
        print("== profiling summary ==")
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            print(f"  {name}: {t:.4f}s x{self.counts[name]}")
        if self.op_counts:
            print("== op counts ==")
            for name, n in sorted(self.op_counts.items()):
                print(f"  {name}: {n}")


PROFILER = Profiler(enabled=False)


def start_profiling():
    PROFILER.enabled = True
    PROFILER.start_profiling()


def enter_block(name, sync=None):
    return PROFILER.block(name, sync)
