"""Demo executables (reference CMakeLists.txt:111-118 demo targets):
argv/file contracts of demo_arithmetization and the assembly loader."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_preprocessed_program():
    from libsnark_tpu.relations.tinyram import (
        TinyRAMParams, load_preprocessed_program, Opcode)
    ap = TinyRAMParams(w=16, k=4)
    prog = load_preprocessed_program(ap, """
        mov 1 0 0 7
        storew 1 0 0 64
        loadw 1 1 0 64
        answer 1 0 0 -1
    """)
    assert prog.size == 4
    assert prog.instructions[0].opcode == Opcode.MOV
    # negative immediates wrap mod 2^w (reference tinyram_aux.cpp:312+)
    assert prog.instructions[3].arg2idx_or_imm == (1 << 16) - 1


def _write_demo_inputs(d):
    (d / "ap.txt").write_text("16 4\n")
    (d / "cb.txt").write_text("2 8 6\n")   # input, program, time bounds
    asm = "mov 1 0 0 7\nstorew 1 0 0 64\nloadw 1 1 0 64\nanswer 1 0 0 0\n"
    (d / "prog.txt").write_text(asm)
    (d / "prog.s").write_text(asm)
    (d / "pi.txt").write_text("0\n")
    (d / "ai.txt").write_text("0\n")


def test_demo_arithmetization(tmp_path):
    _write_demo_inputs(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "demos",
                                      "demo_arithmetization.py"),
         "--assembly", str(tmp_path / "prog.s"),
         "--processed_assembly", str(tmp_path / "prog.txt"),
         "--architecture_params", str(tmp_path / "ap.txt"),
         "--computation_bounds", str(tmp_path / "cb.txt"),
         "--primary_input", str(tmp_path / "pi.txt"),
         "--auxiliary_input", str(tmp_path / "ai.txt")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "R1CS satisfied: True" in r.stdout
