"""TinyRAM demo, step 3/3: read vk + proof + boot input from files and
verify (all host-side pairings -- no accelerator needed).

usage: demo_ram_ppzksnark_verifier.py <dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

from libsnark_tpu import get_curve
from libsnark_tpu.proof_systems.ram_ppzksnark import RAMPpzksnark
from libsnark_tpu.serialization import Codec

if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ram_demo"
    curve = get_curve("alt_bn128")
    ps = RAMPpzksnark(curve)
    codec = Codec(curve)
    with open(os.path.join(d, "vk.txt"), "rb") as f:
        vk = codec.read_bctv14_vk(f)
    with open(os.path.join(d, "proof.txt"), "rb") as f:
        proof = codec.read_bctv14_proof(f)
    with open(os.path.join(d, "boot_input.txt"), "rb") as f:
        boot_primary = codec.read_fr_vector(f)
    ok = ps.ram_verifier(vk, boot_primary, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)
