"""TinyRAM demo, step 1/3 (reference demo_ram_ppzksnark_generator,
CMakeLists.txt:113-116): run the universal-circuit generator and write
the proving/verification keys to files.

usage: demo_ram_ppzksnark_generator.py <outdir> [time_bound] [boot_bound]
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

from libsnark_tpu import get_curve
from libsnark_tpu.proof_systems.ram_ppzksnark import RAMPpzksnark
from libsnark_tpu.relations.tinyram import TinyRAMParams
from libsnark_tpu.serialization import Codec

if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ram_demo"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(outdir, exist_ok=True)
    curve = get_curve("alt_bn128")
    ap = TinyRAMParams(w=16, k=4)
    ps = RAMPpzksnark(curve)
    kp = ps.ram_generator(ap, B, T, seed=1)
    codec = Codec(curve)
    with open(os.path.join(outdir, "vk.txt"), "wb") as f:
        codec.write_bctv14_vk(f, kp.vk)
    # the pk holds device query arrays; stored via pickle (an internal
    # cache format -- vk/proof files use the text grammar, which is the
    # externally-consumed surface)
    with open(os.path.join(outdir, "pk.pickle"), "wb") as f:
        pickle.dump(kp.pk, f)
    print(f"wrote {outdir}/vk.txt and {outdir}/pk.pickle")
