"""alt_bn128 (BN254) curve parameters.

The reference's default curve (-DCURVE=BN128/ALT_BN128, reference
CMakeLists.txt:23-29; libff alt_bn128_init consumed throughout). All
constants below are the public standard BN254 parameters (EIP-196/197
compatible); q and r are re-derived from the BN x-parameter at import as a
self-check.
"""
from .curve import Curve

# BN parameterization: q(x) = 36x^4 + 36x^3 + 24x^2 + 6x + 1,
#                      r(x) = 36x^4 + 36x^3 + 18x^2 + 6x + 1
X = 4965661367192848881

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

assert Q == 36 * X**4 + 36 * X**3 + 24 * X**2 + 6 * X + 1
assert R == 36 * X**4 + 36 * X**3 + 18 * X**2 + 6 * X + 1

# G2 generator (standard, over Fq2 = Fq[u]/(u^2+1), c0 + c1*u)
G2_X = (10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634)
G2_Y = (8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531)

# G2 cofactor: #E'(Fq2) / r for the correct sextic twist
G2_COFACTOR = (36 * X**4 + 36 * X**3 + 30 * X**2 + 6 * X + 1)


def build():
    return Curve(
        name="alt_bn128",
        x_param=X,
        family="bn",
        q=Q,
        r=R,
        b=3,
        g1_gen=(1, 2),
        fq2_non_residue=Q - 1,          # u^2 = -1
        fq6_non_residue_c=(9, 1),       # xi = 9 + u
        twist_type="D",
        g2_gen=(G2_X, G2_Y),
        fr_mult_gen=5,                  # libff alt_bn128_Fr multiplicative generator
        fq_mult_gen=3,
        g1_cofactor=1,
        g2_cofactor=G2_COFACTOR,
    )
