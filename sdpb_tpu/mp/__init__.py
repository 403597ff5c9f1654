"""Multi-word float64 ("MP") arithmetic: the precision substrate.

The reference solver (davidsd/sdpb) carries all solver state in GMP
arbitrary-precision floats (``El::BigFloat``, 448-1024 bits;
`src/sdp_solve/SDP.hxx`).  On TPU we instead represent a high-precision
number as an unevaluated sum of K IEEE float64 words (a "floating-point
expansion", cf. the QD library of Hida-Li-Bailey and the CAMPARY
algorithms of Joldes-Muller-Popescu): K=2 gives ~106 bits, K=4 ~212 bits,
K=6 ~318 bits.  Words live in the trailing axis of an ordinary JAX array,
so every MP operation is an elementwise VPU computation and vmaps/shards
like any other array math.
"""

from .core import (
    DEFAULT_K,
    MPArray,
    add,
    abs_,
    cmp_leq,
    cmp_lt,
    div,
    from_array,
    from_f64,
    fst,
    is_mp,
    mul,
    mul_pow2,
    mul_scalar,
    neg,
    nwords,
    recip,
    renorm_words,
    sqrt,
    sub,
    to_f64,
    two_prod,
    two_sum,
    zeros,
)
from .decimal import from_decimal, from_mpf, to_decimal, to_mpf
from . import linalg
