"""Solver parameters, mirroring the reference flag schema and defaults
(`src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:10-157`).

Threshold values are carried as decimal strings and converted exactly
to MP constants (the reference parses them as BigFloat decimals for
reproducibility, `Solver_Parameters.cxx:12-17`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..mp import core as mpcore
from ..mp import decimal as mpdec


@dataclasses.dataclass(frozen=True)
class SolverParams:
    precision: int = 400                 # binary digits; K = ceil(prec/53)
    max_iterations: int = 500
    max_runtime: float = float(2 ** 63)  # seconds
    checkpoint_interval: float = 3600.0
    duality_gap_threshold: str = "1e-30"
    primal_error_threshold: str = "1e-30"
    dual_error_threshold: str = "1e-30"
    initial_matrix_scale_primal: str = "1e20"
    initial_matrix_scale_dual: str = "1e20"
    feasible_centering_parameter: str = "0.1"
    infeasible_centering_parameter: str = "0.3"
    step_length_reduction: float = 0.7
    min_primal_step: str = "0"
    min_dual_step: str = "0"
    max_complementarity: str = "1e100"
    find_primal_feasible: bool = False
    find_dual_feasible: bool = False
    detect_primal_feasible_jump: bool = False
    detect_dual_feasible_jump: bool = False
    # Word dtype of the MP arithmetic: "float64" (CPU; correctly-rounded
    # IEEE doubles) or "float32" (TPU; the VPU's native correctly-rounded
    # type -- TPU f64 is an unrounded emulation, see mp/core.py).
    word_dtype: str = "float64"
    # --maxSharedMemory: byte cap on the Q residue pipeline's int
    # buffers; 0 = unlimited.  Splits the exact Q SYRK into row chunks
    # (`bigint_syrk_blas.cxx:195-222` window splitting); accepts the
    # reference's byte-suffix strings ("100.1K").
    max_shared_memory: str = "0"

    @property
    def max_shared_memory_bytes(self) -> int:
        from .memory import parse_bytes

        return parse_bytes(self.max_shared_memory)

    @property
    def n_words(self) -> int:
        """Trailing-axis slot count of the MP arrays at this precision:
        f64 words (53 bits each) on CPU; the TPU limb format's
        exponent-slot + base-2^9 limbs otherwise (mp/limb.py)."""
        if jnp.dtype(self.word_dtype) == jnp.float32:
            from ..mp import limb as mplimb

            return mplimb.slots_for_precision(self.precision)
        return max(2, -(-self.precision // 53))

    # -- MP constants (cached per dtype; numpy so they are never
    #    created inside a jit trace) ------------------------------------
    @functools.lru_cache(maxsize=None)
    def _const(self, decimal: str, dtype_name: str):
        k = self.n_words
        if np.dtype(dtype_name) == np.float64:
            return np.asarray(mpdec.from_decimal(decimal, k))
        from ..mp import limb as mplimb

        k64 = max(2, -(-self.precision // 53)) + 1
        words = mpdec.from_decimal(decimal, k64)
        return mplimb.from_words_np(words, k)

    def mpconst(self, decimal: str, dtype=jnp.float64):
        return self._const(decimal, jnp.dtype(dtype).name)

    def max_complementarity_mp(self, dtype):
        return self.mpconst(self.max_complementarity, dtype)

    def feasible_centering_mp(self, dtype):
        return self.mpconst(self.feasible_centering_parameter, dtype)

    def infeasible_centering_mp(self, dtype):
        return self.mpconst(self.infeasible_centering_parameter, dtype)

    def predictor_beta(self, is_primal_and_dual_feasible: bool, k, dtype):
        """`predictor_centering_parameter.cxx`: 0 if feasible, else
        the infeasible centering parameter."""
        if is_primal_and_dual_feasible:
            return np.zeros((k,), dtype=np.dtype(jnp.dtype(dtype).name))
        return self.infeasible_centering_mp(dtype)

    # -- host-side threshold comparisons (mpmath-exact) -----------------
    def _mpf(self, decimal: str):
        import mpmath

        ctx = mpmath.mp.clone()
        ctx.prec = self.precision + 64
        return ctx.mpf(decimal)

    def thresholds_mpf(self):
        return {
            "duality_gap": self._mpf(self.duality_gap_threshold),
            "primal_error": self._mpf(self.primal_error_threshold),
            "dual_error": self._mpf(self.dual_error_threshold),
            "min_primal_step": self._mpf(self.min_primal_step),
            "min_dual_step": self._mpf(self.min_dual_step),
        }
