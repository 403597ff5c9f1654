"""The interior-point SDP solver (reference: `src/sdp_solve/`)."""

from .data import (
    BlockShape,
    SDPBlock,
    SDPProblem,
    SolverState,
    block_shape_of,
    initial_state,
    problem_from_raw,
)
from .driver import (NonFiniteIterateError, SolveResult, TerminateReason,
                     solve)
from .params import SolverParams
