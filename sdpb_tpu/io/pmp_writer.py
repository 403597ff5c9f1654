"""User-facing PMP builder: the Python equivalent of the reference's
Mathematica scripting layer (`mathematica/SDPB.m`: `WritePmpJson`,
`DampedRational`, `PositiveMatrixWithPrefactor`).

Bootstrap codes (or any SDP-generating script) construct a PMP in
Python and write the pmp.json consumed by pmp2sdp:

    from sdpb_tpu.io.pmp_writer import (DampedRational,
                                        PositiveMatrixWithPrefactor,
                                        write_pmp_json)
    write_pmp_json("pmp.json",
                   objective=[0, -1],
                   normalization=[1, 0],
                   matrices=[PositiveMatrixWithPrefactor(
                       DampedRational(constant=1, base="0.367879...",
                                      poles=[]),
                       # polynomials[i][j][n] = coefficient list of the
                       # n-th decision-variable polynomial at entry (i,j)
                       polynomials=[[[[1, 0, 0, 0, 1],
                                      [0, 0, 1, 0, "1/12"]]]])])

Numbers may be ints, floats, decimal strings, fractions ("1/12"), or
mpmath mpfs; they are written as full-precision decimal strings.
"""

from __future__ import annotations

import dataclasses
import json
from fractions import Fraction
from pathlib import Path


def _num_str(v, digits: int = 250) -> str:
    """Render a number as a full-precision decimal string."""
    if isinstance(v, str):
        if "/" in v:
            v = Fraction(v)
        else:
            return v
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Fraction):
        import mpmath

        with mpmath.workprec(int(digits * 3.33) + 16):
            return mpmath.nstr(mpmath.mpf(v.numerator) / v.denominator,
                               digits, strip_zeros=True)
    try:
        import mpmath

        if isinstance(v, mpmath.mpf) or type(v).__name__ == "mpf":
            return mpmath.nstr(v, digits, strip_zeros=True)
    except ImportError:
        pass
    return repr(float(v))


@dataclasses.dataclass
class DampedRational:
    """constant * base^x / prod (x - poles[k])  (`SDPB.m` DampedRational)."""

    constant: object = 1
    base: object = 1
    poles: list = dataclasses.field(default_factory=list)

    def json_dict(self):
        return {
            "constant": _num_str(self.constant),
            "base": _num_str(self.base),
            "poles": [_num_str(p) for p in self.poles],
        }


@dataclasses.dataclass
class PositiveMatrixWithPrefactor:
    """One PMP constraint: m x m matrix of polynomial vectors.

    polynomials[i][j][n] is the coefficient list (lowest degree first)
    of the polynomial multiplying decision variable n at entry (i, j).
    Optional sampling overrides mirror the pmp.json schema
    (`docs/json_schema/pmp_schema.json`).
    """

    prefactor: DampedRational | None = None
    polynomials: list = dataclasses.field(default_factory=list)
    reduced_prefactor: DampedRational | None = None
    max_num_poles: int | None = None
    sample_points: list | None = None
    sample_scalings: list | None = None
    reduced_sample_scalings: list | None = None
    bilinear_basis_even: list | None = None   # list of coeff lists
    bilinear_basis_odd: list | None = None

    def json_dict(self):
        out = {}
        if self.prefactor is not None:
            out["DampedRational"] = self.prefactor.json_dict()
        if self.reduced_prefactor is not None:
            out["reducedPrefactor"] = self.reduced_prefactor.json_dict()
        if self.max_num_poles is not None:
            out["maxNumPoles"] = int(self.max_num_poles)
        out["polynomials"] = [
            [[[_num_str(c) for c in poly] for poly in vec] for vec in row]
            for row in self.polynomials
        ]
        for key, val in (("samplePoints", self.sample_points),
                         ("sampleScalings", self.sample_scalings),
                         ("reducedSampleScalings",
                          self.reduced_sample_scalings)):
            if val is not None:
                out[key] = [_num_str(v) for v in val]
        if self.bilinear_basis_even is not None:
            out["bilinearBasis_0"] = [[_num_str(c) for c in poly]
                                      for poly in self.bilinear_basis_even]
        if self.bilinear_basis_odd is not None:
            out["bilinearBasis_1"] = [[_num_str(c) for c in poly]
                                      for poly in self.bilinear_basis_odd]
        return out


def write_pmp_json(path, objective, matrices, normalization=None) -> None:
    """`WritePmpJson` (`mathematica/SDPB.m:46`)."""
    doc = {"objective": [_num_str(v) for v in objective]}
    if normalization is not None:
        doc["normalization"] = [_num_str(v) for v in normalization]
    doc["PositiveMatrixWithPrefactorArray"] = [
        m.json_dict() for m in matrices]
    path = Path(path)
    if path.parent != Path("."):
        path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(doc, indent=1))
