"""End-to-end scripting workflow: build a PMP in Python, compile it,
solve it, extract the spectrum.

The Python analog of the reference's Mathematica workflow
(`mathematica/SDPB.m` + `docs/Usage.md`'s example): maximize -y such
that 1 + x^4 + y (x^4/12 + x^2) >= 0 for all x >= 0 -- the same toy
problem as the bundled `1d` end-to-end test, whose optimum is
y* = -1.8402657... (so the objective 0 - y has value 1.8402657...).

Run:  python examples/quickstart.py [workdir]
"""

import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from sdpb_tpu.io.pmp_writer import (DampedRational,  # noqa: E402
                                    PositiveMatrixWithPrefactor,
                                    write_pmp_json)


def main(workdir=None):
    work = pathlib.Path(workdir or tempfile.mkdtemp(prefix="sdpb_tpu_"))
    work.mkdir(parents=True, exist_ok=True)
    pmp = work / "pmp.json"

    # One 1x1 constraint: P(x) = 1 + x^4 + y (x^4/12 + x^2) >= 0.
    # PMP form (eq. 3.1): M_0(x) + y M_1(x) >= 0 with the default
    # exp(-x) prefactor; objective (b_0, b) = (0, -1) maximizes -y.
    write_pmp_json(
        pmp,
        objective=[0, -1],
        normalization=[1, 0],
        matrices=[PositiveMatrixWithPrefactor(
            prefactor=DampedRational(constant=1,
                                     base="0.36787944117144233",
                                     poles=[]),
            polynomials=[[[
                [1, 0, 0, 0, 1],            # M_0 = 1 + x^4
                [0, 0, 1, 0, "1/12"],       # M_1 = x^2 + x^4/12
            ]]])])

    run = lambda *args: subprocess.run(
        [sys.executable, "-m", *args], check=True)
    run("sdpb_tpu.apps.pmp2sdp", "-p", "768", "-i", str(pmp),
        "-o", str(work / "sdp"))
    run("sdpb_tpu.apps.sdpb", "-s", str(work / "sdp"),
        "-o", str(work / "out"), "-c", str(work / "ck"),
        "--precision", "212")
    run("sdpb_tpu.apps.spectrum", "--precision", "768",
        "-i", str(work / "sdp" / "pmp_info.json"),
        "--solution", str(work / "out"), "--threshold", "1e-10",
        "-o", str(work / "spectrum.json"))

    out = (work / "out" / "out.txt").read_text()
    print(out)
    for line in out.splitlines():
        if line.startswith("primalObjective"):
            val = float(line.split("=")[1].rstrip(";")[:20])
            assert abs(val - 1.8402657631320492) < 1e-10, val
            print(f"optimal objective {val:.12f} "
                  "(expected 1.840265763132)")
    return work


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
