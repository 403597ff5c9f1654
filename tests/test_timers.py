"""Timers/profiling subsystem (sdpb_tpu.utils.timers vs the reference's
`sdpb_util/Timers` + profiling-dir rotation in `sdpb/main.cxx`,
rotation behavior tested in the reference's `sdpb.test.cxx:50-86`)."""

import time
from pathlib import Path

from sdpb_tpu.utils.timers import (Timers, Verbosity, proc_mem_used,
                                   rotate_profiling_dir)


def test_scoped_prefixes_and_profile(tmp_path):
    t = Timers(Verbosity.debug)
    with t.scoped("sdpb"):
        with t.scoped("solve"):
            with t.scoped("iter_1"):
                time.sleep(0.01)
            with t.scoped("iter_2"):
                pass
    names = [n for n, _, _ in t.named]
    assert names == ["sdpb", "sdpb.solve", "sdpb.solve.iter_1",
                     "sdpb.solve.iter_2"]
    assert t.elapsed_seconds("sdpb.solve.iter_1") >= 0.01
    assert t.elapsed_seconds("sdpb") >= t.elapsed_seconds("sdpb.solve.iter_1")

    out = tmp_path / "prof" / "profiling.0"
    t.write_profile(out)
    text = out.read_text()
    assert '{"sdpb.solve.iter_1", ' in text
    assert text.startswith("{") and text.rstrip().endswith("}")


def test_mem_sampling():
    t = Timers(Verbosity.debug)
    with t.scoped("a"):
        pass
    if proc_mem_used() is not None:
        assert t.max_mem_used > 0
        assert t.max_mem_used_name == "a"


def test_profiling_dir_rotation(tmp_path):
    base = tmp_path / "ck.profiling"
    for gen in range(4):
        d = rotate_profiling_dir(base, max_old=2)
        assert d == base
        (base / "marker").write_text(str(gen))
    # oldest dropped; at most max_old rotated dirs kept
    rotated = sorted(p.name for p in tmp_path.iterdir())
    assert "ck.profiling" in rotated
    assert "ck.profiling.0" in rotated and "ck.profiling.1" in rotated
    assert "ck.profiling.2" not in rotated
    assert (tmp_path / "ck.profiling.1" / "marker").read_text() == "2"
