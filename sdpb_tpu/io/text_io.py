"""Readers for the text solution format ("height width\\n" + decimals),
the inverse of output.write_vector/write_matrix
(`sdpb_util/write_distmatrix.hxx`, `load_text_checkpoint.cxx`)."""

from __future__ import annotations

import pathlib

import numpy as np

from ..mp import decimal as mpdec


def read_text_vector(path, k: int) -> np.ndarray:
    lines = pathlib.Path(path).read_text().split()
    h, w = int(lines[0]), int(lines[1])
    assert w == 1, (path, w)
    vals = lines[2:]
    assert len(vals) == h, (path, len(vals), h)
    return np.stack([mpdec.from_decimal(v, k) for v in vals])


def read_text_matrix(path, k: int) -> np.ndarray:
    lines = pathlib.Path(path).read_text().split()
    h, w = int(lines[0]), int(lines[1])
    vals = lines[2:]
    assert len(vals) == h * w, (path, len(vals), h, w)
    out = np.stack([mpdec.from_decimal(v, k) for v in vals])
    return out.reshape(h, w, k)
