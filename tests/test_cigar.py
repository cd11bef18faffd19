import numpy as np
import pytest

from impg_tpu.core import cigar
from tests import pyref


def test_pack_roundtrip():
    lens = np.array([1, 500_000_000 >> 1, 7, 29], dtype=np.int64)
    ops = np.array([cigar.OP_EQ, cigar.OP_X, cigar.OP_I, cigar.OP_M], np.uint32)
    runs = cigar.pack(lens, ops)
    assert np.array_equal(cigar.run_len(runs), lens)
    assert np.array_equal(cigar.run_op(runs), ops)


def test_parse_one_matches_oracle():
    text = "10=5X3I2D100M1=1I"
    runs = cigar.parse_one(text)
    expected = pyref.parse_cigar(text)
    assert len(runs) == len(expected)
    for r, (l, o) in zip(runs, expected):
        assert int(r & cigar.LEN_MASK) == l
        assert "=XIDM"[int(r >> 29)] == o
    assert cigar.format_runs(runs) == text


def test_parse_concat_multiple():
    texts = ["5=", "3X2I", "", "1D1=1D"]
    buf = np.frombuffer("".join(texts).encode(), np.uint8)
    offsets = np.cumsum([0] + [len(t) for t in texts]).astype(np.int64)
    runs, run_offsets = cigar.parse_concat(buf, offsets)
    assert run_offsets.tolist() == [0, 1, 3, 3, 6]
    for i, t in enumerate(texts):
        got = cigar.format_runs(runs[run_offsets[i] : run_offsets[i + 1]])
        assert got == t


def test_parse_invalid_op():
    with pytest.raises(ValueError):
        cigar.parse_one("5=3Q")


def test_invert_runs():
    runs = cigar.parse_one("5=3I2D4X")
    fwd = cigar.invert_runs(runs, strand_reverse=False)
    assert cigar.format_runs(fwd) == "5=3D2I4X"
    rev = cigar.invert_runs(runs, strand_reverse=True)
    assert cigar.format_runs(rev) == "4X2I3D5="
