"""Native C++ ingest vs the pure-Python parser."""

import random

import numpy as np
import pytest

from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.io import native, paf
from tests import datagen


@pytest.fixture(scope="module")
def native_lib():
    lib = native.load()
    if lib is None:
        pytest.fail("native library failed to build (g++ available in image)")
    return lib


def test_native_mt_bit_identical_and_error_parity(native_lib):
    """impg_paf_parse_mt must reproduce the single-thread columns exactly
    for any thread count — global first-seen name order, first-nonzero
    sequence lengths — and rebase chunk-local error line numbers so the
    message equals the single-thread one."""
    if not hasattr(native_lib, "impg_paf_parse_mt"):
        pytest.skip("old native library without the mt symbol")
    rng = random.Random(91)
    text, _seqs, _alns = datagen.random_paf(
        rng, n_seqs=8, n_alns=600, n_ops=20
    )
    data = text.encode()
    st = native.parse_paf_bytes_native(data, threads=1)
    for t in (2, 3, 5):
        mt = native.parse_paf_bytes_native(data, threads=t)
        for k in st:
            a, b = st[k], mt[k]
            if isinstance(a, (bytes, str, int)):
                assert a == b, (t, k)
            else:
                assert np.array_equal(a, b), (t, k)
    # Error line numbers: inject a bad strand mid-buffer.
    cut = data[: len(data) // 2].rfind(b"\n") + 1
    bad = (
        data[:cut]
        + b"q\t10\t0\t5\t?\tt\t10\t0\t5\t5\t5\t60\tcg:Z:5=\n"
        + data[cut:]
    )
    msgs = []
    for t in (1, 4):
        with pytest.raises(ValueError) as ei:
            native.parse_paf_bytes_native(bad, threads=t)
        msgs.append(str(ei.value))
    assert msgs[0] == msgs[1]
    assert msgs[0].startswith("line ")


def test_native_matches_python(native_lib):
    rng = random.Random(44)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=6, n_alns=80, n_ops=15)
    data = text.encode()
    si_py, si_nat = SequenceIndex(), SequenceIndex()
    py = paf.parse_paf_bytes(data, si_py, use_native=False)
    nat = paf.parse_paf_bytes(data, si_nat, use_native=True)
    assert list(si_py.names()) == list(si_nat.names())
    assert np.array_equal(si_py.lengths_array(), si_nat.lengths_array())
    for field in ("query_id", "q_start", "q_end", "target_id", "t_start",
                  "t_end", "strand", "runs", "run_offsets"):
        assert np.array_equal(getattr(py, field), getattr(nat, field)), field


def test_native_handles_blank_and_comment_lines(native_lib):
    data = b"# comment\n\nq\t10\t0\t10\t+\tt\t10\t0\t10\t10\t10\t60\tcg:Z:10=\n"
    si = SequenceIndex()
    recs = paf.parse_paf_bytes(data, si)
    assert len(recs) == 1


def test_native_error_messages(native_lib):
    cases = [
        (b"q\t10\t0\t10\t+\n", "<12 fields"),
        (b"q\tx\t0\t10\t+\tt\t10\t0\t10\t1\t1\t60\tcg:Z:10=\n", "invalid integer"),
        (b"q\t10\t0\t10\t*\tt\t10\t0\t10\t1\t1\t60\tcg:Z:10=\n", "invalid strand"),
        (b"q\t10\t0\t10\t+\tt\t10\t0\t10\t1\t1\t60\tcg:Z:5=3Q\n", "CIGAR operation"),
        (b"q\t10\t0\t10\t+\tt\t10\t0\t10\t1\t1\t60\n", "cg:Z"),
    ]
    for data, needle in cases:
        with pytest.raises(ValueError, match=needle):
            paf.parse_paf_bytes(data, SequenceIndex())


def test_index_build_uses_native_and_matches(tmp_path, native_lib):
    rng = random.Random(50)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=4, seq_len=2000)
    p = tmp_path / "x.paf"
    p.write_text(text)
    from impg_tpu.index.impg_index import ImpgIndex

    idx = ImpgIndex.from_paf_files([str(p)])
    assert len(idx.records) == 2 * len(alns)


def test_tune_malloc_for_reuse():
    """glibc heap-reuse tuning (ROADMAP r5 #8): on glibc it applies and
    sticks; the kill switch is honored.  The perf effect (fresh 100 MB
    alloc+touch ~254 ms -> ~1.3 ms on this image) is a measured doc
    claim, not asserted here (depends on kernel page-demotion policy)."""
    from impg_tpu.io import native as nat

    applied = nat.tune_malloc_for_reuse()
    if applied:
        assert nat._malloc_tuned
        assert nat.tune_malloc_for_reuse()  # idempotent
    else:
        # Only acceptable on non-glibc or when explicitly disabled.
        import os
        assert os.environ.get("IMPG_MALLOC_TUNE") == "0" or not hasattr(
            __import__("ctypes").CDLL(None), "mallopt"
        )
