import random

from impg_tpu.core.intervals import SortedRanges


def brute_insert(covered: set, start: int, end: int):
    """min_distance=0 oracle: returns uncovered subranges, then covers them."""
    if start > end:
        start, end = end, start
    out = []
    run_start = None
    for pos in range(start, end):
        if pos not in covered:
            if run_start is None:
                run_start = pos
        else:
            if run_start is not None:
                out.append((run_start, pos))
                run_start = None
    if run_start is not None:
        out.append((run_start, end))
    covered.update(range(start, end))
    return out


def test_sorted_ranges_randomized_no_snap():
    rng = random.Random(11)
    for _ in range(30):
        sr = SortedRanges(sequence_length=300, min_distance=0)
        covered: set[int] = set()
        for _ in range(40):
            # Stay within [0, 300]: the reference clamps end to sequence_length
            # when it exceeds it (impg.rs:293-295) even with min_distance=0,
            # which the brute oracle doesn't model.
            a = rng.randint(0, 280)
            b = min(a + rng.randint(1, 40), 300)
            got = sr.insert((a, b))
            expected = brute_insert(covered, a, b)
            assert got == expected, (a, b, got, expected)
        # Invariant: sorted non-overlapping ranges covering exactly `covered`.
        flat = set()
        prev_end = None
        for s, e in sr.ranges:
            if prev_end is not None:
                assert s > prev_end
            flat.update(range(s, e))
            prev_end = e
        assert flat == covered


def test_sorted_ranges_end_clamp_at_zero_min_distance():
    sr = SortedRanges(300, 0)
    assert sr.insert((267, 305)) == [(267, 300)]
    assert sr.ranges == [(267, 300)]


def test_sorted_ranges_reversed_input():
    sr = SortedRanges(100, 0)
    assert sr.insert((50, 20)) == [(20, 50)]
    assert sr.ranges == [(20, 50)]


def test_sorted_ranges_min_distance_snapping():
    # Snap start to previous range end when within min_distance.
    sr = SortedRanges(1000, 10)
    sr.insert((100, 200))
    got = sr.insert((205, 300))  # 205 within 10 of 200 -> snapped to 200
    assert got == [(200, 300)]
    assert sr.ranges == [(100, 300)]

    # Snap to sequence bounds.
    sr2 = SortedRanges(1000, 10)
    got = sr2.insert((5, 995))  # start<10 -> 0; end>990 -> 1000
    assert got == [(0, 1000)]
    assert sr2.ranges == [(0, 1000)]


def test_sorted_ranges_snap_to_next_range():
    sr = SortedRanges(1000, 10)
    sr.insert((500, 600))
    got = sr.insert((400, 495))  # end 495 within 10 of next start 500
    assert got == [(400, 500)]
    assert sr.ranges == [(400, 600)]


def test_sorted_ranges_split_overlap():
    sr = SortedRanges(1000, 0)
    sr.insert((100, 200))
    sr.insert((300, 400))
    got = sr.insert((150, 350))
    assert got == [(200, 300)]
    assert sr.ranges == [(100, 400)]
