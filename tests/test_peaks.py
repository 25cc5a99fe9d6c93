"""local_peaks: strict ±w local maxima over partitioned ordered rows
(the generalized reference peak predicate, _Shazam_.py:165-183)."""

from __future__ import annotations

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.peaks import (
    local_peaks,
)


def test_local_peaks_strict_plateau_and_boundaries(spark):
    # seq: 1 5 5 3 9 3 1 7  → 9 is a peak; the 5-5 plateau is NOT
    # (strict comparison); 7 at the right boundary IS (only existing
    # neighbors compared); 1 at the left boundary is not.
    rows = [("u", i, v) for i, v in enumerate([1, 5, 5, 3, 9, 3, 1, 7])]
    df = spark.createDataFrame(rows, "part string, pos int, value int")
    got = sorted(
        r["pos"]
        for r in local_peaks(df, ["part"], ["pos"], "value", w=2).collect()
    )
    assert got == [4, 7]


def test_local_peaks_partitions_independent(spark):
    rows = [("a", 0, 10), ("a", 1, 1), ("b", 0, 1), ("b", 1, 10)]
    df = spark.createDataFrame(rows, "part string, pos int, value int")
    got = {
        (r["part"], r["pos"])
        for r in local_peaks(df, ["part"], ["pos"], "value", w=2).collect()
    }
    assert got == {("a", 0), ("b", 1)}
