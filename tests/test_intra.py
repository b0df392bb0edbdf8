"""CIGAR indel scan tests (mirrors reference tests/test_intra.py)."""

from svim_tpu.collect.intra import scan_cigar_indels


def test_simple_deletion():
    # 10M5D10M with min length 5 -> one DEL at ref offset 10, read offset 10
    assert scan_cigar_indels([(0, 10), (2, 5), (0, 10)], 5) == [(10, 10, 5, "DEL")]


def test_simple_insertion():
    assert scan_cigar_indels([(0, 10), (1, 5), (0, 10)], 5) == [(10, 10, 5, "INS")]


def test_below_threshold_ignored():
    assert scan_cigar_indels([(0, 10), (2, 4), (0, 10), (1, 4), (0, 5)], 5) == []


def test_softclip_advances_read_only():
    # 5S10M5D3M: soft clip shifts read offset but not ref offset
    assert scan_cigar_indels([(4, 5), (0, 10), (2, 5), (0, 3)], 5) == [(10, 15, 5, "DEL")]


def test_eq_and_x_advance_both():
    assert scan_cigar_indels([(7, 6), (8, 4), (1, 7), (7, 3)], 5) == [(10, 10, 7, "INS")]


def test_hard_clip_ignored():
    assert scan_cigar_indels([(5, 8), (0, 10), (2, 6), (0, 2)], 5) == [(10, 10, 6, "DEL")]


def test_multiple_events_accumulate_offsets():
    events = scan_cigar_indels([(0, 10), (2, 6), (0, 10), (1, 8), (0, 10)], 5)
    assert events == [(10, 10, 6, "DEL"), (26, 20, 8, "INS")]
