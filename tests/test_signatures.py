"""Signature data model tests (mirrors reference tests/test_Signature.py)."""

from svim_tpu.signatures import (
    SignatureDeletion,
    SignatureDuplicationTandem,
    SignatureInsertion,
    SignatureInsertionFrom,
    SignatureTranslocation,
)


def test_deletion_accessors():
    sig = SignatureDeletion("chr1", 100, 200, "cigar", "read1")
    assert sig.get_source() == ("chr1", 100, 200)
    assert sig.get_key() == ("DEL", "chr1", 200)
    assert sig.as_string() == "chr1\t100\t200\tDEL;cigar\tread1"


def test_insertion_keys_on_start():
    sig = SignatureInsertion("chr1", 100, 160, "cigar", "read1", "A" * 60)
    assert sig.get_key() == ("INS", "chr1", 100)
    other = SignatureInsertion("chr1", 150, 200, "cigar", "read2", "C" * 50)
    assert sig.downstream_distance_to(other) == 50


def test_downstream_distance():
    first = SignatureDeletion("chr1", 100, 200, "cigar", "r1")
    second = SignatureDeletion("chr1", 250, 300, "cigar", "r2")
    assert first.downstream_distance_to(second) == 50
    assert second.downstream_distance_to(first) == 0  # clamped at zero
    cross = SignatureDeletion("chr2", 250, 300, "cigar", "r2")
    assert first.downstream_distance_to(cross) == float("inf")


def test_translocation_canonical_order():
    # breakpoints are stored lower-(contig,pos) first, directions flipped on swap
    sig = SignatureTranslocation("chr2", 500, "fwd", "chr1", 900, "rev", "suppl", "r")
    assert sig.contig1 == "chr1" and sig.pos1 == 900
    assert sig.contig2 == "chr2" and sig.pos2 == 500
    assert (sig.direction1, sig.direction2) == ("fwd", "rev")
    straight = SignatureTranslocation("chr1", 100, "fwd", "chr2", 500, "rev", "suppl", "r")
    assert (straight.direction1, straight.direction2) == ("fwd", "rev")
    assert straight.get_key() == ("BND", "chr1", 100)


def test_tandem_duplication_destination():
    sig = SignatureDuplicationTandem("chr1", 100, 200, 2, True, "suppl", "r")
    assert sig.get_destination() == ("chr1", 200, 400)


def test_insertion_from_destination_and_key():
    sig = SignatureInsertionFrom("chr1", 100, 160, "chr2", 5000, "suppl", "r")
    assert sig.get_source() == ("chr1", 100, 160)
    assert sig.get_destination() == ("chr2", 5000, 5060)
    assert sig.get_key() == ("DUP_INT", "chr2", "chr1", 5000)
