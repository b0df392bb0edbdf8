"""Streaming scanner: bounded-memory COLLECT must match the one-shot scanner
signature-for-signature and produce identical pipeline output."""

import random

from svim_tpu.cli import main
from svim_tpu.io import bam as bamio
from svim_tpu.io.bamstream import collect_streaming, stream_bam
from svim_tpu.io.sam import AlignmentFile
from svim_tpu.collect.packed import collect_signatures_from_bam


def _make_bam(tmp_path, n_reads=300):
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from tests.test_packed_collect import _random_sam

    rng = random.Random(77)
    sam_path = tmp_path / "s.sam"
    sam_path.write_text(_random_sam(rng, n_reads))
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "s.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))
    genome_path = tmp_path / "genome.fa"
    rng2 = random.Random(5)
    with open(genome_path, "w") as handle:
        for contig in ("chr1", "chr2"):
            handle.write(">{0}\n".format(contig))
            for _ in range(600000 // 60):
                handle.write("".join(rng2.choice("ACGT") for _ in range(60)) + "\n")
    return str(bam_path), str(genome_path)


def test_streaming_matches_oneshot(tmp_path, default_options):
    bam_path, genome_path = _make_bam(tmp_path)
    options = default_options.replace(batch_reads=64)  # force many batches
    header_s, table, sigs_s, twins_s = collect_streaming(bam_path, options)
    header_o, _packed, sigs_o, _twins_o = collect_signatures_from_bam(
        bam_path, default_options)
    assert header_s.references == header_o.references
    assert [s.as_string() for s in sigs_s] == [s.as_string() for s in sigs_o]
    for s, o in zip(sigs_s, sigs_o):
        if s.type == "INS":
            assert s.sequence == o.sequence
    # genotype table covers every kept record, coordinates consistent
    assert len(table.names) == len(table.ref_id)
    assert (table.ref_end >= table.ref_start).all()


def test_streaming_batch_boundaries(tmp_path, default_options):
    bam_path, _ = _make_bam(tmp_path, n_reads=150)
    for batch_reads in (1, 7, 149, 1000):
        options = default_options.replace(batch_reads=batch_reads)
        stream = stream_bam(bam_path, options.min_mapq, batch_reads)
        next(stream)  # header
        total = sum(batch.n_real for batch in stream)
        if batch_reads == 1000:
            assert total > 0
        else:
            assert total > 0
    # row counts agree across batch sizes
    counts = []
    for batch_reads in (3, 50):
        stream = stream_bam(bam_path, default_options.min_mapq, batch_reads)
        next(stream)
        counts.append(sum(batch.n_real for batch in stream))
    assert counts[0] == counts[1]


def test_streaming_across_window_boundaries(tmp_path, default_options, monkeypatch):
    """Records carved across tiny decompression windows must survive intact."""
    import svim_tpu.io.bamstream as bamstream

    bam_path, _ = _make_bam(tmp_path, n_reads=200)
    reference_stream = bamstream.stream_bam(bam_path, default_options.min_mapq, 64)
    next(reference_stream)
    want = []
    for batch in reference_stream:
        for row in range(batch.n_real):
            want.append((int(batch.packed.ref_id[row]),
                         int(batch.packed.ref_start[row]),
                         batch.packed.names[row],
                         batch.packed.sequences[row]))

    monkeypatch.setattr(bamstream, "WINDOW_UNCOMPRESSED", 64 * 1024)
    tiny_stream = bamstream.stream_bam(bam_path, default_options.min_mapq, 64)
    next(tiny_stream)
    got = []
    for batch in tiny_stream:
        for row in range(batch.n_real):
            got.append((int(batch.packed.ref_id[row]),
                        int(batch.packed.ref_start[row]),
                        batch.packed.names[row],
                        batch.packed.sequences[row]))
    assert got == want


def test_streaming_pipeline_parity(tmp_path):
    bam_path, genome_path = _make_bam(tmp_path)
    wd_stream = tmp_path / "wd_stream"
    wd_oneshot = tmp_path / "wd_oneshot"
    assert main(["alignment", str(wd_stream), bam_path, genome_path,
                 "--stream_input", "--batch_reads", "64"]) == 0
    assert main(["alignment", str(wd_oneshot), bam_path, genome_path]) == 0

    def strip_date(path):
        with open(path) as handle:
            return [line for line in handle if not line.startswith("##fileDate")]

    assert strip_date(wd_stream / "variants.vcf") == \
        strip_date(wd_oneshot / "variants.vcf")


def test_native_carve_matches_python_fallback(tmp_path, default_options, monkeypatch):
    """The native window carver and the pure-Python record walk produce
    identical rows (names, coordinates, SA tags)."""
    from svim_tpu import native
    import svim_tpu.io.bamstream as bamstream

    bam_path, _ = _make_bam(tmp_path, 200)

    def rows():
        stream = bamstream.stream_bam(bam_path, default_options.min_mapq, 64)
        next(stream)
        out = []
        for batch in stream:
            for row in range(batch.n_real):
                out.append((int(batch.packed.ref_id[row]),
                            int(batch.packed.ref_start[row]),
                            batch.packed.names[row], batch.sa_tags[row]))
        return out

    native_rows = rows()
    monkeypatch.setattr(native, "get_library", lambda: None)
    fallback_rows = rows()
    assert native_rows == fallback_rows and len(native_rows) > 0


def test_isolated_eof_block_final_window(tmp_path, default_options, monkeypatch):
    """A final raw group holding only zero-ISIZE blocks (the 28-byte BGZF EOF
    block isolated when the previous group ends exactly at the last data
    block) is end-of-stream, not corruption (ADVICE round 3)."""
    import svim_tpu.io.bamstream as bamstream

    bam_path, _ = _make_bam(tmp_path, n_reads=60)
    baseline = bamstream.stream_bam(bam_path, default_options.min_mapq, 64)
    next(baseline)
    want = sum(batch.n_real for batch in baseline)

    # window threshold 1: every block becomes its own raw group, so the EOF
    # block (ISIZE 0) is guaranteed to arrive alone with an empty carry
    monkeypatch.setattr(bamstream, "WINDOW_UNCOMPRESSED", 1)
    stream = bamstream.stream_bam(bam_path, default_options.min_mapq, 64)
    next(stream)
    got = sum(batch.n_real for batch in stream)
    assert got == want
