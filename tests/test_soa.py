"""Differential tests: struct-of-arrays signature tables vs the object path.

The SoA path must reproduce the object path's per-type signature order and
every materialized field exactly (sigtable.py parity contract)."""

import random

import pytest

from svim_tpu.collect.packed import (
    collect_signatures_from_bam,
    collect_soa_from_bam,
)
from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentFile, AlignmentHeader, parse_sam_line
from svim_tpu.sigtable import SIG_TYPES, LazyMembers, soa_from_signatures

from test_packed_collect import _random_sam


def _sam_to_bam(sam_text, bam_path):
    lines = sam_text.strip().split("\n")
    header_text = "\n".join(line for line in lines if line.startswith("@")) + "\n"
    header = AlignmentHeader.from_text(header_text)
    records = [parse_sam_line(line, header)
               for line in lines if not line.startswith("@")]
    bamio.write_bam(str(bam_path), header, records)
    return header, records


@pytest.mark.parametrize("seed,all_bnds", [(1, False), (2, True), (5, True)])
def test_soa_matches_object_path(tmp_path, default_options, seed, all_bnds):
    rng = random.Random(seed)
    bam_path = tmp_path / "random.bam"
    _sam_to_bam(_random_sam(rng, all_split=(seed % 2 == 0)), bam_path)
    options = default_options.replace(all_bnds=all_bnds)

    _h, _t, object_sigs, object_twins = collect_signatures_from_bam(
        str(bam_path), options)
    _h2, _t2, soa, soa_twins = collect_soa_from_bam(str(bam_path), options)

    assert soa.total() == len(object_sigs)
    for sig_type in SIG_TYPES:
        expected = [sig for sig in object_sigs if sig.type == sig_type]
        table = soa.tables[sig_type]
        assert table.n == len(expected)
        got = table.materialize_list(range(table.n))
        for want, have in zip(expected, got):
            assert type(want) is type(have)
            assert want.as_string() == have.as_string()
            if sig_type == "INS":
                assert want.sequence == have.sequence
            if sig_type == "BND":
                assert (want.direction1, want.direction2) == (
                    have.direction1, have.direction2)
        # column views must agree with the objects without materialization
        for i, want in enumerate(expected):
            assert int(table.start[i]) == want.get_source()[1]
            assert int(table.end[i]) == want.get_source()[2]
            assert table.contigs.names[int(table.contig_code[i])] == want.contig
            assert table.reads.names[int(table.read_code[i])] == want.read
    assert ([t.as_string() for t in object_twins]
            == [t.as_string() for t in soa_twins])


def test_soa_from_signatures_roundtrip(default_options, tmp_path):
    rng = random.Random(7)
    bam_path = tmp_path / "random.bam"
    _sam_to_bam(_random_sam(rng), bam_path)
    _h, _t, object_sigs, _tw = collect_signatures_from_bam(
        str(bam_path), default_options)
    soa = soa_from_signatures(object_sigs)
    for sig_type in SIG_TYPES:
        expected = [sig for sig in object_sigs if sig.type == sig_type]
        table = soa.tables[sig_type]
        got = table.materialize_list(range(table.n))
        assert [sig.as_string() for sig in expected] == [
            sig.as_string() for sig in got]


def test_concat_soa_matches_object_extend(default_options, tmp_path):
    """concat_soa == the reference's per-file sv_signatures.extend()
    (svim:68-82): per-type order is file order, fields exact, pools
    remapped."""
    from svim_tpu.sigtable import concat_soa

    parts = []
    combined_objects = []
    for seed in (7, 13, 21):
        rng = random.Random(seed)
        bam_path = tmp_path / "random{0}.bam".format(seed)
        _sam_to_bam(_random_sam(rng, all_split=(seed == 13)), bam_path)
        _h, _t, object_sigs, _tw = collect_signatures_from_bam(
            str(bam_path), default_options)
        combined_objects.extend(object_sigs)
        parts.append(soa_from_signatures(object_sigs))

    merged = concat_soa(parts)
    assert merged.total() == len(combined_objects)
    for sig_type in SIG_TYPES:
        expected = [sig for sig in combined_objects if sig.type == sig_type]
        table = merged.tables[sig_type]
        assert table.n == len(expected)
        got = table.materialize_list(range(table.n))
        assert [sig.as_string() for sig in expected] == [
            sig.as_string() for sig in got]
        if sig_type == "INS":
            assert [sig.sequence for sig in expected] == [
                table.sequence(i) for i in range(table.n)]
        for i, want in enumerate(expected):
            assert table.contigs.names[int(table.contig_code[i])] == want.contig
            assert table.reads.names[int(table.read_code[i])] == want.read
    # single-part concat is the identity
    assert concat_soa([parts[0]]) is parts[0]


def test_lazy_members_sequence_protocol():
    from svim_tpu.signatures import SignatureDeletion

    sigs = [SignatureDeletion("chr1", 100 + i, 200 + i, "cigar",
                              "read{0}".format(i)) for i in range(4)]
    soa = soa_from_signatures(sigs)
    table = soa.tables["DEL"]
    members = LazyMembers(table, [0, 2, 3])
    assert len(members) == 3
    assert members[0].as_string() == sigs[0].as_string()
    assert [m.read for m in members] == ["read0", "read2", "read3"]
    combined = members + [sigs[1]]
    assert [m.read for m in combined] == ["read0", "read2", "read3", "read1"]
    combined = [sigs[1]] + members
    assert combined[0].read == "read1"


@pytest.mark.parametrize("seed", [3, 11])
def test_form_partitions_table_matches_object_path(tmp_path, default_options,
                                                   seed):
    """Column-wise partitioning: identical boundaries and member order."""
    from svim_tpu.cluster.partition import form_partitions, form_partitions_table

    rng = random.Random(seed)
    bam_path = tmp_path / "random.bam"
    _sam_to_bam(_random_sam(rng, all_split=(seed % 2 == 1)), bam_path)
    options = default_options.replace(all_bnds=True)
    _h, _t, object_sigs, _tw = collect_signatures_from_bam(str(bam_path),
                                                           options)
    _h2, _t2, soa, _tw2 = collect_soa_from_bam(str(bam_path), options)
    for sig_type in SIG_TYPES:
        expected = form_partitions(
            [sig for sig in object_sigs if sig.type == sig_type],
            options.partition_max_distance)
        got = form_partitions_table(soa.tables[sig_type],
                                    options.partition_max_distance)
        assert len(got) == len(expected)
        for want, have in zip(expected, got):
            assert ([sig.as_string() for sig in want]
                    == [sig.as_string() for sig in have])


def _flatten_cluster(cluster):
    destination = (cluster.get_destination()
                   if hasattr(cluster, "get_destination") else None)
    return (cluster.type, cluster.get_source(), destination,
            cluster.score, cluster.size, cluster.std_span, cluster.std_pos,
            [member.as_string() for member in cluster.members],
            getattr(cluster, "direction1", None),
            getattr(cluster, "direction2", None))


@pytest.mark.parametrize("seed,backend", [(4, "device"), (9, "exact")])
def test_cluster_soa_matches_object_path(tmp_path, default_options, seed,
                                         backend):
    """Full CLUSTER stage over tables == over objects, record for record."""
    from svim_tpu.cluster import cluster_sv_signatures

    rng = random.Random(seed)
    bam_path = tmp_path / "random.bam"
    _sam_to_bam(_random_sam(rng, all_split=(seed % 2 == 0)), bam_path)
    genome = tmp_path / "genome_full.fa"
    genome_rng = random.Random(99)
    with open(genome, "w") as handle:
        for contig in ("chr1", "chr2"):
            handle.write(">" + contig + "\n")
            handle.write("".join(genome_rng.choice("ACGT")
                                 for _ in range(600000)) + "\n")
    options = default_options.replace(genome=str(genome),
                                      cluster_backend=backend)
    _h, _t, object_sigs, _tw = collect_signatures_from_bam(str(bam_path),
                                                           options)
    _h2, _t2, soa, _tw2 = collect_soa_from_bam(str(bam_path), options)

    object_clusters = cluster_sv_signatures(object_sigs, options)
    soa_clusters = cluster_sv_signatures(soa, options)
    for want_list, have_list in zip(object_clusters, soa_clusters):
        assert ([_flatten_cluster(c) for c in want_list]
                == [_flatten_cluster(c) for c in have_list])


def test_bnd_equal_positions_materialize_stable():
    """pos1 == pos2 BNDs: the constructor's canonical swap must not re-fire
    at materialization (directions would flip)."""
    from svim_tpu.signatures import SignatureTranslocation

    sig = SignatureTranslocation("chr1", 500, "fwd", "chr1", 500, "rev",
                                 "suppl", "readX")
    soa = soa_from_signatures([sig])
    table = soa.tables["BND"]
    table.objects.clear()  # force column materialization
    rebuilt = table.materialize(0)
    assert (rebuilt.direction1, rebuilt.direction2) == (
        sig.direction1, sig.direction2)
    assert rebuilt.as_string() == sig.as_string()
