"""SV simulation: synthetic genomes, reads and truth sets for evaluation.

Generates coordinate-consistent alignments for all six SV classes (the
alignments a long-read aligner would produce for a donor genome carrying the
variants), plus background coverage.  Used by scripts/eval_accuracy.py and
the accuracy tests; BASELINE config 2 ("simulated genome, all six SV
classes") is this module's target shape.
"""

from __future__ import annotations

import random
from typing import List, NamedTuple

from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentHeader, parse_sam_line


class TruthVariant(NamedTuple):
    svtype: str      # DEL | INS | INV | DUP:TANDEM | DUP:INT | BND
    contig: str
    start: int       # 0-based
    length: int
    dest_contig: str = None
    dest_pos: int = -1


class SimConfig(NamedTuple):
    genome_length: int = 5_000_000
    second_contig_length: int = 1_000_000
    coverage: int = 12
    n_del: int = 10
    n_ins: int = 10
    n_inv: int = 8
    n_tan: int = 8
    n_dup_int: int = 6
    n_bnd: int = 6
    n_background: int = 200
    seed: int = 1


def _random_genome(rng, length):
    return "".join(rng.choice("ACGT") for _ in range(length))


def simulate(out_dir: str, config: SimConfig = SimConfig()):
    """Write genome.fa and reads.bam under out_dir; return the truth list."""
    import os

    rng = random.Random(config.seed)
    chr1 = _random_genome(rng, config.genome_length)
    chr2 = _random_genome(rng, config.second_contig_length)
    genome_path = os.path.join(out_dir, "genome.fa")
    with open(genome_path, "w") as handle:
        for name, seq in (("chr1", chr1), ("chr2", chr2)):
            handle.write(">{0}\n".format(name))
            for i in range(0, len(seq), 80):
                handle.write(seq[i:i + 80] + "\n")

    header = AlignmentHeader.from_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chr1\tLN:{0}\n@SQ\tSN:chr2\tLN:{1}\n".format(
            len(chr1), len(chr2)))
    lines: List[str] = []
    read_counter = [0]
    truth: List[TruthVariant] = []

    def line(flag, contig, pos0, cigar, seq="*", sa=None):
        read_counter[0] += 1
        tags = "\tSA:Z:{0}".format(sa) if sa else ""
        lines.append("sim{0}\t{1}\t{2}\t{3}\t60\t{4}\t*\t0\t0\t{5}\t*{6}".format(
            read_counter[0], flag, contig, pos0 + 1, cigar, seq, tags))

    def locus(margin=20000):
        return rng.randint(margin, config.genome_length - margin)

    # --- deletions (CIGAR D runs, sequence-accurate reads) ----------------------
    for _ in range(config.n_del):
        position = locus()
        size = rng.randint(50, 900)
        truth.append(TruthVariant("DEL", "chr1", position, size))
        for _ in range(config.coverage):
            left = rng.randint(600, 1800)
            right = rng.randint(600, 1800)
            start = position - left
            seq = chr1[start:position] + chr1[position + size:position + size + right]
            line(0, "chr1", start, "{0}M{1}D{2}M".format(left, size, right), seq)

    # --- insertions (CIGAR I runs with a shared motif) --------------------------
    for _ in range(config.n_ins):
        position = locus()
        size = rng.randint(50, 600)
        motif = _random_genome(rng, size)
        truth.append(TruthVariant("INS", "chr1", position, size))
        for _ in range(config.coverage):
            left = rng.randint(600, 1800)
            right = rng.randint(600, 1800)
            start = position - left
            seq = chr1[start:position] + motif + chr1[position:position + right]
            line(0, "chr1", start, "{0}M{1}I{2}M".format(left, size, right), seq)

    # --- inversions (split reads, both flank directions) ------------------------
    for _ in range(config.n_inv):
        position = locus()
        size = rng.randint(200, 2000)
        truth.append(TruthVariant("INV", "chr1", position, size))
        for flank in range(config.coverage):
            span = rng.randint(500, 1200)
            if flank % 2 == 0:  # left flank: fwd primary then rev supplementary
                line(0, "chr1", position - span, "{0}M{1}S".format(span, size),
                     sa="chr1,{0},-,{1}M{2}S,60,0;".format(position + 1, size, span))
            else:  # right flank: rev primary then fwd supplementary
                line(16, "chr1", position, "{0}S{1}M".format(span, size),
                     sa="chr1,{0},+,{1}S{2}M,60,0;".format(position + size + 1,
                                                           size, span))

    # --- tandem duplications (reference-overlap split reads) --------------------
    for _ in range(config.n_tan):
        position = locus()
        size = rng.randint(150, 1200)
        truth.append(TruthVariant("DUP:TANDEM", "chr1", position, size))
        for _ in range(config.coverage):
            span = rng.randint(400, 900)
            # primary covers [position - span, position + size), supplementary
            # restarts at position (one extra copy)
            line(0, "chr1", position - span,
                 "{0}M{1}S".format(span + size, size + span),
                 sa="chr1,{0},+,{1}S{2}M,60,0;".format(
                     position + 1, span + size, size + span))
        # give every read the same read-level duplication evidence

    # --- interspersed duplications (paired translocations) ----------------------
    for _ in range(config.n_dup_int):
        source = rng.randint(20000, config.second_contig_length - 20000)
        size = rng.randint(100, 800)
        dest = locus()
        truth.append(TruthVariant("DUP:INT", "chr2", source, size,
                                  dest_contig="chr1", dest_pos=dest))
        # the flanking breakend clusters also surface as BND records (the
        # reference emits BND candidates for every translocation cluster,
        # SVIM_COMBINE.py:372-383), forward and mirrored
        truth.append(TruthVariant("BND", "chr1", dest - 1, 0))
        truth.append(TruthVariant("BND", "chr1", dest, 0))
        truth.append(TruthVariant("BND", "chr2", source, 0))
        truth.append(TruthVariant("BND", "chr2", source + size - 1, 0))
        for _ in range(config.coverage):
            span = rng.randint(400, 900)
            total = span + size + span
            line(0, "chr1", dest - span, "{0}M{1}S".format(span, size + span),
                 sa=("chr2,{0},+,{1}S{2}M{3}S,60,0;"
                     "chr1,{4},+,{5}S{6}M,60,0;").format(
                         source + 1, span, size, span,
                         dest + 1, span + size, span))
            del total

    # --- breakends (cross-contig split reads) -----------------------------------
    for _ in range(config.n_bnd):
        position = locus()
        dest = rng.randint(20000, config.second_contig_length - 20000)
        truth.append(TruthVariant("BND", "chr1", position - 1, 0,
                                  dest_contig="chr2", dest_pos=dest))
        truth.append(TruthVariant("BND", "chr2", dest, 0))  # mirrored record
        for _ in range(config.coverage):
            span = rng.randint(400, 900)
            line(0, "chr1", position - span, "{0}M{1}S".format(span, span),
                 sa="chr2,{0},+,{1}S{2}M,60,0;".format(dest + 1, span, span))

    # --- background coverage (clean reads; also genotyping reference support) ---
    for _ in range(config.n_background):
        start = rng.randint(0, config.genome_length - 4000)
        length = rng.randint(2000, 4000)
        line(0, "chr1", start, "{0}M".format(length), chr1[start:start + length])

    lines.sort(key=lambda entry: (entry.split("\t")[2], int(entry.split("\t")[3])))
    records = [parse_sam_line(entry, header) for entry in lines]
    bam_path = os.path.join(out_dir, "reads.bam")
    bamio.write_bam(bam_path, header, records)
    return genome_path, bam_path, truth


def evaluate_vcf(vcf_path: str, truth: List[TruthVariant],
                 position_tolerance: int = 150, size_tolerance: float = 0.3):
    """Match VCF records against the truth set.

    Returns {svtype: (true_positives, false_positives, false_negatives)} plus
    an "ALL" entry; BND reverse records count as one with their mate."""
    calls = []
    with open(vcf_path) as handle:
        for entry in handle:
            if entry.startswith("#"):
                continue
            fields = entry.rstrip("\n").split("\t")
            info = dict(kv.split("=", 1) for kv in fields[7].split(";") if "=" in kv)
            svtype = info.get("SVTYPE")
            pos = int(fields[1]) - 1
            if svtype in ("DEL", "INS"):
                length = abs(int(info.get("SVLEN", 0)))
            elif svtype == "INV":
                length = int(info.get("END", pos)) - pos
            elif svtype in ("DUP:TANDEM", "DUP:INT"):
                length = int(info.get("END", pos)) - pos
            else:
                length = 0
            calls.append((svtype, fields[0], pos, length))

    matched_truth = set()
    matched_calls = set()
    for call_index, (svtype, contig, pos, length) in enumerate(calls):
        for truth_index, variant in enumerate(truth):
            if truth_index in matched_truth:
                continue
            if variant.svtype != svtype or variant.contig != contig:
                continue
            if abs(variant.start - pos) > position_tolerance:
                continue
            if variant.length and length:
                ratio = abs(variant.length - length) / variant.length
                if ratio > size_tolerance:
                    continue
            matched_truth.add(truth_index)
            matched_calls.add(call_index)
            break

    results = {}
    svtypes = sorted(set(v.svtype for v in truth))
    for svtype in svtypes + ["ALL"]:
        relevant_truth = [i for i, v in enumerate(truth)
                          if svtype == "ALL" or v.svtype == svtype]
        relevant_calls = [i for i, c in enumerate(calls)
                          if (svtype == "ALL" or c[0] == svtype)
                          and c[0] in (svtypes if svtype == "ALL" else [svtype])]
        tp = sum(1 for i in relevant_truth if i in matched_truth)
        fn = len(relevant_truth) - tp
        fp = sum(1 for i in relevant_calls if i not in matched_calls)
        results[svtype] = (tp, fp, fn)
    return results


def f1(tp, fp, fn):
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return 2 * precision * recall / (precision + recall)
