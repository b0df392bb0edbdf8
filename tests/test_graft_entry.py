"""Driver entry points: jittable forward step + multi-chip dry run."""

import sys

import jax

sys.path.insert(0, ".")

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    outputs = jax.jit(fn)(*args)
    assert len(outputs) == 11  # 5 geometry columns + 6 event fields
    jax.block_until_ready(outputs)


def test_dryrun_multichip():
    __graft_entry__.dryrun_multichip(2)
    __graft_entry__.dryrun_multichip(8)


def test_queryname_bam_cli(tmp_path):
    """Queryname-sorted BAM input routes to the grouping analyzer and skips
    genotyping (reference: svim:103-106)."""
    from svim_tpu.cli import main
    from svim_tpu.io import bam as bamio
    from svim_tpu.io.sam import AlignmentFile

    genome = "ACGT" * 2500
    genome_path = tmp_path / "g.fa"
    genome_path.write_text(">chr1\n" + genome + "\n")
    header = ("@HD\tVN:1.6\tSO:queryname\n@SQ\tSN:chr1\tLN:10000\n")
    lines = ["q{0}\t0\tchr1\t{1}\t60\t500M100D500M\t*\t0\t0\t{2}\t*".format(
        i, 1001 + i, "A" * 1000) for i in range(4)]
    sam_path = tmp_path / "q.sam"
    sam_path.write_text(header + "\n".join(lines) + "\n")
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "q.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))

    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), str(bam_path), str(genome_path)]) == 0
    body = [line for line in open(workdir / "variants.vcf")
            if not line.startswith("#")]
    assert len(body) == 1 and "SVTYPE=DEL" in body[0]
    # genotyping skipped: sample column stays ./.
    assert body[0].split("\t")[9].startswith("./.")
