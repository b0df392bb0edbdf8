"""reads-mode end-to-end tests with stub aligner binaries.

The environment has no ngmlr/minimap2/samtools, so tiny executable stubs on
PATH stand in: the aligner stubs emit a prepared SAM stream and log their
argv; the samtools stub converts/sorts it into a real BGZF BAM (via this
repo's io layer) and creates the .bai marker.  This exercises the full reads
path for real — pipeline construction (SVIM_alignment.py:23-60), BAM cache
reuse (:29,58-60), --nanopore preset plumbing (:37-47), and the file-list
concat loop (svim:68-82) — not just the missing-binary error branch.
"""

import os
import stat
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

from svim_tpu.cli import main

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _run_cli(arguments):
    """main() with the run-log tail attached to failures (this module saw a
    once-in-many-runs rc=1 under box load that vanished on re-run; capture
    the actual logged exception if it ever recurs)."""
    import glob

    rc = main(arguments)
    if rc != 0:
        wd = arguments[1]
        logs = sorted(glob.glob(os.path.join(wd, "SVIM_*.log")))
        tail = ""
        if logs:
            with open(logs[-1]) as handle:
                tail = "".join(handle.readlines()[-30:])
        raise AssertionError("pipeline rc={0}\n--- run log tail ---\n{1}"
                             .format(rc, tail))
    return rc


_ALIGNER_STUB = '''#!{python}
import os, sys
with open(os.environ["SVIM_STUB_LOG"], "a") as log:
    log.write("{name} " + " ".join(sys.argv[1:]) + "\\n")
if "--help" in sys.argv:
    sys.exit(0)
if "-q" not in sys.argv and not sys.stdin.isatty():
    # piped-reads invocation (gunzip -c ... | ngmlr): consume stdin like the
    # real aligner, otherwise the upstream stage dies on EPIPE under
    # pipefail when this stub exits first (was a load-dependent test flake)
    sys.stdin.read()
with open(os.environ["SVIM_STUB_SAM"]) as sam:
    sys.stdout.write(sam.read())
'''

_SAMTOOLS_STUB = '''#!{python}
import os, sys
sys.path.insert(0, {repo!r})
with open(os.environ["SVIM_STUB_LOG"], "a") as log:
    log.write("samtools " + " ".join(sys.argv[1:]) + "\\n")
if "--help" in sys.argv:
    sys.exit(0)
mode = sys.argv[1]
if mode == "view":
    sys.stdout.write(sys.stdin.read())       # SAM text passes through
elif mode == "sort":
    out_path = sys.argv[sys.argv.index("-o") + 1]
    from svim_tpu.io.sam import AlignmentHeader, parse_sam_line
    from svim_tpu.io import bam as bamio
    header_lines, records = [], []
    header = None
    for line in sys.stdin:
        if line.startswith("@"):
            header_lines.append(line.rstrip("\\n"))
            continue
        if header is None:
            header = AlignmentHeader.from_text("\\n".join(header_lines))
        if line.strip():
            records.append(parse_sam_line(line, header))
    records.sort(key=lambda r: (r.reference_id, r.reference_start))
    # stamp the coordinate sort order the pipeline dispatches on
    text = "\\n".join(l for l in header_lines if not l.startswith("@HD"))
    header = AlignmentHeader.from_text("@HD\\tVN:1.6\\tSO:coordinate\\n" + text)
    bamio.write_bam(out_path, header, records)
elif mode == "index":
    with open(sys.argv[2] + ".bai", "wb") as handle:
        handle.write(b"BAI\\x01")
'''

_GUNZIP_STUB = '''#!{python}
import sys
if "--help" in sys.argv:
    sys.exit(0)
import gzip
with gzip.open(sys.argv[-1], "rt") as handle:
    sys.stdout.write(handle.read())
'''


@pytest.fixture
def stub_env(tmp_path, monkeypatch):
    """PATH with stub ngmlr/minimap2/samtools/gunzip + a SAM they 'produce'."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    python = sys.executable
    for name, template in (("ngmlr", _ALIGNER_STUB), ("minimap2", _ALIGNER_STUB),
                           ("samtools", _SAMTOOLS_STUB), ("gunzip", _GUNZIP_STUB)):
        path = bin_dir / name
        path.write_text(template.format(python=python, name=name, repo=REPO_ROOT))
        path.chmod(path.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)

    import random
    rng = random.Random(17)
    genome = "".join(rng.choice("ACGT") for _ in range(60000))
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as handle:
        handle.write(">chr1\n")
        for i in range(0, len(genome), 70):
            handle.write(genome[i:i + 70] + "\n")

    # one clean DEL locus, deep enough to call and genotype
    lines = ["@HD\tVN:1.6\tSO:unknown", "@SQ\tSN:chr1\tLN:60000"]
    for i in range(8):
        start = 20000 - 900 - i * 37
        left = genome[start:20000]
        right = genome[20300:20300 + 1200]
        lines.append("read{0}\t0\tchr1\t{1}\t60\t{2}M300D{3}M\t*\t0\t0\t{4}\t*".format(
            i, start + 1, len(left), len(right), left + right))
    sam_path = tmp_path / "stub_output.sam"
    sam_path.write_text("\n".join(lines) + "\n")

    log_path = tmp_path / "stub_calls.log"
    log_path.write_text("")
    monkeypatch.setenv("PATH", str(bin_dir) + os.pathsep + os.environ["PATH"])
    monkeypatch.setenv("SVIM_STUB_SAM", str(sam_path))
    monkeypatch.setenv("SVIM_STUB_LOG", str(log_path))

    reads_path = tmp_path / "sample.fastq"
    reads_path.write_text("@read0\nACGT\n+\n!!!!\n")
    return tmp_path, str(reads_path), str(genome_path), log_path


def _stub_calls(log_path):
    return [line for line in log_path.read_text().splitlines()
            if "--help" not in line]


def test_reads_mode_end_to_end(stub_env):
    tmp_path, reads_path, genome_path, log_path = stub_env
    wd = str(tmp_path / "wd")
    _run_cli(["reads", wd, reads_path, genome_path])

    # pipeline construction: aligner ran, view/sort/index ran, BAM cached
    calls = _stub_calls(log_path)
    assert any(call.startswith("ngmlr") for call in calls)
    assert any(call.startswith("samtools sort") for call in calls)
    assert any(call.startswith("samtools index") for call in calls)
    bam_path = os.path.join(wd, "sample.ngmlr.coordsorted.bam")
    assert os.path.exists(bam_path) and os.path.exists(bam_path + ".bai")

    # the DEL came through the whole pipeline
    with open(os.path.join(wd, "variants.vcf")) as handle:
        records = [line for line in handle if not line.startswith("#")]
    assert len(records) == 1 and "SVTYPE=DEL" in records[0]
    assert records[0].split("\t")[1] == "20000" and "SVLEN=-300" in records[0]

    # cache reuse: a second run must not re-run the aligner
    before = len(_stub_calls(log_path))
    _run_cli(["reads", wd, reads_path, genome_path])
    after = _stub_calls(log_path)
    assert len(after) == before  # no new aligner/samtools invocations


def test_reads_mode_nanopore_minimap2(stub_env):
    tmp_path, reads_path, genome_path, log_path = stub_env
    wd = str(tmp_path / "wd_ont")
    _run_cli(["reads", wd, reads_path, genome_path,
              "--aligner", "minimap2", "--nanopore", "--cores", "3"])
    calls = _stub_calls(log_path)
    minimap = [call for call in calls if call.startswith("minimap2")]
    assert minimap and "-x map-ont" in minimap[0] and "-t 3" in minimap[0]


def test_reads_mode_ngmlr_nanopore_gzip(stub_env):
    """Gzipped input routes through gunzip | ngmlr with the ont preset."""
    import gzip

    tmp_path, reads_path, genome_path, log_path = stub_env
    gz_path = str(tmp_path / "sample2.fastq.gz")
    with gzip.open(gz_path, "wt") as handle:
        handle.write("@read0\nACGT\n+\n!!!!\n")
    wd = str(tmp_path / "wd_gz")
    _run_cli(["reads", wd, gz_path, genome_path, "--nanopore"])
    calls = _stub_calls(log_path)
    ngmlr = [call for call in calls if call.startswith("ngmlr")]
    assert ngmlr and "-x ont" in ngmlr[0] and "-q" not in ngmlr[0]


def test_reads_mode_file_list(stub_env):
    """A .fn list of read files loops run_alignment and concatenates
    signatures (svim:68-82)."""
    tmp_path, reads_path, genome_path, log_path = stub_env
    second = tmp_path / "other.fastq"
    second.write_text("@read1\nACGT\n+\n!!!!\n")
    list_path = tmp_path / "inputs.fq.fn"
    list_path.write_text(reads_path + "\n" + str(second) + "\n")
    wd = str(tmp_path / "wd_list")
    _run_cli(["reads", wd, str(list_path), genome_path])
    calls = _stub_calls(log_path)
    assert sum(1 for call in calls if call.startswith("ngmlr")) == 2
    assert os.path.exists(os.path.join(wd, "sample.ngmlr.coordsorted.bam"))
    assert os.path.exists(os.path.join(wd, "other.ngmlr.coordsorted.bam"))
    # both files' signature lists concatenated into one DEL call
    with open(os.path.join(wd, "variants.vcf")) as handle:
        records = [line for line in handle if not line.startswith("#")]
    assert len(records) == 1 and "SVTYPE=DEL" in records[0]

    # the default (packed/array) list path must byte-match the host path
    wd_host = str(tmp_path / "wd_list_host")
    _run_cli(["reads", wd_host, str(list_path), genome_path,
              "--device_backend", "host"])
    with open(os.path.join(wd, "variants.vcf")) as handle:
        packed_vcf = [line for line in handle if not line.startswith("##")]
    with open(os.path.join(wd_host, "variants.vcf")) as handle:
        host_vcf = [line for line in handle if not line.startswith("##")]
    assert packed_vcf == host_vcf