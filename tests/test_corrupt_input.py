"""Malformed-input diagnostics: truncated/garbage inputs exit the CLI with
a logged error (reference contract: the svim driver's global except logs
the exception and exits nonzero, svim:219-223) and the message names the
problem instead of surfacing a raw struct unpack error."""

import logging

import pytest

from svim_tpu.cli import main
from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentHeader, parse_sam_line


@pytest.fixture()
def dataset(tmp_path):
    header = AlignmentHeader.from_text(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n")
    records = [parse_sam_line(
        "r0\t0\tchr1\t100\t60\t500M60D500M\t*\t0\t0\t" + "A" * 1000 + "\t*",
        header)]
    bam_path = str(tmp_path / "ok.bam")
    bamio.write_bam(bam_path, header, records)
    genome = str(tmp_path / "genome.fa")
    with open(genome, "w") as handle:
        handle.write(">chr1\n" + "ACGT" * 25000 + "\n")
    with open(bam_path, "rb") as handle:
        data = handle.read()
    return tmp_path, data, genome


def _run(tmp_path, blob, genome, name, caplog):
    path = str(tmp_path / (name + ".bam"))
    with open(path, "wb") as handle:
        handle.write(blob)
    with caplog.at_level(logging.ERROR):
        rc = main(["alignment", str(tmp_path / ("wd_" + name)), path, genome])
    return rc, caplog.text


def test_truncated_bam(dataset, caplog):
    tmp_path, data, genome = dataset
    rc, text = _run(tmp_path, data[:len(data) - 30], genome, "trunc", caplog)
    assert rc == 1
    assert "truncated or corrupt" in text
    assert "struct.error" not in text.split("Traceback")[0]


def test_truncated_bgzf(dataset, caplog):
    tmp_path, data, genome = dataset
    rc, text = _run(tmp_path, data[:len(data) // 2], genome, "half", caplog)
    assert rc == 1
    assert "truncated or corrupt" in text


def test_garbage_input(dataset, caplog):
    tmp_path, data, genome = dataset
    rc, text = _run(tmp_path, b"not a bam at all" * 100, genome, "garbage",
                    caplog)
    assert rc == 1
    assert "not valid SAM" in text
