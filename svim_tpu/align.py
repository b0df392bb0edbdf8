"""Read alignment wrapper for `reads` mode.

Behavioral contract: svim/SVIM_alignment.py — shell out to
ngmlr/minimap2 | samtools view | samtools sort + samtools index, with caching
of an existing <prefix>.<aligner>.coordsorted.bam.
"""

from __future__ import annotations

import logging
import os
from subprocess import CalledProcessError, run


class ToolMissingError(Exception):
    pass


class AlignmentPipelineError(Exception):
    pass


def check_prerequisites(aligner):
    with open(os.devnull, "w") as devnull:
        try:
            run(["gunzip", "--help"], stdout=devnull, stderr=devnull, check=True)
            run([aligner, "--help"], stdout=devnull, stderr=devnull, check=True)
            run(["samtools", "--help"], stdout=devnull, stderr=devnull, check=True)
        except FileNotFoundError as error:
            raise ToolMissingError(
                "The alignment pipeline cannot be started because {0} was not "
                "found. Is it installed and in the PATH?".format(error.filename)) from error
        except CalledProcessError as error:
            raise ToolMissingError(
                "The alignment pipeline cannot be started because {0} failed.".format(
                    " ".join(error.cmd))) from error


def run_alignment(working_dir, genome, reads_path, reads_type, cores, aligner, nanopore):
    """Align reads and produce a coordinate-sorted, indexed BAM
    (reference: SVIM_alignment.py:23-60)."""
    check_prerequisites(aligner)
    reads_file_prefix = os.path.splitext(os.path.basename(reads_path))[0]
    full_aln = "{0}/{1}.{2}.coordsorted.bam".format(working_dir, reads_file_prefix, aligner)
    full_aln_index = full_aln + ".bai"
    if os.path.exists(full_aln) and os.path.exists(full_aln_index):
        logging.warning("Alignment output file {0} already exists. Skip alignment "
                        "and use the existing file.".format(full_aln))
        return full_aln
    try:
        command_align = ["set", "-o", "pipefail", "&&"]
        if aligner == "ngmlr":
            if reads_type in ("fasta_gzip", "fastq_gzip"):
                command_align += ["gunzip", "-c", os.path.realpath(reads_path),
                                  "|", "ngmlr", "-t", str(cores), "-r", genome]
            else:
                command_align += ["ngmlr", "-t", str(cores), "-r", genome,
                                  "-q", os.path.realpath(reads_path)]
            if nanopore:
                command_align += ["-x", "ont"]
        elif aligner == "minimap2":
            preset = "map-ont" if nanopore else "map-pb"
            command_align += ["minimap2", "-t", str(cores), "-x", preset, "-a",
                              genome, os.path.realpath(reads_path)]
        command_align += ["|", "samtools", "view", "-b", "-@", str(cores)]
        command_align += ["|", "samtools", "sort", "-@", str(cores), "-o", full_aln]
        logging.info("Starting alignment pipeline..")
        run(" ".join(command_align), shell=True, check=True, executable="/bin/bash")
        run("samtools index " + full_aln, shell=True, check=True, executable="/bin/bash")
    except CalledProcessError as error:
        raise AlignmentPipelineError(
            "The alignment pipeline failed with exit code {0}. Command was: {1}".format(
                error.returncode, error.cmd)) from error
    logging.info("Alignment pipeline finished")
    return full_aln
