"""Golden end-to-end VCF: a fixed simulated workload must keep producing the
byte-identical variants.vcf checked in at tests/golden/variants.golden.vcf.

The reference repo has no golden VCFs (its tests are unit-level,
src/tests/*); this fixture pins OUR end-to-end output — every record format
detail of SVCandidate.py's emitters (INFO ordering, SUPPORT counts,
genotypes, dual DUP representations, BND brackets) — so regressions anywhere
in the pipeline surface as a diff.  Regenerate deliberately with:
    python tests/test_golden_vcf.py --regenerate
"""

import os
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "variants.golden.vcf")
_SIM = dict(seed=42, genome_length=900_000, second_contig_length=250_000,
            coverage=9, n_del=3, n_ins=3, n_inv=2, n_tan=2, n_dup_int=2,
            n_bnd=2, n_background=50)


def _normalize(path):
    with open(path) as handle:
        return [line for line in handle if not line.startswith("##fileDate")]


def _run(tmp_dir):
    from svim_tpu.cli import main
    from svim_tpu.sim import SimConfig, simulate

    genome, bam, _truth = simulate(tmp_dir, SimConfig(**_SIM))
    wd = os.path.join(tmp_dir, "wd")
    assert main(["alignment", wd, bam, genome]) == 0
    return os.path.join(wd, "variants.vcf")


def test_golden_vcf(tmp_path):
    produced = _normalize(_run(str(tmp_path)))
    golden = _normalize(GOLDEN)
    assert produced == golden


if __name__ == "__main__":
    import tempfile

    if "--regenerate" not in sys.argv:
        sys.exit("pass --regenerate to rewrite the golden fixture")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    tmp_dir = tempfile.mkdtemp(prefix="svim_golden_")
    vcf = _run(tmp_dir)
    with open(vcf) as src, open(GOLDEN, "w") as dst:
        dst.writelines(line for line in src
                       if not line.startswith("##fileDate"))
    print("golden fixture written:", GOLDEN)
