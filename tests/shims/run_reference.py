"""Run the UNMODIFIED reference SVIM (/root/reference/src/svim) in-process
against this repo's pysam/edlib/spoa/cpuinfo shims.

Usage: python tests/shims/run_reference.py [alignment|reads] <working_dir> \
           <bam_or_reads> <genome> [extra args...]
(the subcommand defaults to "alignment" for backward compatibility)

Run as a subprocess from tests so the reference's root-logger mutation and
module imports stay isolated.  sys.path[0] is this directory, so the shim
modules shadow the (absent) third-party packages automatically.
"""

import importlib.machinery
import importlib.util
import os
import sys

REFERENCE_DRIVER = "/root/reference/src/svim/svim"
REFERENCE_SRC = "/root/reference/src"
REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def main(argv):
    sys.path.insert(1, REPO_ROOT)
    sys.path.insert(1, REFERENCE_SRC)
    # keep everything single-threaded and off any attached accelerator
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    loader = importlib.machinery.SourceFileLoader("svim_reference_driver",
                                                  REFERENCE_DRIVER)
    spec = importlib.util.spec_from_loader(loader.name, loader)
    module = importlib.util.module_from_spec(spec)
    mode = "alignment"
    if argv and argv[0] in ("alignment", "reads"):
        mode = argv.pop(0)
    sys.argv = [REFERENCE_DRIVER, mode] + argv
    loader.exec_module(module)
    return module.main()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
