"""Entry point: python -m svim_tpu [reads|alignment] ..."""

import sys

from svim_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
