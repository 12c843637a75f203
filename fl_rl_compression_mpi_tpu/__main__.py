"""``python -m fl_rl_compression_mpi_tpu`` — the `compress` CLI."""

import sys

from .cli import main

sys.exit(main())
