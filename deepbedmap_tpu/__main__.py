"""``python -m deepbedmap_tpu`` — see deepbedmap_tpu.cli."""

import sys

from deepbedmap_tpu.cli import main

sys.exit(main())
