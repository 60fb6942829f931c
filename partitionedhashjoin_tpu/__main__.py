"""``python -m partitionedhashjoin_tpu`` — the `phjoin` binary analogue."""

import sys

from partitionedhashjoin_tpu.cli import main

sys.exit(main())
