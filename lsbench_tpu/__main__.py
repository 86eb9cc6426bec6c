import sys

from lsbench_tpu.harness.cli import main

sys.exit(main())
