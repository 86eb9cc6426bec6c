"""`python -m lsbench_tpu.scale` → harness.scale (scaling-efficiency sweep)."""

from lsbench_tpu.harness.scale import main

if __name__ == "__main__":
    import sys

    sys.exit(main())
