import sys

from lsafw_tpu.cli import main

sys.exit(main())
