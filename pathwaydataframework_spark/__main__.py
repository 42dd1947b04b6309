"""``python -m pathwaydataframework_spark`` — the reference's ``pathway``
console entry point (cli.py:318 ``main``)."""

import sys

from pathwaydataframework_spark.cli import main

sys.exit(main())
