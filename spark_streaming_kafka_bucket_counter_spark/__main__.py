"""``python -m spark_streaming_kafka_bucket_counter_spark <config.ini>`` — the
reference's CLI launch contract (main.py:324-336, argv[1] = config path)."""

import sys

from .cli import main

sys.exit(main())
