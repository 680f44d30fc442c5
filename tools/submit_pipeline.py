"""Primary script for spark-submit (see ahrd_spark/cli.py for the full
deployment story):

    spark-submit --master local[8] --py-files dist/ahrd_spark.zip \\
        tools/submit_pipeline.py --synth 10000 --out /tmp/triples \\
        --workdir /tmp/ckpt

``ahrd_spark`` resolves from the --py-files zip (this script's own directory
holds no package), proving the artifact is self-contained.
"""

import sys

from ahrd_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
