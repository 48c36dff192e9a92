"""Build the --py-files artifact: python tools/make_submit_zip.py [dest]."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ch_pdf_parse_spark.packaging import build_zip  # noqa: E402

if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else None
    print(build_zip(dest))
