"""PySpark-native rebuild of CH-PDF-Parse's extraction pipeline.

Brand-new engine (not a port) with the reference's query/data-processing
capabilities re-expressed Spark-first. See SURVEY.md for the blueprint and
/root/reference for the (read-only) reference semantics.
"""

__version__ = "0.1.0"

from . import constants, core  # noqa: F401
