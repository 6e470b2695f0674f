"""great_expectations_spark — a PySpark-native declarative data-validation engine.

A from-scratch rebuild of the observable semantics of great_expectations
(reference: matthieucan/great_expectations @ 0.15.21) designed Spark-first:

- Expectation suites compile (driver-side) into ONE bundled Catalyst aggregate
  pass per domain (``df.rollup(partition_cols).agg(*all_metric_exprs)``) —
  per-partition verdicts + a global rollup from a single scan
  (reference bundles per-domain aggregates at
  great_expectations/execution_engine/sparkdf_execution_engine.py:649-743; we
  extend the same idea with GROUPING SETS and cross-expectation metric dedup).
- Map expectations are boolean Column expressions (JVM-side, whole-stage
  codegen); violation samples come from one unioned follow-up job.
- Uniqueness / referential-integrity checks are shuffle-bounded groupBy /
  broadcast-or-sortmerge anti-joins, never windows over a global ordering.
- Image-payload expectations run through Arrow-batched pandas UDFs (no
  per-row Python), over an image+caption table
  (image_id, bytes, w, h, fmt, caption, phash).
- Distribution drift (KL / PSI / KS / chi-square) from histogram counts
  computed inside the same bundled aggregate pass; test statistics are
  driver-side math over the histogram (no extra scan).
"""

from great_expectations_spark.core.config import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.core.result import (
    ExpectationValidationResult,
    SuiteValidationResult,
    parse_result_format,
)
from great_expectations_spark.engine import SparkValidationEngine, validate

__all__ = [
    "ExpectationConfiguration",
    "ExpectationSuite",
    "ExpectationValidationResult",
    "SuiteValidationResult",
    "SparkValidationEngine",
    "parse_result_format",
    "validate",
]

__version__ = "0.1.0"
