"""PII scan + redaction over structured text columns.

A training-data pipeline has to find and mask personal identifiers
before export. The detection layer here is regex-class based (digit
runs, email shapes) over the driver's synthetic tables — the same
plumbing a production run points at real detectors. Everything is
built-in JVM string/regex expressions (no UDFs), so the scan rides
whole-stage codegen and is a map-only pass at any scale.

Reference parity note: the reference sandbox (KStreamsToKTable.java)
has no privacy layer; this is part of the mandated "operations a
large-scale training-data pipeline would need".

Cross-engine determinism: the regexes stick to character classes and
bounded quantifiers that Java regex (Spark) and RE2 (DuckDB) treat
identically; masking is substring surgery (identical 1-based
semantics in both engines), not lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.registry import query

_DIGIT_RUN = "[0-9]{2,}"
_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

B83_ORACLE = f"""
    SELECT c_custkey,
           concat(
               regexp_replace(
                   substring(c_name, 1, greatest(length(c_name) - 4, 0)),
                   '[0-9]', '*', 'g'),
               substring(c_name, greatest(length(c_name) - 3, 1), 4)
           ) AS masked_name,
           CAST(len(regexp_extract_all(c_name, '{_DIGIT_RUN}'))
                AS INT) AS n_digit_runs,
           regexp_matches(c_name, '{_EMAIL}') AS has_email,
           c_mktsegment
    FROM customer
"""


@query("b83_pii_mask", oracle=B83_ORACLE)
def b83_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect digit-run / email-shaped PII per customer and emit the
    masked form: every digit is starred except the last four (the
    familiar card/account redaction policy).

    Map-only, zero shuffles, whole-stage codegen: the shape a 100 TB
    redaction pass must have — the scan cost IS the operator cost.
    """
    cust = table(spark, sf_dir, "customer")
    name_len = F.length("c_name")
    # greatest() guards keep a value shorter than 5 chars fully in the
    # visible tail (mask nothing) instead of feeding the engines
    # negative substring bounds, where their behaviors diverge
    # (DuckDB errors, Spark returns ''). concat_ws('') instead of
    # concat for the NULL-name row: Spark concat(NULL, NULL) is NULL
    # while DuckDB concat(NULL, NULL) is '' — concat_ws skips NULLs
    # in BOTH engines, so a NULL name masks to '' identically.
    masked = F.concat_ws(
        "",
        F.regexp_replace(
            F.substring(
                F.col("c_name"), F.lit(1), F.greatest(name_len - 4, F.lit(0))
            ),
            "[0-9]",
            "*",
        ),
        F.substring(
            F.col("c_name"), F.greatest(name_len - 3, F.lit(1)), F.lit(4)
        ),
    )
    return cust.select(
        "c_custkey",
        masked.alias("masked_name"),
        F.size(F.regexp_extract_all(F.col("c_name"), F.lit(_DIGIT_RUN), F.lit(0)))
        .cast("int")
        .alias("n_digit_runs"),
        F.col("c_name").rlike(_EMAIL).alias("has_email"),
        "c_mktsegment",
    )
