"""Contracts for the single-scan attributes table (b124) and the
attribute-gated funnel (b125): plan pins (the single-text-scan claim
is structural, so it is asserted on the physical plan, not trusted),
and drift pins against the standalone operators whose cores b124
composes."""

from __future__ import annotations

import pytest

from kafka_streams_sandbox_spark.operators.attributes import (
    attributes_path,
    b124_quality_attributes,
    b125_attribute_gated_funnel,
    build_attributes,
)

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_build_plan_has_no_documents_filescan(spark):
    """The composed frame must read the checkpointed base, never the
    corpus parquet: ZERO documents-parquet FileScans in the plan (the
    one real scan happened inside the lazy checkpoint's
    materialization — the single-scan pin)."""
    df = build_attributes(spark, SF)
    plan = _executed_plan(df)
    assert "documents.parquet" not in plan


def test_b125_plan_reads_attributes_not_text(spark):
    """The funnel's plan must scan the staged attributes parquet and
    nothing text-shaped — the Dolma-pattern guarantee that a gate
    re-run never pays a corpus text pass."""
    df = b125_attribute_gated_funnel(spark, SF)
    plan = _executed_plan(df)
    assert "kss-attrs-" in plan
    assert "documents.parquet" not in plan
    assert "text" not in plan  # no text column is even read


def test_attributes_match_standalone_operators(spark):
    """Column-level drift pins: the attributes row for every doc must
    equal the standalone b69 / b102 / b108 / b116-family outputs (the
    shared-core promise made physical)."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b69_quality_gate,
        b108_bigram_lm_gate,
    )
    from kafka_streams_sandbox_spark.operators.text import (
        b102_gopher_repetition,
    )

    attrs = {
        r["doc_id"]: r
        for r in b124_quality_attributes(spark, SF).collect()
    }
    for r in b69_quality_gate(spark, SF).collect():
        a = attrs[r["doc_id"]]
        assert (a["n_tokens"], a["repetition_ratio"], a["q_verdict"]) == (
            r["n_tokens"],
            r["repetition_ratio"],
            r["verdict"],
        )
    for r in b102_gopher_repetition(spark, SF).collect():
        a = attrs[r["doc_id"]]
        assert (
            a["top2_frac"],
            a["top3_frac"],
            a["dup5_cov"],
            a["dup10_cov"],
            a["passes_repetition"],
        ) == (
            r["top2_frac"],
            r["top3_frac"],
            r["dup5_cov"],
            r["dup10_cov"],
            r["passes_repetition"],
        )
    for r in b108_bigram_lm_gate(spark, SF).collect():
        a = attrs[r["doc_id"]]
        assert (a["n_bigrams"], a["lm_score"], a["passes_lm"]) == (
            r["n_bigrams"],
            r["lm_score"],
            r["passes_lm"],
        )


def test_funnel_counts_are_exhaustive_and_disjoint(spark):
    """Every doc lands in exactly one gate; totals reconcile with the
    attributes table."""
    attrs_n = b124_quality_attributes(spark, SF).count()
    rows = b125_attribute_gated_funnel(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == attrs_n
    gates = {r["gate"] for r in rows}
    assert gates <= {
        "1_too_short",
        "2_trigram_repetition",
        "3_gopher_repetition",
        "4_lm_atypical",
        "5_dsir_offtarget",
        "6_keep",
    }
    # the cascade must actually discriminate on this corpus (a funnel
    # that routes everything to one gate is a dead fixture)
    assert len(gates) >= 2


def test_attributes_staging_is_memoized(spark):
    p1 = attributes_path(spark, SF)
    p2 = attributes_path(spark, SF)
    assert p1 == p2
