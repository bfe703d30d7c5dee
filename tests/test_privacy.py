"""PHI detection/masking + retention operators (operators.privacy) and the
int8 quantization operator (operators.similarity.int8_quantize).

Reference tie-in: the reference classifies features by ``phi_level`` and
gates access by role (feature_registry.py:133-135, :469-475) but never
inspects values; ``Feature.retention_days = 2555`` (feature_registry.py:136)
declares retention no code enforces.  These operators supply both halves.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from feature_store_healthcare_spark import maintenance
from feature_store_healthcare_spark.operators import privacy
from feature_store_healthcare_spark.operators.similarity import int8_quantize


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_masks_every_pattern_class(spark):
    df = _docs(
        spark,
        [
            (
                1,
                "SSN 123-45-6789 phone 555-1234 mrn 000012345 mail a.b@x.org "
                "seen 2024/01/15",
            )
        ],
    )
    out = privacy.scrub_documents(df, "text").collect()[0]
    assert out.text == "SSN [SSN] phone [PHONE] mrn [MRN] mail [EMAIL] seen [DATE]"
    assert (out.n_ssn, out.n_phone, out.n_mrn, out.n_email, out.n_date) == (
        1, 1, 1, 1, 1,
    )
    assert out.phi_total == 5


def test_scrub_order_prevents_double_count(spark):
    # The SSN's trailing ddd-dddd would match the phone pattern, and a
    # 9-digit run inside a masked span must not count as MRN: counts are
    # taken against progressively masked text, so each span counts once.
    df = _docs(spark, [(1, "id 123-45-6789 and 987654321")])
    out = privacy.scrub_documents(df, "text").collect()[0]
    assert out.text == "id [SSN] and [MRN]"
    assert (out.n_ssn, out.n_phone, out.n_mrn) == (1, 0, 1)


def test_scrub_clean_text_untouched(spark):
    df = _docs(spark, [(1, "no identifiers here, just words")])
    out = privacy.scrub_documents(df, "text").collect()[0]
    assert out.text == "no identifiers here, just words"
    assert out.phi_total == 0


def test_retention_split_boundary_is_inclusive(spark):
    cutoff = datetime.datetime(2024, 1, 10)
    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 9, 23, 59, 59)),
            (2, cutoff),
            (3, datetime.datetime(2024, 1, 10, 0, 0, 1)),
        ],
        "id long, ts timestamp_ntz",
    )
    out = {
        r.id: r.retained
        for r in maintenance.retention_split(df, "ts", F.lit(cutoff)).collect()
    }
    assert out == {1: False, 2: True, 3: True}


def test_int8_quantize_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.125]), (2, [3.0, 2.0, -3.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in int8_quantize(df).collect()}
    for r in rows.values():
        assert all(-127 <= c <= 127 for c in r.q_codes)
        # symmetric rounding quantization: error is at most scale/2
        assert r.q_max_abs_err <= r.q_scale / 2 + 1e-15
    assert rows[2].q_scale == pytest.approx(3.0 / 127)
    # exact reconstruction of the max element: code ±127 at full scale
    assert rows[2].q_codes[0] == 127 and rows[2].q_codes[2] == -127


def test_int8_quantize_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = int8_quantize(df).collect()[0]
    assert r.q_codes == [0, 0, 0]
    assert r.q_max_abs_err == 0.0


def test_scrub_plan_is_single_stage_projection(spark):
    # The scrub must stay a pure map (no exchange): one scan-shaped plan.
    df = _docs(spark, [(1, "x")])
    plan = (
        privacy.scrub_documents(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
