"""Expectations layer: row/unique/referential checks, the
clean/violations split, summary counts, and the single-scan cost
model for row checks."""

import pytest
from pyspark.sql import functions as F

from etlp_spark import expectations as X


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, "ok"),
            (2, "B", -5.0, "ok"),      # in_range violation
            (3, "Z", 20.0, "ok"),      # accepted_values violation
            (4, "A", 30.0, None),      # not_null violation
            (5, "A", 40.0, "ok"),
            (5, "A", 41.0, "ok"),      # unique(id) violation (both rows)
        ],
        ["id", "flag", "amount", "note"],
    )


def test_validate_splits_and_summarizes(spark, frame):
    ref = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["rid"])
    res = X.validate(
        frame,
        [
            X.not_null("note"),
            X.in_range("amount", 0.0, 100.0),
            X.accepted_values("flag", ["A", "B"]),
            X.unique("id"),
            X.referential("id", ref, "rid"),
        ],
    )
    clean_ids = sorted(r.id for r in res.clean.collect())
    assert clean_ids == [1]  # the only row passing everything
    viol = {r.id: sorted(r.failed_checks) for r in res.violations.collect()}
    assert viol[2] == ["in_range(amount,0.0,100.0)"]
    assert viol[3] == ["accepted_values(flag)"]
    assert viol[4] == ["not_null(note)"]
    # both id=5 rows fail unique AND referential
    fives = [v for k, v in viol.items() if k == 5]
    assert len([r for r in res.violations.collect() if r.id == 5]) == 2
    for v in fives:
        assert "unique(id)" in v and "referential(id)" in v
    summary = {r.check: r.n_violations for r in res.summary.collect()}
    assert summary == {
        "in_range(amount,0.0,100.0)": 1,
        "accepted_values(flag)": 1,
        "not_null(note)": 1,
        "unique(id)": 2,
        "referential(id)": 2,
    }
    # conservation: clean + violations == input
    assert res.clean.count() + res.violations.count() == frame.count()


def test_all_clean_yields_empty_violations(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], ["id", "v"])
    res = X.validate(df, [X.not_null("id"), X.in_range("v", 0.0, 10.0)])
    assert res.violations.count() == 0
    assert res.summary.count() == 0
    assert sorted(r.id for r in res.clean.collect()) == [1, 2]


def test_matches_and_custom_predicate(spark):
    df = spark.createDataFrame(
        [(1, "user@x.com", 2), (2, "nope", 3), (3, None, 10)],
        ["id", "email", "a"],
    )
    res = X.validate(
        df,
        [
            X.matches("email", r"^[^@]+@[^@]+$"),
            X.predicate("a_lt_5", lambda d: F.col("a") < 5),
        ],
    )
    viol = {r.id: sorted(r.failed_checks) for r in res.violations.collect()}
    assert viol == {2: ["matches(email)"], 3: ["a_lt_5", "matches(email)"]}


def test_row_checks_share_one_scan(spark, frame):
    """Cost-model pin: N row-level checks must not become N scans —
    the executed plan reads the source relation exactly once."""
    res = X.validate(
        frame.select("id", "flag", "amount", "note"),
        [
            X.not_null("note"),
            X.in_range("amount", 0.0, 100.0),
            X.accepted_values("flag", ["A", "B"]),
        ],
    )
    res.summary.write.format("noop").mode("overwrite").save()
    plan = res.summary._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") + plan.count("Scan") <= 2  # one source read (+noop)


def test_violations_route_into_error_envelope(spark, frame):
    """The reference's error channel carries wrapped error envelopes
    (src/etlp/utils/async.clj:49-51); contract violations flow into
    the same wire format."""
    from etlp_spark.envelope import wrap_error

    res = X.validate(frame, [X.not_null("note")])
    enveloped = res.violations.select(
        wrap_error(F.to_json(F.struct("id", "failed_checks"))).alias("env")
    )
    rows = enveloped.collect()
    assert len(rows) == 1
    import json

    env = json.loads(rows[0].env)
    assert env["type"] == "error"
    assert "not_null(note)" in env["data"]
