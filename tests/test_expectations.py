"""Declarative expectations: audit counts and quarantine routing must
agree row-for-row, NULL predicates count as violations, and the invalid
frame names every failed rule."""

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators import expectations as EX


def _frame(spark):
    rows = [
        (1, 10.0, "a@x.io"),
        (2, -3.0, "b@x.io"),      # range violation
        (3, None, "c@x.io"),      # null amount -> range rule fails too (NULL = fail)
        (None, 5.0, "d@x.io"),    # null id
        (5, 20.0, "not-an-email"),  # pattern violation
        (6, 1e9, None),           # range + null email
    ]
    return spark.createDataFrame(rows, "id long, amount double, email string")


def _rules():
    return [
        EX.not_null("id"),
        EX.in_range("amount", 0.0, 100.0),
        EX.matches("email", r"^[^@]+@[^@]+\.[^@]+$"),
    ]


def test_audit_counts(spark):
    got = {r.rule: (r.violations, r.n_rows) for r in EX.audit(_frame(spark), _rules()).collect()}
    assert got == {
        "not_null_id": (1, 6),
        "in_range_amount": (3, 6),   # -3, NULL, 1e9
        "matches_email": (2, 6),     # bad pattern + NULL email
    }


def test_quarantine_routes_and_names_rules(spark):
    valid, invalid = EX.quarantine(_frame(spark), _rules())
    assert [r.id for r in valid.collect()] == [1]
    got = {r.id: list(r._violations) for r in invalid.collect()}
    assert got[2] == ["in_range_amount"]
    assert got[3] == ["in_range_amount"]
    assert got[None] == ["not_null_id"]
    assert got[5] == ["matches_email"]
    assert got[6] == ["in_range_amount", "matches_email"]
    # audit totals equal quarantine memberships
    audit = {r.rule: r.violations for r in EX.audit(_frame(spark), _rules()).collect()}
    from collections import Counter

    member = Counter(v for vs in got.values() for v in vs)
    assert audit == {k: member.get(k, 0) for k in audit}


def test_referential_rule_flags_orphans(spark):
    facts = spark.createDataFrame([(1, 100), (2, 999), (3, None)], "id long, ref long")
    dim = spark.createDataFrame([(100,), (200,)], "ref long")
    annotated, rule = EX.refers_to(facts, "ref", dim, "ref")
    got = {r.rule: r.violations for r in EX.audit(annotated, [rule]).collect()}
    assert got == {"refers_to_ref": 2}  # orphan + NULL
    valid, invalid = EX.quarantine(annotated, [rule])
    assert [r.id for r in valid.collect()] == [1]
    assert "__ref_ref_ref" not in valid.columns and "__ref_ref_ref" not in invalid.columns
