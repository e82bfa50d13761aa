"""SCD2 emulation: two update waves produce correct validity intervals."""

import datetime as dt

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators.scd import OPEN_END, scd2_init, scd2_merge

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def _hist(spark):
    snap = spark.createDataFrame(
        [(1, "FR", "a@x"), (2, "DE", "b@x")], "id long, pays string, email string"
    )
    h = scd2_init(snap, "id", T0)
    # wave 1: client 1 moves country; client 3 appears
    u1 = spark.createDataFrame(
        [(1, "ES", "a@x"), (2, "DE", "b@x"), (3, "IT", "c@x")],
        "id long, pays string, email string",
    )
    h = scd2_merge(h, u1, "id", ["pays", "email"], T1)
    # wave 2: client 3 changes email
    u2 = spark.createDataFrame([(3, "IT", "c2@x")], "id long, pays string, email string")
    return scd2_merge(h, u2, "id", ["pays", "email"], T2)


def test_scd2_history_shape(spark):
    pdf = _hist(spark).toPandas().sort_values(["id", "valid_from"]).reset_index(drop=True)
    # id 1: two versions (FR closed at T1, ES open); id 2: one untouched;
    # id 3: two versions (c@x closed at T2, c2@x open)
    assert len(pdf) == 5
    one = pdf[pdf.id == 1]
    assert list(one.pays) == ["FR", "ES"]
    assert one.iloc[0].valid_to == T1 and not one.iloc[0].is_current
    assert one.iloc[1].is_current and one.iloc[1].valid_to == OPEN_END
    assert pdf[pdf.id == 2].is_current.all()
    three = pdf[pdf.id == 3]
    assert list(three.email) == ["c@x", "c2@x"]
    assert three.iloc[0].valid_from == T1 and three.iloc[0].valid_to == T2


def test_scd2_exactly_one_current_per_key(spark):
    h = _hist(spark)
    cur = h.filter(F.col("is_current")).groupBy("id").count().toPandas()
    assert (cur["count"] == 1).all()


def test_scd2_null_first_tracked_column_still_updates(spark):
    """Regression: clearing the FIRST tracked column (→ NULL) must still be
    detected as a change, not silently dropped as a no-match."""
    snap = spark.createDataFrame([(1, "FR", "a@x")], "id long, pays string, email string")
    h = scd2_init(snap, "id", T0)
    u = spark.createDataFrame([(1, None, "a@x")], "id long, pays string, email string")
    h = scd2_merge(h, u, "id", ["pays", "email"], T1)
    pdf = h.toPandas().sort_values("valid_from").reset_index(drop=True)
    assert len(pdf) == 2
    assert pdf.iloc[0].pays == "FR" and pdf.iloc[0].valid_to == T1
    assert pdf.iloc[1].pays is None and pdf.iloc[1].is_current


def test_scd2_no_interval_overlap(spark):
    pdf = _hist(spark).toPandas().sort_values(["id", "valid_from"])
    for _id, grp in pdf.groupby("id"):
        prev_to = None
        for _, row in grp.iterrows():
            if prev_to is not None:
                assert row.valid_from == prev_to  # contiguous, non-overlapping
            prev_to = row.valid_to
