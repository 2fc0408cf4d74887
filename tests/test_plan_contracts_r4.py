"""Final-plan scale contracts for the round-4 session additions:
no Exchange SinglePartition (serial reducer) anywhere in the executed
AQE plans of the new operators (the token_budget lesson: correctness
tests cannot catch a serial plan)."""

from pyspark.sql import functions as F

from easyner_spark.operators.sketches import kmv_set_ops, kmv_sketch
from easyner_spark.operators.triples import (
    entity_summaries,
    infer_entity_types,
    predicate_equivalences,
)
from easyner_spark.sinks.layout import zorder_key


def _final_plan(df):
    df.collect()  # materialize so the AQE plan is final
    return df._jdf.queryExecution().executedPlan().toString()


def _kg(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("e"), (F.col("id") % 37).cast("string")).alias("subj"),
        F.concat(F.lit("p"), (F.col("id") % 5).cast("string")).alias("pred"),
        F.concat(F.lit("e"), ((F.col("id") * 7) % 37).cast("string")).alias("obj"),
    )


def test_predicate_equivalences_no_serial_reducer(spark):
    plan = _final_plan(predicate_equivalences(_kg(spark)))
    assert "Exchange SinglePartition" not in plan


def test_infer_entity_types_no_serial_reducer(spark):
    types = spark.range(30).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("entity_id"),
        F.when(F.col("id") % 2 == 0, F.lit("person"))
        .otherwise(F.lit("org"))
        .alias("ent_type"),
    )
    out = infer_entity_types(_kg(spark), types)
    plan = _final_plan(out)
    assert "Exchange SinglePartition" not in plan
    # the bounded (pred, role, type) vote table rides a broadcast
    assert "BroadcastExchange" in plan


def test_entity_summaries_window_is_keyed(spark):
    plan = _final_plan(entity_summaries(_kg(spark), k=3))
    assert "Exchange SinglePartition" not in plan
    # the rank window must partition BY entity, never globally
    assert "partitionBy" not in plan or "entity_id" in plan


def test_kmv_chain_no_serial_reducer(spark):
    df = spark.range(500).select(
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 97).cast("string")).alias("v"),
    )
    sk = kmv_sketch(df, "v", ["g"], k=16)
    assert "Exchange SinglePartition" not in _final_plan(sk)
    ops = kmv_set_ops(kmv_sketch(df, "v", ["g"], k=16), "g", k=16)
    assert "Exchange SinglePartition" not in _final_plan(ops)


def test_zorder_key_is_pure_projection(spark):
    out = spark.range(100).select(
        (F.col("id") % 8).alias("x"), (F.col("id") % 16).alias("y")
    ).select(zorder_key(["x", "y"], bits=4).alias("z"))
    plan = _final_plan(out)
    assert "Exchange" not in plan  # scan-fused: no shuffle at all
