"""entity_bursts: exact-integer burst gate + argmax tie-break pinned
on a closed mention log (3 global epochs)."""

from easyner_spark.operators.analysis import entity_bursts


def test_burst_gate_and_ties(spark):
    rows = (
        # 'spike': 1,1,4 across epochs 0,1,2 -> max*E = 12 > 2*total=12? NO (strict >): 4*3=12, 2*6=12 -> not burst
        [("spike", 0)] + [("spike", 1)] + [("spike", 2)] * 4
        # 'burst': 1,6 in epochs 0,2 -> 6*3=18 > 2*7=14 -> burst
        + [("burst", 0)] + [("burst", 2)] * 6
        # 'flat': 2,2,2 -> 2*3=6 > 2*6=12? no
        + [("flat", 0)] * 2 + [("flat", 1)] * 2 + [("flat", 2)] * 2
        # 'tie': counts 3 in epoch 1 and 3 in epoch 2 -> burst_epoch=1
        + [("tie", 1)] * 3 + [("tie", 2)] * 3
    )
    m = spark.createDataFrame(rows, "mention string, epoch long")
    got = {
        r["entity"]: r
        for r in entity_bursts(m, entity_col="mention").collect()
    }

    s = got["spike"]
    assert (s["total_count"], s["n_epochs"], s["max_count"]) == (6, 3, 4)
    assert s["burst_epoch"] == 2
    assert not s["is_burst"]  # boundary: equality is NOT a burst

    b = got["burst"]
    assert b["is_burst"] and b["burst_epoch"] == 2
    assert (b["total_count"], b["n_epochs"], b["max_count"]) == (7, 2, 6)

    assert not got["flat"]["is_burst"]
    assert got["tie"]["burst_epoch"] == 1  # smallest epoch wins count ties


def test_threshold_knob(spark):
    # with burst_num/burst_den = 1/1 the gate is "above its own mean"
    rows = [("x", 0)] + [("x", 1)] * 2 + [("y", 0)] + [("y", 1)]
    m = spark.createDataFrame(rows, "mention string, epoch long")
    got = {
        r["entity"]: r["is_burst"]
        for r in entity_bursts(m, entity_col="mention", burst_num=1).collect()
    }
    assert got["x"]  # 2*2 > 1*3
    assert not got["y"]  # 1*2 > 1*2 is false
