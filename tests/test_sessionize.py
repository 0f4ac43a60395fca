import numpy as np

from network_feature_extractor_spark.operators import sessionize


def test_burst_stats_micro(spark, micro_turns):
    """ts 0/.1/.2: gaps ~.1 (epoch-double repr can land an ulp above .1,
    so use .15 to stay off the boundary) -> one burst of span .2."""
    got = sessionize.burst_stats(micro_turns, ["conv_id"], threshold=0.15).toPandas()
    assert got["burst_count"].iloc[0] == 1
    assert abs(got["burst_dur_max"].iloc[0] - 0.2) < 1e-6


def test_burst_stats_split(spark, turns, turns_pd):
    """Differential check vs a direct pandas islands implementation."""
    got = (
        sessionize.burst_stats(turns, ["conv_id"], threshold=0.1)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )

    rows = []
    for conv_id, g in turns_pd.groupby("conv_id", sort=True):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        ets = g["ts"].astype("datetime64[us]").astype("int64").to_numpy() / 1e6
        gaps = np.diff(ets, prepend=ets[0])
        island = np.cumsum(gaps > 0.1)
        durs = [ets[island == i].max() - ets[island == i].min() for i in np.unique(island)]
        rows.append((conv_id, len(durs), max(durs)))
    assert len(got) == len(rows)
    for (conv_id, n, mx), (_, r) in zip(rows, got.iterrows()):
        assert r["conv_id"] == conv_id
        assert r["burst_count"] == n, conv_id
        assert abs(r["burst_dur_max"] - mx) < 1e-6, conv_id


def test_active_idle_accounting(spark, turns, turns_pd):
    got = (
        sessionize.active_idle_stats(turns, ["conv_id"], activity_timeout=1.0)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for conv_id, g in turns_pd.groupby("conv_id", sort=True):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        ets = g["ts"].astype("datetime64[us]").astype("int64").to_numpy() / 1e6
        gaps = np.diff(ets)
        idle = gaps[gaps > 1.0]
        r = got[got["conv_id"] == conv_id].iloc[0]
        assert r["idle_periods"] == len(idle), conv_id
        assert abs(r["total_idle_time"] - idle.sum()) < 1e-5, conv_id
        # active + idle spans partition the total duration
        total = ets[-1] - ets[0]
        assert abs((r["total_active_time"] + r["total_idle_time"]) - total) < 1e-5


def test_session_gap_threshold_behaviour(spark, turns):
    """No session may contain an internal gap > threshold; consecutive
    sessions must be separated by > threshold."""
    from pyspark.sql import functions as F

    d = sessionize.with_session_id(turns, gap=300.0)
    bad_internal = d.filter(
        (F.col("gap_prev") > 300.0) & (F.col("session_id") == 0)
    )
    # gap>300 always increments session_id -> no row with gap>300 keeps
    # the previous session id. Verified per conv via window:
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    chk = d.withColumn("prev_sid", F.lag("session_id").over(w)).filter(
        F.col("prev_sid").isNotNull()
    )
    violations = chk.filter(
        ((F.col("gap_prev") > 300.0) & (F.col("session_id") == F.col("prev_sid")))
        | ((F.col("gap_prev") <= 300.0) & (F.col("session_id") != F.col("prev_sid")))
    ).count()
    assert violations == 0
    assert bad_internal.count() == 0


def test_deterministic_sample_rate_and_stability(spark):
    from network_feature_extractor_spark.functions.sampling import deterministic_sample

    df = spark.range(20_000).withColumnRenamed("id", "conv_id")
    s1 = deterministic_sample(df, 0.2, "conv_id")
    n1 = s1.count()
    assert abs(n1 / 20_000 - 0.2) < 0.02  # uniform md5 coin
    # deterministic: same subset every run
    assert s1.exceptAll(deterministic_sample(df, 0.2, "conv_id")).count() == 0
    # nested rates: the 10% sample is a subset of the 20% sample
    s2 = deterministic_sample(df, 0.1, "conv_id")
    assert s2.exceptAll(s1).count() == 0
    # rate 1.0 is identity
    assert deterministic_sample(df, 1.0, "conv_id").count() == 20_000


def test_pipeline_sampling_keeps_whole_conversations(spark, turns):
    from network_feature_extractor_spark.config import EngineConfig
    from network_feature_extractor_spark.plans.pipeline import run_pipeline

    cfg = EngineConfig(sample_rate=0.5, enabled_features=("basic_metrics",))
    enriched, _ = run_pipeline(turns, cfg)
    kept = enriched.select("conv_id").distinct()
    # every kept conversation is complete (turn counts match the input)
    full = turns.join(kept, "conv_id", "left_semi").groupBy("conv_id").count()
    got = enriched.groupBy("conv_id").count()
    diff = full.join(got, "conv_id").filter("full.count != got.count" if False else full["count"] != got["count"])
    assert diff.count() == 0
    assert 0 < kept.count() < turns.select("conv_id").distinct().count()


def test_fused_active_idle_subflows_equals_individual(spark, turns):
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.functions.islands import with_island_id
    from network_feature_extractor_spark.operators import sessionize
    from network_feature_extractor_spark.operators.sessionize import with_session_id

    d = with_session_id(turns)
    key = ["conv_id", "session_id"]
    fused = sessionize.active_idle_subflow_stats(
        d, key, activity_timeout=1.0, order_cols=["ts", "turn_idx"]
    ).toPandas().sort_values(key).reset_index(drop=True)

    ai = sessionize.active_idle_stats(
        d, key, activity_timeout=1.0, order_cols=["ts", "turn_idx"]
    )
    sub = with_island_id(d, key, "ts", 1.0, "_s", order_cols=["ts", "turn_idx"])
    per = sub.groupBy(*key, "_s").agg(
        F.count("*").alias("_t"), F.sum(F.length("text").cast("double")).alias("_c")
    )
    sf = per.groupBy(*key).agg(
        F.count("*").cast("long").alias("subflow_count"),
        F.avg("_t").alias("subflow_turns_mean"),
        F.avg("_c").alias("subflow_chars_mean"),
    )
    joined = ai.join(sf, key).toPandas().sort_values(key).reset_index(drop=True)
    assert set(fused.columns) == set(joined.columns)
    for c in fused.columns:
        if fused[c].dtype == object:
            assert (fused[c] == joined[c]).all(), c
        else:
            import numpy as np

            assert np.allclose(fused[c].astype(float), joined[c].astype(float)), c
