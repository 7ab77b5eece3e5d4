"""timeseries operators: resample, gap_fill LOCF semantics, cohort math."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka2iceberg_spark import timeseries as ts

HOUR_US = 3_600_000_000


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), k, v)
            for i, (m, k, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, key string, value double",
    )


def test_resample_buckets_and_exact_cents(spark):
    df = _events(
        spark,
        [(0, "a", 1.005), (30, "a", 2.0), (90, "a", 0.5), (61, "b", 10.0)],
    )
    r = ts.resample(df, "ts", HOUR_US, ["key"], value_col="value")
    got = {
        (x["key"], x["bucket_us"]): (x["n"], x["v_cents"])
        for x in r.collect()
    }
    base = 1_704_067_200_000_000  # 2024-01-01T00:00Z epoch micros
    # 1.005*100 is the IEEE double 100.4999... -> 100 cents; + 200 = 300.
    # Both engines round the same double, so cents stay engine-identical.
    assert got[("a", base)] == (2, 300)
    assert got[("a", base + HOUR_US)] == (1, 50)
    assert got[("b", base + HOUR_US)] == (1, 1000)


def test_gap_fill_densifies_zero_counts_and_locf(spark):
    # key "a" active in hours 0 and 3 -> hours 1, 2 must appear with n=0
    df = _events(spark, [(0, "a", 1.0), (185, "a", 2.0)])
    r = ts.resample(df, "ts", HOUR_US, ["key"], value_col="value")
    g = ts.gap_fill(r, HOUR_US, ["key"], locf_cols=["v_cents"]).orderBy(
        "bucket_us"
    )
    rows = g.collect()
    assert len(rows) == 4  # dense grid: hours 0..3 inclusive
    assert [x["n"] for x in rows] == [1, 0, 0, 1]
    # LOCF: gap hours carry hour 0's value; observed column stays NULL there
    assert [x["v_cents"] for x in rows] == [100, 100, 100, 200]
    assert [x["v_cents_obs"] for x in rows] == [100, None, None, 200]
    # grid is contiguous at exactly one step
    buckets = [x["bucket_us"] for x in rows]
    assert all(b - a == HOUR_US for a, b in zip(buckets, buckets[1:]))


def test_gap_fill_leading_gap_stays_null(spark):
    # value observed only in the SECOND bucket: LOCF must not invent a value
    # for the first (no observation to carry), while n still zero-fills
    df = _events(spark, [(0, "a", 1.0), (70, "a", 3.0)])
    r = ts.resample(
        df.where(F.col("value") > 2.0).unionByName(
            df.where(F.col("value") <= 2.0).withColumn(
                "value", F.lit(None).cast("double")
            )
        ),
        "ts",
        HOUR_US,
        ["key"],
        value_col="value",
    )
    g = ts.gap_fill(r, HOUR_US, ["key"], locf_cols=["v_cents"]).orderBy(
        "bucket_us"
    )
    rows = g.collect()
    assert rows[0]["v_cents"] is None  # nothing before it to carry
    assert rows[1]["v_cents"] == 300


def test_cohort_retention_counts_and_ppm(spark):
    # users 1,2 start hour 0; user 1 returns hour 1; user 3 starts hour 1
    df = _events(
        spark,
        [(0, "u1", 0.0), (5, "u2", 0.0), (65, "u1", 0.0), (70, "u3", 0.0)],
    ).withColumn("user_id", F.col("key"))
    r = ts.cohort_retention(df, "ts", "user_id", HOUR_US)
    got = {
        (x["cohort_us"], x["bucket_offset"]): (
            x["active_users"],
            x["cohort_size"],
            x["retention_ppm"],
        )
        for x in r.collect()
    }
    base = 1_704_067_200_000_000
    assert got[(base, 0)] == (2, 2, 1_000_000)
    assert got[(base, 1)] == (1, 2, 500_000)
    assert got[(base + HOUR_US, 0)] == (1, 1, 1_000_000)
    assert len(got) == 3


def test_cusum_recurrence_hand_computed(spark):
    # series per key "a": v = [110, 90, 130, 50]; target=100, slack=0:
    # s = max(0, prev + (v - 100)): 10, 0, 30, 0 -> drift at threshold 20
    # only on the third bucket
    rows = [("a", i, v) for i, v in enumerate([110, 90, 130, 50])]
    df = spark.createDataFrame(
        [(k, b * HOUR_US, v) for k, b, v in rows],
        "key string, bucket_us long, v long",
    )
    out = (
        ts.cusum_flags(df, ["key"], "v", 100, 0, 20)
        .orderBy("bucket_us")
        .collect()
    )
    assert [r.cusum_cents for r in out] == [10, 0, 30, 0]
    assert [r.drift for r in out] == [False, False, True, False]


def test_cusum_keys_independent(spark):
    # key "b" drifting must not leak into flat key "a"
    rows = [("a", i, 100) for i in range(4)] + [("b", i, 200) for i in range(4)]
    df = spark.createDataFrame(
        [(k, b * HOUR_US, v) for k, b, v in rows],
        "key string, bucket_us long, v long",
    )
    out = ts.cusum_flags(df, ["key"], "v", 100, 0, 150).collect()
    got = {(r.key, r.bucket_us // HOUR_US): (r.cusum_cents, r.drift) for r in out}
    assert all(got[("a", i)] == (0, False) for i in range(4))
    assert got[("b", 3)] == (400, True)


def test_trend_exact_line_and_r2(spark):
    # y = 3x + 7 exactly -> slope 3, intercept 7, r2 = 1
    df = spark.createDataFrame(
        [("a", x, 3 * x + 7) for x in range(10)]
        + [("b", x, 100) for x in range(5)],  # flat: slope 0
        "key string, x long, y long",
    )
    got = {r.key: (r.n, r.slope, r.intercept, r.r2) for r in
           ts.trend(df, ["key"], "x", "y").collect()}
    assert got["a"] == (10, 3.0, 7.0, 1.0)
    # flat series: slope 0; R^2 undefined (zero y-variance) -> NULL,
    # matching SQL division-by-zero semantics
    assert got["b"] == (5, 0.0, 100.0, None)


def test_autocorr_hand_example_and_constant_null(spark):
    rows = [("a", i * HOUR_US, v) for i, v in enumerate([1, 2, 3, 4])]
    rows += [("c", i * HOUR_US, 5) for i in range(4)]  # constant series
    r = spark.createDataFrame(rows, "key string, bucket_us long, v long")
    got = {
        (x["key"], x["lag"]): x["acf"]
        for x in ts.autocorr(r, ["key"], "v", max_lag=2).collect()
    }
    # series 1,2,3,4: mean 2.5; lag1 acf = 1.25/5 = 0.25
    assert got[("a", 1)] == 0.25
    # lag2: (1-2.5)(3-2.5)+(2-2.5)(4-2.5) = -0.75-0.75 = -1.5 -> -0.3
    assert got[("a", 2)] == -0.3
    # zero variance -> NULL, not a crash or infinity
    assert got[("c", 1)] is None and got[("c", 2)] is None


def test_dow_profile_epoch_arithmetic(spark):
    day = 86_400_000_000
    # epoch day 0 = Thursday(4), day 3 = Sunday(0)
    rows = [("a", 0 * day, 100), ("a", 3 * day, 300)]
    r = spark.createDataFrame(rows, "key string, bucket_us long, v long")
    got = {
        x["dow"]: (x["v_cents"], x["mean_cents"], x["share_ppm"])
        for x in ts.dow_profile(r, ["key"], "v").collect()
    }
    assert got[4] == (100, 100.0, 250_000)
    assert got[0] == (300, 300.0, 750_000)


def _funnel_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )


def test_window_funnel_depths(spark):
    T = dt.datetime(2000, 1, 1)
    sec = dt.timedelta(seconds=1)
    ev = _funnel_events(
        spark,
        [
            # full chain inside the window
            (1, T, 1, "view"), (1, T + 10 * sec, 2, "click"),
            (1, T + 20 * sec, 3, "purchase"),
            # click too late: depth stalls at 1
            (2, T, 4, "view"), (2, T + dt.timedelta(hours=2), 5, "click"),
            # out of order: purchase before any view
            (3, T, 6, "purchase"), (3, T + sec, 7, "click"),
        ],
    )
    out = {
        r["user_id"]: r["funnel_depth"]
        for r in ts.window_funnel(
            ev, ["view", "click", "purchase"], window_us=3600 * 1_000_000
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 0}


def test_window_funnel_later_anchor_wins(spark):
    # the second view restarts the clock: purchase is within the window
    # of the LATER view only — a first-anchor-only fold would miss it
    T = dt.datetime(2000, 1, 1)
    m = dt.timedelta(minutes=1)
    ev = _funnel_events(
        spark,
        [
            (1, T, 1, "view"),
            (1, T + 50 * m, 2, "view"),
            (1, T + 55 * m, 3, "click"),
            (1, T + 70 * m, 4, "purchase"),
        ],
    )
    out = ts.window_funnel(
        ev, ["view", "click", "purchase"], window_us=3600 * 1_000_000
    ).collect()
    assert out[0]["funnel_depth"] == 3


def test_window_funnel_window_binds_to_chain_anchor(spark):
    # click within window of view, purchase within window of the CHAIN
    # ANCHOR (the view), not of the click — classic windowFunnel contract
    T = dt.datetime(2000, 1, 1)
    m = dt.timedelta(minutes=1)
    ev = _funnel_events(
        spark,
        [
            (1, T, 1, "view"),
            (1, T + 50 * m, 2, "click"),
            (1, T + 80 * m, 3, "purchase"),  # 80m > 60m from the view
        ],
    )
    out = ts.window_funnel(
        ev, ["view", "click", "purchase"], window_us=3600 * 1_000_000
    ).collect()
    assert out[0]["funnel_depth"] == 2


class TestHoltLinear:
    def _smoothed(self, spark, values):
        df = _events(
            spark, [(60 * i, "a", float(v)) for i, v in enumerate(values)]
        )
        r = ts.resample(df, "ts", HOUR_US, ["key"], value_col="value")
        rows = (
            ts.holt_linear(r, ["key"], "v_cents")
            .orderBy("bucket_us")
            .collect()
        )
        return [
            (x["level_cents"], x["trend_cents"], x["forecast_cents"])
            for x in rows
        ]

    def test_hand_computed_recurrence_with_negative_trend(self, spark):
        # cents: 1000, 2000, 400.  Hand trace (trunc-toward-zero div):
        # i=1: l=1000 b=0
        # i=2: l=(1000+0+2000)div2=1500  b=(0+(1500-1000))div2=250
        # i=3: l=(1500+250+400)div2=1075 b=(250+(1075-1500))div2=-87
        #   (250-425 = -175; -175 div 2 truncates to -87, NOT floors to -88)
        got = self._smoothed(spark, [10.0, 20.0, 4.0])
        assert got == [
            (1000, 0, 1000),
            (1500, 250, 1750),
            (1075, -87, 988),
        ]

    def test_constant_series_has_zero_trend_and_exact_level(self, spark):
        got = self._smoothed(spark, [5.0] * 6)
        assert all(g == (500, 0, 500) for g in got)

    def test_keys_fold_independently(self, spark):
        df = _events(
            spark,
            [(0, "a", 10.0), (60, "a", 20.0), (0, "b", 100.0)],
        )
        r = ts.resample(df, "ts", HOUR_US, ["key"], value_col="value")
        got = {
            (x["key"], x["bucket_us"]): x["level_cents"]
            for x in ts.holt_linear(r, ["key"], "v_cents").collect()
        }
        base = 1_704_067_200_000_000
        assert got[("a", base)] == 1000
        assert got[("a", base + HOUR_US)] == 1500
        assert got[("b", base)] == 10000  # b untouched by a's trend


class TestOHLCTwapBalance:
    def _df(self, spark, rows):
        return _events(spark, rows)

    def test_ohlc_hand_computed(self, spark):
        df = self._df(
            spark,
            [(0, "a", 3.0), (10, "a", 9.0), (20, "a", 1.0), (30, "a", 5.0)],
        )
        df = df.withColumn(
            "v_cents",
            (F.col("value") * 100).cast("long"),
        )
        r = ts.ohlc(df, "ts", "event_id", ["key"], "v_cents", HOUR_US).collect()
        assert len(r) == 1
        x = r[0]
        assert (x["open_cents"], x["high_cents"], x["low_cents"],
                x["close_cents"], x["n"]) == (300, 900, 100, 500, 4)

    def test_twap_weights_by_hold_time(self, spark):
        # value 100 held 54 min of the hour, value 400 the last 6 min:
        # twap = (100*54 + 400*6) / 60 = 130
        df = self._df(spark, [(0, "a", 1.0), (54, "a", 4.0)])
        df = df.withColumn("v_cents", (F.col("value") * 100).cast("long"))
        x = ts.twap(df, "ts", "event_id", ["key"], "v_cents", HOUR_US).collect()[0]
        assert x["twap_cents"] == 130.0
        assert x["span_us"] == HOUR_US

    def test_running_balance_clamps_and_tracks_loss(self, spark):
        df = self._df(
            spark,
            [(0, "a", 10.0), (60, "a", -25.0), (120, "a", 7.0)],
        )
        r = ts.resample(df, "ts", HOUR_US, ["key"], value_col="value")
        deltas = r.select("key", "bucket_us", F.col("v_cents").alias("d"))
        rows = {
            x["bucket_us"]: (x["balance"], x["lost"])
            for x in ts.running_balance(deltas, ["key"], "d").collect()
        }
        base = 1_704_067_200_000_000
        # 1000 -> clamp(1000-2500)=0 with 1500 lost -> 700
        assert rows[base] == (1000, 0)
        assert rows[base + HOUR_US] == (0, 1500)
        assert rows[base + 2 * HOUR_US] == (700, 1500)


class TestTransitionEntropy:
    def test_hand_computed(self, spark):
        import math

        # conv A: u->a->u->a (deterministic u<->a); conv B: u->t, u->a
        rows = [
            ("A", 0, "u"), ("A", 1, "a"), ("A", 2, "u"), ("A", 3, "a"),
            ("B", 0, "u"), ("B", 1, "t"), ("B", 2, "u"), ("B", 3, "a"),
        ]
        df = spark.createDataFrame(rows, "conv string, idx int, role string")
        out = {
            r["prev_state"]: (r["n"], r["entropy"])
            for r in ts.transition_entropy(
                df, ["conv"], ["idx"], "role"
            ).collect()
        }
        # after 'u': {a: 3, t: 1} -> H = ln4 - (3 ln3 + 1 ln1)/4
        want = math.log(4) - (3 * math.log(3)) / 4
        assert out["u"][0] == 4
        assert abs(out["u"][1] - want) < 1e-5
        # after 'a' (a->u once; trailing 'a' has no successor) and
        # after 't' (t->u once): deterministic
        assert out["a"] == (1, 0.0)
        assert out["t"] == (1, 0.0)
        # +0.0 guard: never IEEE negative zero
        assert all(math.copysign(1.0, v[1]) == 1.0 for v in out.values())


class TestHoltWinters:
    def test_hand_computed_period2(self, spark):
        # alternating series, m=2: warm-up i<=2, then the dyadic
        # recurrence (values traced by hand, incl. negative div)
        rows = [("k", i * HOUR_US, v) for i, v in
                enumerate([10, 20, 10, 20])]
        df = spark.createDataFrame(rows, "key string, bucket_us long, v long")
        out = {r["bucket_us"] // HOUR_US: r for r in
               ts.holt_winters(df, ["key"], "v", period=2).collect()}
        assert (out[0]["level_cents"], out[0]["trend_cents"],
                out[0]["season_cents"]) == (10, 0, 0)
        assert (out[1]["level_cents"], out[1]["trend_cents"],
                out[1]["season_cents"]) == (20, 0, 0)
        # i=3: l=(10-0+20+0)/2=15, b=(0+(15-20))/2=-2, s=(10-15+0)/2=-2
        assert (out[2]["level_cents"], out[2]["trend_cents"],
                out[2]["season_cents"]) == (15, -2, -2)
        # i=4: l=(20-0+15-2)/2=16, b=(-2+1)/2=0, s=(20-16+0)/2=2
        assert (out[3]["level_cents"], out[3]["trend_cents"],
                out[3]["season_cents"]) == (16, 0, 2)
        # forecast at i=4 = l + b + s_{i-1} = 16 + 0 + (-2)
        assert out[3]["forecast_cents"] == 14

    def test_constant_series_flat_forecast(self, spark):
        rows = [("k", i * HOUR_US, 100) for i in range(20)]
        df = spark.createDataFrame(rows, "key string, bucket_us long, v long")
        last = sorted(
            ts.holt_winters(df, ["key"], "v", period=7).collect(),
            key=lambda r: r["bucket_us"],
        )[-1]
        assert last["level_cents"] == 100
        assert last["trend_cents"] == 0
        assert last["forecast_cents"] == 100


class TestSeasonalAnomalies:
    def test_weekly_rhythm_not_flagged_break_flagged(self, spark):
        DAY = 86_400_000_000
        # two full weeks of a strong weekly shape (weekend = 200, weekday
        # = 100), then a third week whose Saturday collapses to 100
        rows = []
        for w in range(3):
            for dref in range(7):
                b = (w * 7 + dref) * DAY
                dow = (w * 7 + dref + 4) % 7
                v = 200 if dow in (5, 6) else 100
                rows.append(("k", b, v))
        # break: make the last Saturday (dow 5) collapse
        rows = [
            (k, b, 100 if (b // DAY + 4) % 7 == 5 and b // DAY >= 14 else v)
            for (k, b, v) in rows
        ]
        df = spark.createDataFrame(rows, "event_type string, bucket_us long, v_cents long")
        out = ts.seasonal_anomalies(
            df, ["event_type"], "v_cents", z_threshold=2.0
        ).collect()
        # exactly the broken Saturday fires; steady rhythm does not
        assert len(out) == 1
        r = out[0]
        assert (r["bucket_us"] // DAY + 4) % 7 == 5
        assert r["resid_cents"] < 0


class TestLagFeatures:
    def test_alignment_and_ma(self, spark):
        rows = [("k", i * HOUR_US, (i + 1) * 10) for i in range(5)]
        df = spark.createDataFrame(rows, "event_type string, bucket_us long, v_cents long")
        out = {r["bucket_us"] // HOUR_US: r for r in
               ts.lag_features(df, ["event_type"], "v_cents",
                               lags=(1, 2), ma_window=3).collect()}
        # values: 10 20 30 40 50
        assert out[0]["lag_1"] is None and out[0]["ma_3"] == 10
        assert out[2]["lag_1"] == 20 and out[2]["lag_2"] == 10
        # ma_3 at i=2: (10+20+30) div 3 = 20; early rows use true short window
        assert out[1]["ma_3"] == 15 and out[2]["ma_3"] == 20
        # label = next bucket's value; tail stays NULL
        assert out[3]["target"] == 50 and out[4]["target"] is None


class TestBurstiness:
    def test_regular_vs_bursty(self, spark):
        # regular: exactly 5 per hour -> variance 0 -> fano 0
        rows = [("reg", i * HOUR_US, 5) for i in range(6)]
        # bursty: one hour with 30, surrounding silent hours appear via
        # gap_fill as true zeros
        rows += [("burst", 0, 30), ("burst", 5 * HOUR_US, 30)]
        df = spark.createDataFrame(rows, "event_type string, bucket_us long, n long")
        out = {r["event_type"]: r for r in
               ts.burstiness(df, HOUR_US, ["event_type"]).collect()}
        assert out["reg"]["fano"] == 0.0
        assert out["reg"]["n_buckets"] == 6
        # burst spans 6 buckets (4 filled zeros), mean 10, var high
        assert out["burst"]["n_buckets"] == 6
        assert out["burst"]["total"] == 60
        assert out["burst"]["fano"] > 10

    def test_single_bucket_null(self, spark):
        df = spark.createDataFrame([("x", 0, 3)],
                                   "event_type string, bucket_us long, n long")
        [r] = ts.burstiness(df, HOUR_US, ["event_type"]).collect()
        assert r["fano"] is None
