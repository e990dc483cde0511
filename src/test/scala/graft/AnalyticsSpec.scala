package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** §2.C21–C24 as-of join, pivot, exact median, HLL sketch. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = AnalyticsQueries.defs(name)(spark, dir)

  test("snapshot_merge: class counts partition the merged snapshot") {
    val rows = q("snapshot_merge").select("op", "n", "checksum")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.keySet == Set("insert", "update", "keep"))
    assert(rows("update")._1 == 50 && rows("insert")._1 == 50)
    val nDocs = Tables(spark, dir, "documents").filter(col("doc_id") < 400).count()
    assert(rows("keep")._1 == nDocs - 50, "keeps = current minus updated")
    assert(rows.values.forall(_._2 > 0), "checksums must cover content")
  }

  test("events_impute_locf: filled value is the last non-null at-or-before each row") {
    val rows = q("events_impute_locf")
      .select("event_id", "user_id", "k", "k_filled")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.exists(_._3.isEmpty), "corpus must have gaps to impute")
    assert(rows.count(_._4.isDefined) > rows.count(_._3.isDefined),
      "imputation must fill some gaps")
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
        """CASE WHEN event_type = 'purchase'
          |     THEN CAST(get_json_object(props, '$.k') AS BIGINT) END AS k""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val byUser = ev.groupBy(_._1)
    val keyOf = ev.map(e => e._2 -> ((e._3, e._2))).toMap
    rows.take(300).foreach { case (eid, uid, _, filled) =>
      val key = keyOf(eid)
      val expected = byUser(uid)
        .filter(e => e._3 < key._1 || (e._3 == key._1 && e._2 <= key._2))
        .sortBy(e => (e._3, e._2)).reverse.collectFirst { case (_, _, _, Some(v)) => v }
      assert(filled == expected, s"LOCF mismatch for event $eid")
    }
  }

  test("events_anomaly_mad: medians are real medians, outliers bounded") {
    val rows = q("events_anomaly_mad")
      .select("event_type", "med_cents", "mad_cents", "n_outliers", "max_dev")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    val cents = Tables(spark, dir, "events")
      .selectExpr("event_type", "CAST(floor(value * 100) AS BIGINT) AS cents")
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (t, med, mad, outliers, maxDev) =>
      val vs = cents(t).map(_._2)
      // the lower median splits the group: ≥ half at-or-below, ≥ half at-or-above
      assert(vs.count(_ <= med) * 2 >= vs.length)
      assert(vs.count(_ >= med) * 2 >= vs.length)
      // MAD covers at least half the deviations, so outliers < half the group
      assert(outliers * 2 < vs.length)
      assert(mad >= 0 && maxDev >= mad)
      assert(outliers == vs.count(v => math.abs(v - med) > 3 * mad))
    }
  }

  test("events_trailing_window: frame counts match a direct per-row recount") {
    val rows = q("events_trailing_window")
      .select("event_id", "user_id", "n_hour", "cents_hour")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
        "CAST(floor(value * 100) AS BIGINT) AS cents")
      .as[(Long, Long, Long, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val usOf = ev.map(e => e._2 -> e._3).toMap
    rows.take(200).foreach { case (eid, uid, n, cents) =>
      val t = usOf(eid)
      val inFrame = byUser(uid).filter(e => e._3 >= t - 3600000000L && e._3 <= t)
      assert(n == inFrame.length, s"count mismatch for event $eid")
      assert(cents == inFrame.map(_._4).sum, s"sum mismatch for event $eid")
    }
  }

  test("events_gap_fill: per-user series is contiguous and preserves event totals") {
    val rows = q("events_gap_fill")
      .select("user_id", "d", "n").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.head + days.length - 1 == days.last, "days must be contiguous")
      assert(days.distinct.length == days.length, "no duplicate days")
      assert(rs.filter(_._3 > 0).nonEmpty, "endpoints are active days")
    }
    val total = rows.map(_._3).sum
    assert(total == Tables(spark, dir, "events").count(), "zero-fill must not lose events")
  }

  test("salted_join matches the direct join aggregate") {
    val direct = Tables(spark, dir, "events")
      .selectExpr("event_type", "CAST(floor(value * 100) AS BIGINT) AS cents")
      .withColumn("w", expr(
        """CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 5
          |WHEN 'signup' THEN 3 ELSE 4 END""".stripMargin))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(expr("w * cents")).as("weighted_cents"))
      .as[(String, Long, Long)].collect().toSet
    val salted = q("salted_join").as[(String, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("events_interval_join: overlapping windows cover at least their core hour") {
    val rows = q("events_interval_join")
      .select("window_min", "n_events", "n_users").as[(Long, Long, Long)].collect()
    assert(rows.length == 3)
    val hourly = Tables(spark, dir, "events")
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 60000000").as("h"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    rows.foreach { case (h, n, users) =>
      assert(n >= hourly(h), "the widened window is a superset of its hour")
      assert(users >= 1 && users <= n)
    }
  }

  test("events_unpivot equals the direct long-form counts") {
    val unpivoted = q("events_unpivot").as[(Long, String, Long)].collect().toSet
    val direct = Tables(spark, dir, "events").groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n")).as[(Long, String, Long)].collect().toSet
    assert(unpivoted == direct)
  }

  test("events_asof: every matched purchase precedes (or ties) its click") {
    val ev = Tables(spark, dir, "events")
    val pTs = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val rows = q("events_asof").collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(2)).foreach { r =>
      assert(pTs.contains(r.getLong(2)), "prev_purchase must be a purchase event")
      assert(r.getLong(3) >= 0, "gap must be non-negative (purchase not after click)")
    }
  }

  test("events_asof picks the LATEST prior purchase, not just any") {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clickUs = ev.filter(col("event_type") === "click")
      .selectExpr("event_id", "unix_micros(ts) AS us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = q("events_asof").collect().filter(r => !r.isNullAt(2))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cid, uid, pid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cUs = clickUs(cid)
      val pUs = purchases.collectFirst { case (_, t, id) if id == pid => t }.get
      val between = purchases.filter { case (u, t, _) => u == uid && t <= cUs && t > pUs }
      assert(between.isEmpty, s"purchase between prev ($pUs) and click ($cUs) for user $uid")
      assert(r.getLong(3) == cUs - pUs, "gap_us must equal the micros delta")
    }
  }

  test("events_pivot counts reconcile with raw group counts") {
    val ev = Tables(spark, dir, "events")
    val total = ev.count()
    val p = q("events_pivot").collect()
    val pivotTotal = p.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(pivotTotal == total, s"pivot cells must partition all events: $pivotTotal vs $total")
  }

  test("median_exact returns one row per priority at the lower-median position") {
    val rows = q("median_exact").collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
  }

  test("approx_distinct_hll estimates within 15% of exact once in-regime") {
    // raw-estimator regime starts at n >= 2.5m = 640 distincts per group:
    // sf0.001 (~200/group) sits below it, so accuracy is asserted at sf0.01
    // (~2000/group); at sf0.001 we only require a positive estimate.
    q("approx_distinct_hll").collect().foreach(r => assert(r.getLong(1) > 0))
    AnalyticsQueries.defs("approx_distinct_hll")(spark, "/root/testdata/sf0.01")
      .collect().foreach { r =>
        val (est, exact) = (r.getLong(1), r.getLong(2))
        assert(math.abs(est - exact).toDouble / exact < 0.15,
          s"${r.getString(0)}: est $est vs exact $exact")
      }
  }

  test("hll_rollup_merge: merged sketches equal direct coarse sketches") {
    import graft.operators.Hll
    val rows = q("hll_rollup_merge")
      .as[(String, String, String, Long, Long)].collect().toSeq
    val byLvl = rows.groupBy(_._1)
    assert(byLvl.keySet == Set("source_lang", "source", "all"))
    assert(byLvl("all").size == 1)

    // THE mergeability claim: the entry's source-level estimates (derived
    // by max-merging the fine (source, lang) sketch rows) must equal the
    // estimates of sketches built DIRECTLY at source granularity from the
    // corpus — register-wise max is the union sketch, so the two paths
    // are bit-identical, not merely close.
    val d = Tables(spark, dir, "documents")
    val direct = Hll.estimate(
        Hll.sketchAgg(Hll.bucketRho(d, "concat('hrm', text)", Seq("source")),
          Seq("source")), Seq("source"))
      .select("source", "est").as[(String, Long)].collect().toMap
    val merged = byLvl("source").map(r => r._2 -> r._4).toMap
    assert(merged == direct)
    val directAll = Hll.estimate(
        Hll.sketchAgg(Hll.bucketRho(d, "concat('hrm', text)", Seq.empty),
          Seq.empty), Seq.empty)
      .select("est").as[Long].head()
    assert(byLvl("all").head._4 == directAll)

    // est-vs-exact sanity at the global level (n=500 >= in-regime-ish for
    // p=8; observed ~5%): generous 20% bound to stay noise-proof
    val (gEst, gExact) = (byLvl("all").head._4, byLvl("all").head._5)
    assert(math.abs(gEst - gExact).toDouble / gExact < 0.20,
      s"global est $gEst vs exact $gExact")
    // exact counts are consistent across levels (distinct is subadditive:
    // the global distinct count never exceeds the per-source sum)
    assert(gExact <= byLvl("source").map(_._5).sum)
  }

  test("salted_agg equals the direct unsalted aggregate") {
    val direct = Tables(spark, dir, "events")
      .groupBy(col("event_type").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = q("salted_agg")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("approx_quantile_hist brackets the exact median within one bin width") {
    val exact = q("median_exact").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cents = Tables(spark, dir, "orders")
      .selectExpr("CAST(floor(o_totalprice * 100) AS BIGINT) AS c")
      .agg(min("c"), max("c")).collect().head
    val binWidth = (cents.getLong(1) - cents.getLong(0) + 1) / 256 + 1
    val est = q("approx_quantile_hist").collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (pri, p50, p90, p99) = (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99, s"$pri quantiles not monotone")
      assert(math.abs(p50 - exact(pri)) <= binWidth,
        s"$pri: histogram p50 $p50 vs exact median ${exact(pri)} (bin width $binWidth)")
    }
  }

  test("events_retention: day-0 cohort rows partition all users exactly once") {
    val rows = q("events_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(0L, 1L, 3L, 7L).contains(r._2)))
    // offset-0 count per cohort == users whose FIRST day is that cohort day;
    // summed over cohorts that's every user exactly once
    val day0 = rows.filter(_._2 == 0L).map(_._3).sum
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(day0 == users, s"day-0 rows cover $day0 of $users users")
    // retention never exceeds the cohort's size
    val size = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (c0, _, n) => assert(n <= size(c0)) }
  }

  test("events_ohlc bars match a brute-force first/last/min/max per (type, hour)") {
    val bars = q("events_ohlc").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(bars.nonEmpty)
    val raw = Tables(spark, dir, "events").filter(col("value").isNotNull)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h",
        "CAST(floor(value * 100) AS BIGINT) AS cents", "unix_micros(ts) AS us", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = raw.groupBy(r => (r._1, r._2)).map { case (k, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._5)).map(_._3)
      k -> ((ordered.head, ordered.max, ordered.min, ordered.last,
        ordered.length.toLong, ordered.sum))
    }
    assert(bars == expected)
  }

  test("events_transitions: pair counts match brute force and probabilities floor-normalize") {
    val got = q("events_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.toSeq.sortBy(r => (r._3, r._4)).map(_._2)
      seq.zip(seq.tail)
    }.toSeq
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got.view.mapValues(_._1).toMap == counts)
    val rowTotals = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    got.foreach { case ((p, n2), (n, pScaled)) =>
      assert(pScaled == n * 10000L / rowTotals(p), s"($p,$n2) p_scaled mismatch")
    }
  }

  test("events_funnel stages shrink monotonically and start with the view users") {
    val rows = q("events_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array("1_view", "2_click", "3_purchase")))
    val ns = rows.map(_._2)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel not monotone: ${ns.toSeq}")
    val viewUsers = Tables(spark, dir, "events")
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(ns(0) == viewUsers)
  }

  test("C64/C65 KMV: exact below K, estimator within 1/sqrt(K) error band above") {
    // sf0.001: 15 users/type < K=64 → the exact branch, est == n_exact
    q("kmv_distinct_est").collect().foreach { r =>
      assert(r.getLong(1) < 64, "expected the sub-K branch at sf0.001")
      assert(r.getLong(3) == r.getLong(4), s"${r.getString(0)}: sub-K est must be exact")
    }
    // sf0.01: 150 users/type > K → the order-statistics estimator; KMV
    // standard error is 1/√(K−2) ≈ 12.7%, assert within 4σ
    AnalyticsQueries.defs("kmv_distinct_est")(spark, "/root/testdata/sf0.01")
      .collect().foreach { r =>
        assert(r.getLong(1) == 64)
        val est = r.getLong(3).toDouble; val ex = r.getLong(4).toDouble
        assert(math.abs(est - ex) / ex < 0.51, s"${r.getString(0)}: est $est vs exact $ex")
      }
    // audience Jaccard: all 10 type pairs present; estimate within an
    // additive 4σ band of the exact ppm value
    val j = AnalyticsQueries.defs("kmv_jaccard_est")(spark, "/root/testdata/sf0.01").collect()
    assert(j.length == 10)
    j.foreach { r =>
      assert(math.abs(r.getLong(4) - r.getLong(5)) <= 510000,
        s"${r.getString(0)}-${r.getString(1)}: est ${r.getLong(4)} vs exact ${r.getLong(5)}")
    }
  }

  test("C65 pair fan-out guard refuses over-cap sketch dimensions (cap-with-triage)") {
    // cap+1 groups → the D² pair expansion must REFUSE, naming the cap
    val over = (0 to AnalyticsQueries.KmvPairDimCap)
      .map(i => (s"t$i", Seq(i.toLong), 1L)).toDF("event_type", "hs", "n_sk")
    val e = intercept[IllegalArgumentException] {
      AnalyticsQueries.kmvPairwiseJaccard(over).collect()
    }
    assert(e.getMessage.contains("KmvPairDimCap"),
      s"guard message must name the cap knob: ${e.getMessage}")
    // an in-cap frame passes and produces the full D·(D−1)/2 pair set
    val ok = (0 until 4).map(i => (s"t$i", Seq(i.toLong), 1L))
      .toDF("event_type", "hs", "n_sk")
    assert(AnalyticsQueries.kmvPairwiseJaccard(ok).count() === 6L)
  }

  test("est-only production variants equal the audited entries minus the audit columns") {
    // C69b/C67b (r10 verdict "what's wrong" #2): auditExact = false must
    // change WHAT RIDES ALONG, never a single estimated value — the
    // 100 TB path serves the same sketch numbers without the corpus-sized
    // exact distinct sides
    val rollupAudited = q("hll_rollup_merge")
      .select("lvl", "source", "lang", "est")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val rollupEst = q("hll_rollup_est")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rollupEst == rollupAudited)
    assert(q("hll_rollup_est").columns.toSeq == Seq("lvl", "source", "lang", "est"))

    val profAudited = q("profile_columns")
      .select("col", "n", "n_null", "est", "vmin", "vmax")
      .collect().map(_.toSeq).toSet
    val profEst = q("profile_columns_est")
      .select("col", "n", "n_null", "est", "vmin", "vmax")
      .collect().map(_.toSeq).toSet
    assert(profEst == profAudited)
    assert(!q("profile_columns_est").columns.contains("n_distinct"))
  }

  test("profile_columns: counts and extrema match a direct recount; KMV in-regime") {
    val rows = SparkEntry.queries("profile_columns")(spark, dir)
      .as[(String, Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    val direct = Tables(spark, dir, "orders")
      .selectExpr("CAST(o_custkey AS STRING) AS v").as[String].collect()
    val (_, n, nNull, nd, est, vmin, vmax) = rows("o_custkey")
    assert(n == direct.length && nNull == direct.count(_ == null))
    val dv = direct.filter(_ != null).distinct
    assert(nd == dv.length && vmin == dv.min && vmax == dv.max)
    // KMV standard error ≈ 1/√64 = 12.5%; 4σ bound = regeneration-proof
    assert(math.abs(est - nd) <= math.max(4, nd / 2),
      s"o_custkey est $est vs exact $nd out of regime")
    // small-cardinality columns short-circuit to exact (n_sk < K)
    assert(rows("o_orderstatus")._5 == rows("o_orderstatus")._4)
  }

  test("key_skew_profile matches a driver-side recount of the key histogram") {
    val Array((nKeys, nRows, maxN, p50, p90, p99, top10)) =
      SparkEntry.queries("key_skew_profile")(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val counts = Tables(spark, dir, "events").groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val ns = counts.map(_._2).sorted
    assert(nKeys == ns.length && nRows == ns.sum && maxN == ns.last)
    def pq(q: Int): Long = {
      val target = (ns.length * q + 99) / 100
      ns(math.max(target.toInt - 1, 0))
    }
    assert((p50, p90, p99) == ((pq(50), pq(90), pq(99))))
    val s10 = counts.sortBy { case (id, n) => (-n, id) }.take(10).map(_._2).sum
    assert(top10 == s10 * 1000000L / nRows)
    assert(p50 <= p90 && p90 <= p99 && p99 <= maxN)
  }
}
