package graft

import org.apache.spark.sql.functions._

import graft.ops.Core

class CoreSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("u1", 1L, "a"), ("u1", 3L, "b"), ("u1", 2L, "c"),
    ("u2", 7L, "d")
  ).toDF("user", "seq", "payload")

  test("dedupLatest keeps exactly the max-order row per key") {
    val got = Core.dedupLatest(df, Seq("user"), Seq(col("seq")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map("u1" -> "b", "u2" -> "d"))
  }

  test("topKPerGroup k=2 ascending with deterministic ties") {
    val got = Core.topKPerGroup(df, Seq("user"), Seq(col("seq").asc), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("u1", 1L), ("u1", 2L), ("u2", 7L)))
  }

  test("upsert: latest-wins merge of updates into target") {
    val target = Seq(("USA", 1L, 1350.0), ("JPN", 1L, 9.2)).toDF("cc", "ver", "rate")
    val updates = Seq(("USA", 2L, 1380.5), ("DEU", 1L, 1500.0)).toDF("cc", "ver", "rate")
    val got = Core.upsert(target, updates, Seq("cc"), Seq(col("ver")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("USA" -> 1380.5, "JPN" -> 9.2, "DEU" -> 1500.0))
  }

  test("asOfJoin attaches most recent right row per key, null when none") {
    val orders = Seq(
      ("u1", 10L, "o1"), ("u1", 25L, "o2"), ("u1", 5L, "o0"),
      ("u2", 50L, "o3")
    ).toDF("user", "t", "order_id")
    val rates = Seq(
      ("u1", 8L, 1.1), ("u1", 20L, 2.2), ("u1", 30L, 3.3),
      ("u3", 1L, 9.9)
    ).toDF("user", "t", "rate")
    val got = Core.asOfJoin(orders, rates, Seq("user"), "t", "t", Seq("rate"))
      .collect().map(r => r.getAs[String]("order_id") ->
        Option(r.getAs[Any]("asof_rate"))).toMap
    assert(got("o0").isEmpty)          // no rate at or before t=5
    assert(got("o1").contains(1.1))    // t=8 is latest <= 10
    assert(got("o2").contains(2.2))    // t=20 latest <= 25 (not 30)
    assert(got("o3").isEmpty)          // u2 has no rates at all
  }

  test("asOfJoin tie at equal order matches the right row") {
    val l = Seq(("k", 10L, "x")).toDF("k", "t", "id")
    val r = Seq(("k", 10L, 7.0)).toDF("k", "t", "v")
    val got = Core.asOfJoin(l, r, Seq("k"), "t", "t", Seq("v")).head()
    assert(got.getAs[Double]("asof_v") == 7.0)
  }

  test("snapshotDiff emits exactly insert/delete/update; unchanged and null-payload rows handled") {
    val vOld = Seq(
      (1L, Some("a"), 10.0),  // unchanged -> no row
      (2L, Some("b"), 20.0),  // updated payload
      (3L, Some("c"), 30.0),  // deleted
      (5L, None, 50.0)        // null payload, unchanged -> no row
    ).toDF("k", "p", "x")
    val vNew = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("B"), 20.0),
      (4L, Some("d"), 40.0),  // inserted
      (5L, None, 50.0)
    ).toDF("k", "p", "x")
    val got = Core.snapshotDiff(vOld, vNew, Seq("k"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(3), Option(r.getString(1)))).toMap
    assert(got == Map(
      2L -> ("update", Some("B")),
      3L -> ("delete", None),       // deletes carry null new-side values
      4L -> ("insert", Some("d"))), got.toString)
    // null-to-value flips ARE updates (null-safe compare, not null-eats)
    val flips = Core.snapshotDiff(
      Seq((1L, Option.empty[String])).toDF("k", "p"),
      Seq((1L, Some("now"))).toDF("k", "p"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(flips.toSeq == Seq((1L, "now", "update")))
  }

  test("scd2 history: every row shape, one open row per surviving key") {
    val vOld = Seq(
      (1L, 10.0),  // unchanged -> one open 1995 row
      (2L, 20.0),  // updated   -> closed 1995 + open 1996
      (3L, 30.0)   // deleted   -> closed 1995, no successor
    ).toDF("k", "x")
    val vNew = Seq(
      (1L, 10.0),
      (2L, 25.0),
      (4L, 40.0)   // inserted  -> open 1996
    ).toDF("k", "x")
    val got = Core.scd2(vOld, vNew, Seq("k"), Seq("x"), "1995", "1996")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), Option(r.getString(3))))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (1L, 10.0, "1995", None),           // unchanged: still-open original
      (2L, 20.0, "1995", Some("1996")),   // closed with successor
      (2L, 25.0, "1996", None),           // the successor
      (3L, 30.0, "1995", Some("1996")),   // closed, no successor
      (4L, 40.0, "1996", None)), got.toString)
    // invariant: every key present in the NEW snapshot has EXACTLY one
    // open row; keys only in the old snapshot have none
    val openByKey = got.filter(_._4.isEmpty).groupBy(_._1).view.mapValues(_.length).toMap
    assert(openByKey == Map(1L -> 1, 2L -> 1, 4L -> 1))
  }

  test("scd2 rejects inputs that collide with its output labels") {
    // a snapshot already carrying valid_from/valid_to would silently
    // produce duplicate output column names — fail fast instead, the
    // same discipline as the __o/__n prefix check
    val clash = Seq((1L, 10.0, "1990")).toDF("k", "x", "valid_from")
    val clean = Seq((1L, 10.0)).toDF("k", "x")
    val e = intercept[IllegalArgumentException] {
      Core.scd2(clash, clean, Seq("k"), Seq("x"), "1995", "1996")
    }
    assert(e.getMessage.contains("valid_from"))
    intercept[IllegalArgumentException] {
      Core.scd2(clean, clash.withColumnRenamed("valid_from", "valid_to"),
        Seq("k"), Seq("x"), "1995", "1996")
    }
    ()
  }

  test("scd2 intervals partition time: exactly one version covers each valid instant") {
    // the invariant q181's point-in-time lookup relies on: for any key
    // alive at version v, exactly ONE history row has
    // valid_from <= v < valid_to (null = open)
    val vOld = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "x")
    val vNew = Seq((1L, 10.0), (2L, 25.0), (4L, 40.0)).toDF("k", "x")
    val hist = Core.scd2(vOld, vNew, Seq("k"), Seq("x"), "1995", "1996")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), Option(r.getString(3))))
    def covering(key: Long, at: String) = hist.count { case (k, from, to) =>
      k == key && from <= at && to.forall(at < _)
    }
    // alive at 1995: keys 1,2,3 (the old snapshot)
    for (k <- Seq(1L, 2L, 3L)) assert(covering(k, "1995") == 1, s"key $k at 1995")
    // alive at 1996: keys 1,2,4 (the new snapshot); 3 must have NO cover
    for (k <- Seq(1L, 2L, 4L)) assert(covering(k, "1996") == 1, s"key $k at 1996")
    assert(covering(3L, "1996") == 0, "deleted key must not cover 1996")
    // key 4 did not exist at 1995
    assert(covering(4L, "1995") == 0, "inserted key must not cover 1995")
  }

  test("unionAll is name-based, column order free") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")
    val got = Core.unionAll(Seq(a, b)).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "x"), (2, "y")))
  }

  test("unionEvolve pads missing columns with null in both directions") {
    val epoch1 = Seq((1, 10.0)).toDF("id", "price")                 // original schema
    val epoch2 = Seq((2, 20.0, "O")).toDF("id", "price", "status")  // column added
    val epoch3 = Seq((3, "F")).toDF("id", "status")                 // column dropped
    val got = Core.unionEvolve(Seq(epoch1, epoch2, epoch3))
    assert(got.columns.toSet == Set("id", "price", "status"))
    val rows = got.orderBy("id").collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(r.fieldIndex("price"))) None else Some(r.getDouble(r.fieldIndex("price"))),
        Option(r.getAs[String]("status"))))
    assert(rows.toSeq == Seq(
      (1, Some(10.0), None), (2, Some(20.0), Some("O")), (3, None, Some("F"))))
  }

  test("saltedJoin equals the plain join on a skewed fact, inner and left") {
    // 90% of fact rows share one hot key — the shape salting exists for
    val fact = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble)))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (0 until 5).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"attr$i") }
      .toDF("key", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "v", "attr").collect()
        .map(r => (r.getString(0), r.getDouble(1), Option(r.getString(2)))).sorted.toSeq
    val plainInner = canon(fact.join(dim, Seq("key")))
    val saltedInner = canon(Core.saltedJoin(fact, dim, Seq("key"), salt = 8))
    assert(saltedInner == plainInner)
    // left join: unmatched fact keys (k5..k9) must survive with nulls
    val plainLeft = canon(fact.join(dim, Seq("key"), "left"))
    val saltedLeft = canon(Core.saltedJoin(fact, dim, Seq("key"), salt = 8, "left"))
    assert(saltedLeft == plainLeft)
    assert(plainLeft.size == 1000 && plainInner.size < 1000)
    // dim-preserving types would duplicate unmatched dim rows salt times
    intercept[IllegalArgumentException] {
      Core.saltedJoin(fact, dim, Seq("key"), salt = 8, "right")
    }
  }

  test("rangeJoin equals the naive inequality join on deterministic pseudo-random data") {
    // deterministic LCG (no Math.random in specs keeps reruns stable)
    var seed = 0x5DEECE66DL
    def next(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) % n).toInt }
    val points = (1 to 500).map(i => (i.toLong, next(1000).toLong - 200L)).toDF("fact_id", "p")
    val ivs = (1 to 60).map { i =>
      val s = next(1000).toLong - 250L
      (i.toLong, s, s + next(90).toLong) // widths 0..89, some empty
    }.toDF("iv_id", "s", "e")
    val naive = points.join(ivs, col("p") >= col("s") && col("p") < col("e"))
      .select("fact_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (w <- Seq(7L, 30L, 128L)) {
      val got = Core.rangeJoin(points, ivs, "p", "s", "e", bucketWidth = w)
        .select("fact_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == naive, s"bucketWidth=$w: ${got.size} vs ${naive.size} pairs")
    }
  }

  test("rangeJoin plans a hash equi-join, never BroadcastNestedLoopJoin") {
    val points = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("fact_id", "p")
    val ivs = Seq((1L, 5L, 40L), (2L, 30L, 31L)).toDF("iv_id", "s", "e")
    val joined = Core.rangeJoin(points, ivs, "p", "s", "e", bucketWidth = 10L)
    joined.collect() // materialize so AQE finalizes the physical plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin"), plan)
  }

  test("rangeJoin guards: runaway interval raises; shared names rejected") {
    val points = Seq((1L, 5L)).toDF("fact_id", "p")
    val wide = Seq((1L, 0L, 1000000L)).toDF("iv_id", "s", "e")
    val ex = intercept[Exception] {
      Core.rangeJoin(points, wide, "p", "s", "e", bucketWidth = 10L, maxBucketsPerInterval = 64L)
        .collect()
    }
    assert(msgs(ex).exists(_.contains("maxBucketsPerInterval")), msgs(ex).mkString("; "))
    intercept[IllegalArgumentException] {
      Core.rangeJoin(points, Seq((1L, 0L, 9L)).toDF("p", "s", "e"), "p", "s", "e", 10L)
    }
  }
}
