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

  test("unionAll is name-based, column order free") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")
    val got = Core.unionAll(Seq(a, b)).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "x"), (2, "y")))
  }
}
