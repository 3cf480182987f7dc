package graft

import org.apache.spark.sql.functions._
import graft.text.Shards

/** Token-budgeted shard packing (two-level distributed prefix sum) and
  * the deterministic seeded shuffle. */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("packShards: documents never split; boundary doc takes its " +
      "first token's shard") {
    val df = Seq((1L, 7L), (2L, 6L), (3L, 4L), (4L, 10L))
      .toDF("doc_id", "n_tokens")
    // exclusive prefixes 0, 7, 13, 17 over budget 10 → shards 0,0,1,1
    val r = Shards.packShards(df, "doc_id", "n_tokens", 10L,
        floor(col("doc_id") / 2))
      .select("doc_id", "shard")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("packShards: shard ids are invariant to the bucket granularity") {
    val df = spark.range(1, 200).select(col("id").as("doc_id"),
      (pmod(col("id") * 37, lit(23)) + 1).as("n_tokens"))
    def shards(bucket: org.apache.spark.sql.Column): Map[Long, Long] =
      Shards.packShards(df, "doc_id", "n_tokens", 100L, bucket)
        .select("doc_id", "shard")
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val oneBucket = shards(lit(0))            // degenerate: global window
    assert(shards(floor(col("doc_id") / 3)) == oneBucket)
    assert(shards(floor(col("doc_id") / 7)) == oneBucket)
    assert(shards(col("doc_id")) == oneBucket) // one bucket per row
    // sanity: multiple shards actually produced and sizes ≈ budget
    val counts = oneBucket.groupBy(_._2).view
      .mapValues(_.size).toMap
    assert(counts.size > 5)
  }

  test("packShards: a NULL bucket key fails loudly instead of dropping rows") {
    // the offsets equi-join never matches null == null, so without the
    // assert a null-bucketed document would silently vanish
    val df = Seq((1L, Some(10L)), (2L, Option.empty[Long]))
      .toDF("doc_id", "bk")
      .withColumn("n_tokens", lit(5L))
    val ex = intercept[Exception] {
      Shards.packShards(df, "doc_id", "n_tokens", 10L, col("bk")).collect()
    }
    assert(ex.toString.toLowerCase.contains("null"))
  }

  test("intervalJoin: banded equi-join matches the naive non-equi join, " +
      "boundaries inclusive, pairs unique") {
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // exactly a start
      (2L, ts("2024-01-01 01:30:00")), // exactly an end
      (3L, ts("2024-01-01 02:00:00")), // in no interval
      (4L, ts("2024-01-01 05:00:00"))  // inside a 3-band-long interval
    ).toDF("pid", "ts")
    val ivals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:30:00")),
      (11L, ts("2024-01-01 04:00:00"), ts("2024-01-01 07:00:00")),
      (12L, ts("2024-01-01 04:30:00"), ts("2024-01-01 05:00:00"))
    ).toDF("iid", "start", "end")
    val banded = graft.rel.Joins.intervalJoin(points, "ts", ivals,
        "start", "end", bandSeconds = 3600L)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = points.join(ivals,
        col("ts") >= col("start") && col("ts") <= col("end"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(banded == naive)
    assert(banded == Seq((1L, 10L), (2L, 10L), (4L, 11L), (4L, 12L)))
    assert(banded.distinct == banded, "each qualifying pair meets once")
  }

  test("intervalJoin plan: equi-join on the band, no nested loop") {
    val w = spark.range(0, 20).select(col("id").as("window_id"),
        expr("timestampadd(HOUR, CAST(id * 6 AS INT), " +
          "TIMESTAMP'2024-01-01 00:00:00')").as("w_start"))
      .withColumn("w_end", expr("timestampadd(MINUTE, 90, w_start)"))
    val plan = graft.rel.Joins.intervalJoin(
        graft.core.Tables.events(spark, sf), "ts", w,
        "w_start", "w_end", 5400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must stay a banded equi-join:\n$plan")
  }

  test("shuffleOrder: deterministic, repartition-stable, seed-sensitive") {
    val df = spark.range(0, 50).select(col("id").as("doc_id"))
    val a = Shards.shuffleOrder(df, "doc_id", 42L)
      .orderBy("shuffle_key").select("doc_id").as[Long].collect().toSeq
    val b = Shards.shuffleOrder(df.repartition(7), "doc_id", 42L)
      .orderBy("shuffle_key").select("doc_id").as[Long].collect().toSeq
    val c = Shards.shuffleOrder(df, "doc_id", 43L)
      .orderBy("shuffle_key").select("doc_id").as[Long].collect().toSeq
    assert(a == b, "order must not depend on physical partitioning")
    assert(a != c, "a different seed must give a different order")
    assert(a.sorted == (0L until 50L), "a shuffle is a permutation")
  }
}
