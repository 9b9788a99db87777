package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read position deletes (q187): the tombstone sidecar stores
  * pure (file, row_index) coordinates, so these tests pin that the
  * coordinates map back to exactly the logically-deleted rows — the
  * property the oracle hash also enforces, isolated here with the
  * arithmetic visible.
  */
class DeletionVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("anti-join drops exactly the tombstoned rows") {
    // run the query once so the fixture exists
    DeletionVectors.q187MergeOnRead(spark, dir).collect()
    val (baseRoot, delRoot) = DeletionVectors.roots(dir)
    val base = spark.read.parquet(baseRoot)
    val dels = spark.read.parquet(delRoot)
    val live = base
      .select($"_metadata.file_path".as("fp"), $"_metadata.row_index".as("ri"),
        $"event_id")
      .join(dels, Seq("fp", "ri"), "left_anti")
    assert(live.count() == base.count() - dels.count(),
      "anti-join count does not equal base minus tombstones")
    // the positions must map back to the rows the predicate selected
    val survivorsMatchingPredicate = live
      .filter($"event_id" % DeletionVectors.DeleteMod ===
        DeletionVectors.DeleteRem).count()
    assert(survivorsMatchingPredicate == 0,
      "a logically-deleted row survived the position anti-join")
    assert(dels.count() > 0, "fixture produced no tombstones — dead test")
  }
}
