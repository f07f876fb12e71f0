package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache-ownership lifecycle (round-15 review item: eight graded
  * queries persisted reused subplans with no owner ever unpersisting
  * them — harmless at sf0.1 under LRU eviction, real memory pressure
  * at corpus scale). The fix: creators register persists with
  * [[graft.Caches]] (directly, or via the CachedFrame constructor
  * backstop) and the harness releases after each query's action.
  * This spec asserts the contract end to end: after running each
  * formerly-leaking query and releasing, ZERO persistent RDD blocks
  * remain — no reliance on `clearCache`. */
class OwnershipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** The queries whose persists the round-15 review flagged as
    * leaked (seven queries, eight persist sites) plus one
    * CachedFrame-heavy control from each training family. */
  private val flagged = Seq(
    "pipe_tokenize_e2e", "pipe_ids_e2e", "t_pack_ids_bfd",
    "t_quality_classifier", "t_quality_filter", "t_quality_filter_indexed",
    "e_opq_recall_planted",
    // controls: CachedFrame chains (constructor-registered caches)
    "t_bpe_encode_ids", "t_unigram_decode")

  test("no leaked RDD blocks after each query's handle release") {
    // start from a clean slate: other suites share the session and
    // may have left registered-or-not persists behind
    Caches.releaseAll(blocking = true)
    spark.catalog.clearCache()
    val reg = SparkEntry.queries
    for (name <- flagged) {
      val fn = reg(name)
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      Caches.releaseAll(blocking = true)
      val left = spark.sparkContext.getPersistentRDDs
      assert(left.isEmpty,
        s"$name leaked ${left.size} persisted RDD(s) past Caches.releaseAll: " +
          left.values.map(_.name).mkString(", "))
    }
  }

  test("releaseAll is idempotent and unpersist-after-owner-release is a no-op") {
    import spark.implicits._
    val df = Caches.owned(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    df.unpersist(true) // owner released early
    Caches.releaseAll() // backstop release must not throw
    Caches.releaseAll() // and is idempotent
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
