package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X2: ordered stateful fold — the GRU recurrence
  * `h_t = z*h + (1-z)*tanh(o_t)` folded over a time-ordered sequence
  * (weather4cast/rnn.py:26-30). An order-dependent NON-associative
  * fold, so it is not a window function: the two legitimate Spark
  * forms are
  *  1. typed `groupByKey(...).mapGroups` (sort each group, fold) —
  *     arbitrary Scala state, one shuffle on the key;
  *  2. `aggregate()` higher-order function over a
  *     `sort_array(collect_list(struct(...)))` — stays in Catalyst,
  *     SQL-oracle-expressible.
  * Both are provided; a ScalaTest asserts they agree.
  *
  * tanh is expanded as `(exp(2x)-1)/(exp(2x)+1)` so an external SQL
  * engine without a tanh builtin evaluates the identical expression.
  */
object Fold {

  val Z = 0.6       // update-gate weight
  val InScale = 100.0
  val HWeight = 0.5

  /** One GRU step on plain doubles (the mapGroups path). */
  def step(h: Double, x: Double): Double = {
    val o = x / InScale + HWeight * h
    val t = (math.exp(2 * o) - 1) / (math.exp(2 * o) + 1)
    Z * h + (1 - Z) * t
  }

  /** Column-expression GRU step (the aggregate() HOF path) — the same
    * arithmetic shape as [[step]]. */
  def stepCol(h: Column, x: Column): Column = {
    val o = x / lit(InScale) + lit(HWeight) * h
    val e = exp(lit(2.0) * o)
    lit(Z) * h + lit(1 - Z) * ((e - lit(1.0)) / (e + lit(1.0)))
  }

  /** Vector-state GRU step: the hidden state is an `array<double>`
    * and the step applies elementwise with a per-component bias (the
    * shape of the reference's ConvGRU, whose state is a full frame —
    * weather4cast/rnn.py:37-72; here H components instead of H×W
    * pixels, same recurrence). `zip_with` pairs each h_k with its
    * bias; the input x is shared across components. */
  def stepColVec(h: Column, x: Column, biases: Seq[Double]): Column =
    zip_with(h, array(biases.map(lit): _*), (hk, bk) => {
      val o = x / lit(InScale) + lit(HWeight) * hk + bk
      val e = exp(lit(2.0) * o)
      lit(Z) * hk + lit(1 - Z) * ((e - lit(1.0)) / (e + lit(1.0)))
    })

  /** Vector-state form of [[foldAgg]]: per-key ordered fold of an
    * `array<double>` hidden state via aggregate() over the sorted
    * value list. One shuffle on the key, state bounded by H. */
  def foldAggVec(events: DataFrame, key: String, ts: String, ord2: String, v: String,
                 biases: Seq[Double]): DataFrame = {
    val seq = sort_array(collect_list(struct(col(ts), col(ord2), col(v).as("v"))))
    val init = array(biases.map(_ => lit(0.0)): _*)
    events.groupBy(col(key)).agg(
      aggregate(transform(seq, x => x.getField("v")), init,
        (h, x) => stepColVec(h, x, biases)).as("h_vec"),
      count(lit(1)).as("n_steps"))
  }

  /** Form 2: per-key final state via collect_list + aggregate() HOF.
    * One shuffle on the key; per-group state bounded by sequence
    * length (67 events/user here; frame sequences are 36 long). */
  def foldAgg(events: DataFrame, key: String, ts: String, ord2: String, v: String): DataFrame = {
    val seq = sort_array(collect_list(struct(col(ts), col(ord2), col(v).as("v"))))
    events.groupBy(col(key)).agg(
      aggregate(transform(seq, x => x.getField("v")), lit(0.0), stepCol).as("h_final"),
      count(lit(1)).as("n_steps"))
  }

  /** Form 3 (streaming): incremental GRU state via
    * `mapGroupsWithState` — each micro-batch folds its new events into
    * the per-key hidden state, the streaming analog of form 1. Events
    * must arrive in order per key within the stream (or be
    * pre-sorted per batch, which this does). */
  def foldStreaming(events: org.apache.spark.sql.Dataset[(Long, Long, Double)])
  : org.apache.spark.sql.Dataset[(Long, Double, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_._1)
      .mapGroupsWithState[(Double, Long), (Long, Double, Long)](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val (h0, n0) = state.getOption.getOrElse((0.0, 0L))
          val sorted = rows.toArray.sortBy(_._2)
          val h = sorted.foldLeft(h0)((acc, r) => step(acc, r._3))
          val n = n0 + sorted.length
          state.update((h, n))
          (key, h, n)
      }
  }

  /** Form 1: typed mapGroups fold (sort in memory per group). */
  def foldTyped(spark: SparkSession, events: DataFrame, key: String, ts: String,
                ord2: String, v: String): DataFrame = {
    import spark.implicits._
    // micros-since-epoch as long: seconds-as-double * 1e6 stays within
    // double's exact-integer range (~1.7e15 < 2^53)
    val ds: Dataset[(Long, Long, Long, Double)] = events
      .select(col(key).cast("long"),
        (col(ts).cast("double") * 1e6).cast("long"),
        col(ord2).cast("long"), col(v).cast("double"))
      .as[(Long, Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val sorted = rows.toArray.sortBy(r => (r._2, r._3, r._4))
        val h = sorted.foldLeft(0.0)((acc, r) => step(acc, r._4))
        (k, h, sorted.length.toLong)
      }
      .toDF(key, "h_final", "n_steps")
  }
}
