package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SpaceSaving summary state: parallel arrays (item, est, err) plus the
  * summary `offset` — the largest estimate ever evicted, bounding the true
  * count of any item NOT in the summary. Overestimate invariant:
  * `est - err <= true <= est` for tracked items. */
final case class HHState(items: Array[String], ests: Array[Long],
    errs: Array[Long], offset: Long)

/** One reported heavy hitter. */
final case class HHItem(item: String, est: Long, err: Long)

/** Mergeable SpaceSaving (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams", 2005; merge rule after
  * Agarwal et al., "Mergeable summaries", 2012) as a typed Spark
  * [[Aggregator]] — the bounded-state approximate twin of an exact
  * groupBy-count top-k.
  *
  * Scale shape: the buffer is O(capacity) per GROUP regardless of stream
  * length or item cardinality, and reduce/merge run map-side (partial
  * aggregation) — the exact top-k's shuffle carries every distinct item
  * per group, this one carries `capacity` rows. Guarantees (public):
  * any item with true count > n/capacity is present in the summary, and
  * est − err ≤ true ≤ est for every reported item. */
final class SpaceSaving(capacity: Int)
    extends Aggregator[String, HHState, Array[HHItem]] with Serializable {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  def zero: HHState =
    HHState(Array.empty, Array.empty, Array.empty, 0L)

  def reduce(b: HHState, item: String): HHState = {
    // Aggregator buffers may be mutated in place — no per-row allocation
    // on the hot paths (linear probe is O(capacity); keep capacity small)
    val i = b.items.indexOf(item)
    if (i >= 0) {
      b.ests(i) += 1
      b
    } else if (b.items.length < capacity) {
      HHState(b.items :+ item, b.ests :+ (b.offset + 1), b.errs :+ b.offset,
        b.offset)
    } else {
      // evict the min-est entry; the newcomer inherits its estimate + 1
      // with err = that estimate (classic SpaceSaving replacement)
      var mi = 0
      var j = 1
      while (j < b.ests.length) { if (b.ests(j) < b.ests(mi)) mi = j; j += 1 }
      val victim = b.ests(mi)
      b.items(mi) = item; b.ests(mi) = victim + 1; b.errs(mi) = victim
      HHState(b.items, b.ests, b.errs, math.max(b.offset, victim))
    }
  }

  def merge(a: HHState, b: HHState): HHState = {
    if (a.items.isEmpty && b.offset == 0L) return b
    if (b.items.isEmpty && a.offset == 0L) return a
    // union: co-present sums est/err; one-sided adds the other summary's
    // offset (an absent item's true count there is <= that offset — the
    // overestimate invariant survives the merge)
    val bIdx = b.items.zipWithIndex.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val seenB = new Array[Boolean](b.items.length)
    var i = 0
    while (i < a.items.length) {
      bIdx.get(a.items(i)) match {
        case Some(j) =>
          seenB(j) = true
          out += ((a.items(i), a.ests(i) + b.ests(j), a.errs(i) + b.errs(j)))
        case None =>
          out += ((a.items(i), a.ests(i) + b.offset, a.errs(i) + b.offset))
      }
      i += 1
    }
    var j = 0
    while (j < b.items.length) {
      if (!seenB(j))
        out += ((b.items(j), b.ests(j) + a.offset, b.errs(j) + a.offset))
      j += 1
    }
    // prune to capacity keeping the largest estimates; anything evicted
    // raises the offset bound for items no longer tracked
    val sorted = out.sortBy { case (it, est, _) => (-est, it) }
    val kept = sorted.take(capacity)
    val evictedMax = if (sorted.length > capacity) sorted(capacity)._2 else 0L
    HHState(kept.map(_._1).toArray, kept.map(_._2).toArray,
      kept.map(_._3).toArray,
      math.max(math.max(a.offset + b.offset, evictedMax), 0L))
  }

  def finish(r: HHState): Array[HHItem] =
    r.items.indices
      .sortBy(i => (-r.ests(i), r.items(i)))
      .map(i => HHItem(r.items(i), r.ests(i), r.errs(i)))
      .toArray

  def bufferEncoder: Encoder[HHState] = Encoders.product[HHState]
  def outputEncoder: Encoder[Array[HHItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[HHItem]]()
}

object HeavyHitters {

  /** Top-k heavy hitters of `itemCol` per `bucketCol` group via SpaceSaving.
    * Emits one row per reported item: (bucket, item, est, err, rank), rank
    * by (est desc, item) — deterministic at any parallelism for the
    * exact regime (capacity > group cardinality ⇒ est exact, err 0). */
  def perBucket(
      events: DataFrame,
      bucketCol: org.apache.spark.sql.Column,
      itemCol: org.apache.spark.sql.Column,
      capacity: Int,
      k: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new SpaceSaving(capacity).toColumn
    events.select(bucketCol.cast("string").as("bucket"),
        itemCol.cast("string").as("item"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("hh"))
      .toDF("bucket", "hh")
      .select(col("bucket"), posexplode(col("hh")).as(Seq("pos", "h")))
      .filter(col("pos") < k)
      .select(col("bucket"), col("h.item").as("item"),
        col("h.est").as("est"), col("h.err").as("err"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
