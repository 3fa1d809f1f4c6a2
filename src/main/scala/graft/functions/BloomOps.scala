package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered semi-joins — the 100 TB form of "keep only rows
  * whose key appears in a (much smaller) reference set".
  *
  * A plain left-semi join shuffles BOTH sides by the key (or broadcasts
  * the whole distinct key set). With a Bloom filter built over the small
  * side, the big side is cut SCAN-SIDE to `might contain` survivors —
  * a codegen predicate over a broadcast bitset literal, no shuffle, no
  * exchange — and only that sliver pays the exact semi-join that removes
  * the false positives. This is the design PLANS.md names for
  * decontamination (q85): one pass over the training corpus, the test
  * set's shingles riding along as ~n·log(1/fpp)/ln2 bits.
  *
  * Built on Spark's own sketch expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the machinery behind AQE's runtime bloom
  * join, here applied deliberately where WE know the small side in
  * advance instead of hoping the optimizer injects it).
  */
object BloomOps {

  /** One serialized Bloom filter over the (xxhash64 of the) key column,
    * or None when the build side is empty (the aggregate evals to null).
    * The blob is bounded by `numBits` regardless of row count — safe to
    * return to the driver and embed as a plan literal.
    *
    * Spark SILENTLY Math.min-caps items/bits against
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (4M / 64Mbit by default) — a 500M-key reference set would saturate
    * to fpp ≈ 1 and the "prefilter" would pass everything while looking
    * healthy. Refuse loudly instead: size the confs to the reference
    * set, don't let the filter degrade in silence. */
  def buildFilter(small: DataFrame, key: Column,
                  expectedItems: Long, fpp: Double): Option[Array[Byte]] = {
    val conf = small.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val numBits = optimalNumBits(expectedItems, fpp)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom build ($expectedItems items / $numBits bits) exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
        s"($maxItems / $maxBits) — Spark would silently cap and saturate " +
        "the filter; raise the confs to the reference-set size")
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Bridge.expression(lit(expectedItems)),
      Bridge.expression(lit(numBits))).toAggregateExpression()
    Option(small.select(Bridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf"))
  }

  /** `might contain` predicate against a prebuilt filter blob — a pure
    * codegen expression over a plan literal: stays inside the scan's
    * WholeStageCodegen span and pushes NOTHING to a shuffle. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Literal(filter, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** Standard optimal-bits formula, clamped to Spark's sketch minimum. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp out of range: $fpp")
    math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Exact left-semi join with a Bloom pre-filter: result rows are
    * IDENTICAL to `big.join(smallKeys, key, "left_semi")` (the exact
    * join removes the bloom's false positives); the plan differs — the
    * big side shrinks at the scan, so the semi-join's shuffle carries
    * the match-density sliver, not the corpus.
    *
    * `expectedItems = None` (the default) sizes the filter from the
    * small side's OBSERVED distinct cardinality — one count job over
    * the small side (tiny by contract) before the filter build. This
    * is the scale-safe default: a FIXED size under a growing reference
    * set saturates the bloom (fpp → 1), the "prefilter" passes nearly
    * everything, and the exact join's shuffle silently rides back up
    * with the corpus — q91's 1.14 decade exponent until r15. Pass an
    * explicit size only when the cardinality is known a priori and the
    * extra job matters. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Option[Long] = None,
                    fpp: Double = 0.01): DataFrame = {
    val rhs = small.select(col(smallKey).as(bigKey)).distinct()
    def assemble(n: Long, buildSide: DataFrame, buildKey: String): DataFrame =
      // empty build side: a semi-join against an empty RHS is empty —
      // match that, don't throw (schema preserved). Checked BEFORE the
      // build: BloomFilterAggregate requires estimatedNumItems > 0.
      if (n <= 0L) big.filter(lit(false))
      else buildFilter(buildSide, col(buildKey), n, fpp) match {
        case None => big.filter(lit(false))
        case Some(blob) =>
          big.filter(mightContain(blob, col(bigKey)))
            .join(rhs, Seq(bigKey), "left_semi")
      }
    expectedItems match {
      case Some(n) => assemble(n, small, smallKey)
      case None =>
        // auto path: cache the distinct RHS so the sizing count and the
        // filter build share ONE evaluation of the small side's lineage
        // (which may be an explode over a corpus slice, not a cheap
        // table) instead of re-deriving it per job; the cache is
        // dropped before return, so the final join's execution
        // recomputes it once — 2 total evaluations, not 3
        // (review-found). Building over the cached DISTINCT keys
        // yields the identical filter: bloom insertion is idempotent
        // on duplicates.
        rhs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try assemble(rhs.count(), rhs, bigKey)
        finally rhs.unpersist(blocking = false)
    }
  }
}
