package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType}

/** Skew-mitigation building blocks for the 100 TB posture. AQE's skew-join
  * splitting handles most runtime skew; these are the declarative forms
  * for when the skew is known ahead of time.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. Spark's hash aggregate already does
    * map-side partials — salting additionally splits a hot *reduce* key
    * across `saltBuckets` reducers, bounding any single task's input when
    * one key dominates (e.g. one language owning half the corpus).
    *
    * `partialAggs` must be algebraic (sum/count/min/max style) so
    * re-aggregating partials is exact; pass the matching `finalAggs` over
    * the partial columns.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: explode the
    * (small) build side `saltBuckets` ways and salt the probe side, so one
    * hot key's probe rows spread over `saltBuckets` tasks instead of one.
    * Exact same join result as the unsalted join.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter join pre-filter: build a Bloom filter over the (much
    * smaller) build side's keys and drop probe rows that can't match
    * BEFORE the join shuffle. When the join is selective — most probe
    * rows match nothing — this cuts the shuffled probe volume to the
    * matching fraction (+ the false-positive rate), at the cost of one
    * small pass. False positives only ever let a row through to the real
    * join, so the result is exactly the inner join's. This is the manual
    * form of runtime row-group filtering; `expectedItems`/`fpp` size the
    * filter (bits ~ -n·ln(fpp)/ln2²).
    */
  def bloomPrefilteredJoin(probe: DataFrame, probeKey: String,
                           build: DataFrame, buildKey: String,
                           expectedItems: Long = 1000000L,
                           fpp: Double = 0.01): DataFrame = {
    // The native probe below passes the RAW key as a long (matching
    // stat.bloomFilter's putLong insertion), so the prefilter applies
    // only when BOTH keys are integral — a string build key would insert
    // UTF-8 hashes the long probe never matches (silently dropping rows
    // the plain join keeps via implicit casts), and a non-integral probe
    // cast to long would null out. Either mismatch → plain join.
    def integral(df: DataFrame, key: String): Boolean =
      df.schema(key).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    // Spark's stat.bloomFilter NPEs on a zero-row input (null aggregation
    // buffer) and rejects unsupported build-key types with IAE; an empty
    // build side makes the prefilter pointless anyway — the plain join
    // returns the identical result in every fallback case.
    val bloom =
      if (!integral(probe, probeKey) || !integral(build, buildKey)) None
      else try Some(build.stat.bloomFilter(buildKey, expectedItems, fpp))
      catch {
        case _: NullPointerException | _: IllegalArgumentException => None
      }
    val prefiltered = bloom match {
      case Some(bf) =>
        // Native codegen probe: the filter bytes ride as a binary literal
        // into BloomFilterMightContain (what InjectRuntimeFilter plans),
        // keeping the hot filter inside whole-stage codegen — no boxed-Long
        // scala UDF per probe row. stat.bloomFilter inserts the raw long
        // values (putLong), so the probe side passes the raw key, not a
        // rehash. A 1M-item/1% filter is ~1.2 MB: fine as a task literal.
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          bos.toByteArray
        }
        val mightMatch = ColumnBridge.column(BloomFilterMightContain(
          Literal(bytes, BinaryType),
          ColumnBridge.expression(col(probeKey).cast("long"))))
        probe.filter(col(probeKey).isNotNull && mightMatch)
      case None => probe
    }
    prefiltered.join(build, col(probeKey) === col(buildKey))
  }
}
