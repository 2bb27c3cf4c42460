package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a HASH-SHARDED Bloom-filter index whose shard blobs
  * ride a Spark broadcast variable instead of plan literals.
  *
  * Why not one `BloomFilterMightContain(lit(bytes), h)` per shard: every
  * literal embeds its blob into the analyzed plan, so probe-plan size (and
  * per-task serialized closure) grows LINEARLY with total index bytes —
  * ~11 GB of literals at the documented 10^10-text cardinality even though
  * each 64 MB shard is individually fine. With a broadcast the plan carries
  * an O(1) handle; executors fetch the blob set once via the torrent
  * broadcast and every task on the executor shares the deserialized
  * filters.
  *
  * `left` is the row's shard id (`pmod(xxhash64(text), nShards)` — the SAME
  * routing the build used), `right` the xxhash64 itself. Evaluation is a
  * single `filters(shard).mightContainLong(hash)`; codegen references this
  * expression instance (`addReferenceObj`) so the generated code stays
  * inside whole-stage codegen with no fallback.
  *
  * Deserialized filters are cached in a JVM-GLOBAL map keyed by
  * (application id, broadcast id) — NOT per expression instance: the
  * expression rides every task's serialized binary, so a per-instance
  * `@transient lazy` would re-deserialize the whole shard set once per
  * TASK (at the motivating ~11 GB index scale, 8 concurrent tasks would
  * transiently hold 8 full copies of the bit arrays). One deserialization
  * per (executor JVM, broadcast) is the contract. Broadcast ids alone are
  * NOT a safe key: they restart at 0 with every new SparkContext, so in a
  * long-lived JVM (local mode, test suites, notebook restarts) a second
  * context's index would silently collide with — and serve — the previous
  * context's filters, turning Bloom "definitely new" answers into false
  * negatives. The application id (unique per context, available from
  * `SparkEnv` on both driver and executors) disambiguates; since at most
  * one SparkContext is active per JVM, entries under any OTHER app id are
  * provably stale and are evicted on the next miss, so the cache also
  * cannot grow across context restarts. */
case class ShardedBloomMightContain(
    shards: Broadcast[IndexedSeq[Array[Byte]]],
    left: Expression,
    right: Expression)
  extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sharded_bloom_might_contain expects (int shard, bigint hash), got $other")
    }

  @transient private lazy val filters: IndexedSeq[BloomFilter] =
    ShardedBloomMightContain.filtersFor(shards)

  def test(shard: Int, hash: Long): Boolean = filters(shard).mightContainLong(hash)

  override def nullSafeEval(shard: Any, hash: Any): Any =
    test(shard.asInstanceOf[Int], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardedBloom", this,
      classOf[ShardedBloomMightContain].getName)
    defineCodeGen(ctx, ev, (s, h) => s"$ref.test($s, $h)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShardedBloomMightContain {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[BloomFilter]]()

  private[graft] def filtersFor(
      shards: Broadcast[IndexedSeq[Array[Byte]]]): IndexedSeq[BloomFilter] = {
    val appId = org.apache.spark.SparkEnv.get.conf.getAppId
    val key = s"$appId#${shards.id}"
    val hit = cache.get(key)
    if (hit != null) return hit
    // Miss: drop entries from dead contexts (only one SparkContext is
    // active per JVM, so any other app id cannot be served again).
    val stalePrefixCheck = appId + "#"
    val it = cache.keySet().iterator()
    while (it.hasNext) if (!it.next().startsWith(stalePrefixCheck)) it.remove()
    cache.computeIfAbsent(key, _ =>
      shards.value.map(b => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))))
  }
}
