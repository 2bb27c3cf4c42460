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
  * Deserialized filters are cached in a JVM-GLOBAL map keyed by the
  * broadcast id — NOT per expression instance: the expression rides every
  * task's serialized binary, so a per-instance `@transient lazy` would
  * re-deserialize the whole shard set once per TASK (at the motivating
  * ~11 GB index scale, 8 concurrent tasks would transiently hold 8 full
  * copies of the bit arrays). One deserialization per (executor JVM,
  * broadcast) is the contract; the cache entry lives as long as the JVM,
  * matching the broadcast block's own lifetime. */
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
    new java.util.concurrent.ConcurrentHashMap[Long, IndexedSeq[BloomFilter]]()

  private[graft] def filtersFor(
      shards: Broadcast[IndexedSeq[Array[Byte]]]): IndexedSeq[BloomFilter] =
    cache.computeIfAbsent(shards.id, _ =>
      shards.value.map(b => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))))
}
