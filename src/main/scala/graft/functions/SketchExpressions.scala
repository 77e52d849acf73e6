package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions (MinHash signature, SimHash) for the dedup
  * scale path.
  *
  * The equivalent built-in HOF formulation (k× `transform` + `array_min`,
  * 64× `aggregate` bit votes) is interpreted per element with boxed
  * lambdas — measured 42 s (MinHash) / 5 s (SimHash) over 5,000 docs at
  * sf0.1. These expressions do one primitive pass per row. They are
  * CodegenFallback (one virtual call per ROW, not per element×hash): the
  * inner k×n loop is compiled Scala, which is what matters — per-row
  * overhead is noise at any scale because rows are coarse (a whole
  * document's shingle set).
  */

/** k-permutation MinHash signature over an array<long> of shingle hashes.
  * sig[i] = min over h of ((h mod p)·a[i] + b[i]) mod p. Returns
  * array<long> of length k; null input → null; empty input → p for every
  * slot (a defined, stable sentinel). */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long],
    p: Long) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = a.length
    val mins = Array.fill(k)(p)
    var j = 0
    while (j < n) {
      val h = java.lang.Math.floorMod(arr.getLong(j), p)
      var i = 0
      while (i < k) {
        val v = java.lang.Math.floorMod(h * a(i) + b(i), p)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes (frequency-weighted:
  * duplicates vote multiple times). Bit i of the result is 1 iff more
  * token hashes have bit i set than clear. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-row Bloom membership probe of a CONSTANT pre-hashed value — the
  * sidecar-planning shape (one serialized filter per row = one per data
  * file), which Spark's own BloomFilterMightContain cannot express: its
  * analysis check requires the FILTER side to be the constant/subquery
  * and the probe side the column, exactly backwards from file-skipping
  * metadata where the filters are the rows. CodegenFallback is fine
  * here — the expression evaluates once per SIDECAR row (metadata
  * scale, one row per file), never per data row. */
case class BloomContainsValue(child: Expression, hashed: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_value requires binary, got ${t.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_value"

  override protected def nullSafeEval(bloom: Any): Any =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]]))
      .mightContainLong(hashed)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SketchFunctions {
  def minhashSig(hashes: Column, a: Array[Long], b: Array[Long], p: Long)
      : Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), a, b, p))

  def simhash64(tokenHashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokenHashes)))

  /** Mergeable Bloom filter over a LONG column (pre-hash values with
    * xxhash64) — Spark's own runtime-filter aggregate
    * (catalyst BloomFilterAggregate: partial filters per partition, OR-ed
    * at final), surfaced as a library Column. The result is ONE binary
    * value whose size depends only on `expectedItems`, never on the data —
    * the membership-set shape that stays broadcastable when the set
    * itself no longer is. */
  def bloomAgg(hashedValue: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(GraftBridge.expression(hashedValue),
          expectedItems)
        .toAggregateExpression())

  /** Membership probe against a [[bloomAgg]] filter: false ⇒ definitely
    * absent; true ⇒ present OR false positive (callers exact-verify). */
  def bloomMightContain(bloom: Column, hashedValue: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftBridge.expression(bloom), GraftBridge.expression(hashedValue)))

  /** Probe a COLUMN of [[bloomAgg]] filters with one constant pre-hashed
    * value (per-file sidecar planning — see [[BloomContainsValue]]). */
  def bloomContainsValue(bloom: Column, hashed: Long): Column =
    GraftBridge.column(
      BloomContainsValue(GraftBridge.expression(bloom), hashed))
}
