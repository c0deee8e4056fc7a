package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document MinHash signature (round-14).
  *
  * The aggregate form ([[graft.scale.Dedup.signaturesFromSets]]'
  * composed body) explodes every shingle into its own row, hashes it,
  * and runs a 64-column `min(pmod(h·aᵢ+bᵢ, P))` hash aggregate back to
  * one row per document — the single most expensive stage of the
  * curation pipelines (explode traffic + 5k-group aggregate). This
  * expression computes the identical k mins in ONE pass over the
  * shingle array: per non-null element, base hash (md5-60 in
  * reproducible mode, Murmur3(seed 42) cast through int otherwise —
  * exactly `hash(c).cast("long")`), `pmod` to [0, P), then the k
  * linear probes, tracking mins locally. min over the same multiset of
  * values = bit-equal (ScaleSpec pins it).
  *
  * NULL result when the array holds no non-null element — the
  * aggregate form produced NO row for such documents (explode_outer +
  * null filter), so callers filter null sigs to preserve the contract.
  * Precondition (unchanged): one row per id — the aggregate form
  * merged duplicate ids' sets, this form does not; every caller feeds
  * unique doc ids.
  */
object MinHashSig {

  def sig(arr: ArrayData, as: Array[Long], bs: Array[Long],
      reproducible: Boolean, prime: Long): ArrayData = {
    val k = as.length
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val s = arr.getUTF8String(i)
        val base =
          if (reproducible) Md5Hash60.hashUtf8(s)
          else Murmur3HashFunction.hash(s, StringType, 42L).toInt.toLong
        var h = base % prime
        if (h < 0) h += prime
        var j = 0
        while (j < k) {
          var v = (h * as(j) + bs(j)) % prime
          if (v < 0) v += prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  def sigCol(c: Column, coeffs: Seq[(Long, Long)], reproducible: Boolean,
      prime: Long): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, reproducible,
      prime))
}

case class MinHashSigExpr(child: Expression, as: Array[Long],
    bs: Array[Long], reproducible: Boolean, prime: Long)
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty,
    "need matching non-empty coefficient arrays")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.sig(a.asInstanceOf[ArrayData], as, bs, reproducible, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinHashSig.sig($a, $asRef, $bsRef,
        $reproducible, ${prime}L);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}
