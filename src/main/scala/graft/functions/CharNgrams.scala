package org.apache.spark.sql.graftgen

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram UDTF as a custom Catalyst [[Generator]] — the
  * engine's generator-shaped extension point (SURVEY §2.9 names
  * `Generator` as the UDTF surface; every other custom-function shape
  * — scalar codegen expression, TypedImperativeAggregate, optimizer
  * rule, planner strategy, physical operator — already exists).
  *
  * Why a Generator instead of `explode(array_of_ngrams)`: the explode
  * formulation must MATERIALIZE one array of n-grams per document
  * before the generate — for a 100 KB document and n = 3 that is a
  * ~300 KB transient array allocation per row, at 100 TB a GC storm.
  * A Generator yields rows LAZILY from an iterator over the parent
  * string: one small substring allocation per emitted row and zero
  * intermediate collection, while the downstream aggregate consumes
  * rows as they are produced (GenerateExec streams the iterator).
  *
  * Semantics: all contiguous n-character windows (UTF-16 units ==
  * codepoints on BMP text; the corpus is astral-stripped by
  * `graft_nfc` upstream where that matters) of `child`; strings
  * shorter than n emit nothing; null emits nothing. Mirrors DuckDB's
  * `substring(text, i, n)` over `generate_series` exactly on BMP
  * input.
  *
  * Registered as SQL function `graft_char_ngrams` by
  * [[graft.GraftExtensions]]; Scala API [[CharNgrams.charNgrams]].
  */
case class CharNgrams(child: Expression, n: Expression)
  extends Generator with ExpectsInputTypes with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType)
  override def prettyName: String = "graft_char_ngrams"

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    val kv = n.eval(input)
    if (t == null || kv == null) Iterator.empty
    else {
      val s = t.asInstanceOf[UTF8String].toString
      val k = kv.asInstanceOf[Int]
      if (k <= 0 || s.length < k) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        private val last = s.length - k
        override def hasNext: Boolean = i <= last
        override def next(): InternalRow = {
          val row = new GenericInternalRow(
            Array[Any](UTF8String.fromString(s.substring(i, i + k))))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNgrams =
    copy(child = newChildren(0), n = newChildren(1))
}

object CharNgrams {
  /** Scala-API generator column: lazy character n-grams of `text`. */
  def charNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(
      CharNgrams(ExpressionUtils.expression(text),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))
}
