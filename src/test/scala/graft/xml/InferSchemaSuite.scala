package graft.xml

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class InferSchemaSuite extends AnyFunSuite {

  private val opts = XmlOptions()

  private def infer(record: String): DataType = InferSchema.inferRecord(record, opts)
  private def merge(a: DataType, b: DataType): DataType = InferSchema.compatibleType(opts)(a, b)

  test("leaf type inference ladder") {
    assert(InferSchema.inferLeaf("123", opts) === LongType)
    assert(InferSchema.inferLeaf("1.25", opts) === DoubleType)
    assert(InferSchema.inferLeaf("true", opts) === BooleanType)
    assert(InferSchema.inferLeaf("2020-01-01T00:00:00Z", opts) === TimestampType)
    assert(InferSchema.inferLeaf("2020-01-01", opts) === DateType)
    assert(InferSchema.inferLeaf("hello", opts) === StringType)
    assert(InferSchema.inferLeaf("", opts) === NullType)
  }

  test("record inference: struct with attrs, repeated elements, valueTag") {
    val t = infer("""<r id="7"><a>1</a><a>2</a><b>x</b></r>""")
    val st = t.asInstanceOf[StructType]
    assert(st("_id").dataType === LongType)
    assert(st("a").dataType === ArrayType(LongType))
    assert(st("b").dataType === StringType)

    val vt = infer("""<r unit="kg">12.5</r>""").asInstanceOf[StructType]
    assert(vt("_unit").dataType === StringType)
    assert(vt("_VALUE").dataType === DoubleType)
  }

  test("merge lattice: numeric widening, null absorption, string top") {
    assert(merge(LongType, DoubleType) === DoubleType)
    assert(merge(NullType, LongType) === LongType)
    assert(merge(DateType, TimestampType) === TimestampType)
    assert(merge(LongType, StringType) === StringType)
    assert(merge(BooleanType, LongType) === StringType)
  }

  test("merge lattice: struct union and array wrapping") {
    val s1 = StructType(Seq(StructField("a", LongType)))
    val s2 = StructType(Seq(StructField("a", DoubleType), StructField("b", StringType)))
    val m = merge(s1, s2).asInstanceOf[StructType]
    assert(m("a").dataType === DoubleType)
    assert(m("b").dataType === StringType)

    assert(merge(ArrayType(LongType), LongType) === ArrayType(LongType))
    assert(merge(ArrayType(LongType), DoubleType) === ArrayType(DoubleType))
    assert(merge(ArrayType(LongType), ArrayType(DoubleType)) === ArrayType(DoubleType))
  }

  test("merge lattice: scalar absorbs into struct valueTag") {
    val attributed = StructType(Seq(
      StructField("_unit", StringType), StructField("_VALUE", LongType)))
    val m = merge(attributed, DoubleType).asInstanceOf[StructType]
    assert(m("_VALUE").dataType === DoubleType)
    assert(m("_unit").dataType === StringType)
  }

  test("mixed content: struct wins over interleaved text") {
    val t = infer("<r>leading <b>1</b> trailing</r>").asInstanceOf[StructType]
    assert(t.fieldNames.toSeq === Seq("b"))
  }
}
