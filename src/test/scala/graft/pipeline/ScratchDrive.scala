package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch drive for round-3 iteration — delete before committing round end
object ScratchDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"

    // 1. simhash hamming distribution over the exact jaccard>=0.9 pair set
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val withSim = docs.select(col("doc_id").cast("long").as("id"),
      Dedup.simHash(col("text")).as("sh"),
      array_sort(transform(Dedup.tokenSet(col("text")), t => xxhash64(t))).as("toks"))
    val exactPairs = withSim.as("l").join(withSim.as("r"), col("l.id") < col("r.id"))
      .withColumn("j", graft.functions.SketchFunctions.sorted_long_jaccard(col("l.toks"), col("r.toks")))
      .filter(col("j") >= 0.9)
      .select(bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
    println("== hamming distribution of jaccard>=0.9 pairs:")
    exactPairs.groupBy("hamming").count().orderBy("hamming").collect()
      .foreach(r => println(s"==   hamming=${r.get(0)} count=${r.get(1)}"))

    // 2. q33 IVF vs q27 exact
    val ivf = graft.SparkEntry.queries("q33_ivf_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ex = graft.SparkEntry.queries("q27_ann_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    println(s"== ivf=${ivf.size} exact=${ex.size} diff=${(ex -- ivf).size} ${(ex -- ivf).take(5)}")

    // 3. schema_of_xml DDL on q16-style payloads
    import spark.implicits._
    val payloads = spark.read.parquet(s"$dir/orders.parquet").select(
      concat(lit("<o><k>"), col("o_orderkey"),
        lit("</k><p>"), col("o_orderpriority"), lit("</p></o>")).as("payload"))
    val st = graft.xml.schema_of_xml(payloads.as[String].limit(2000).as[String])
    println(s"== schema_of_xml DDL: [${st.toDDL}]  sql=[${st.sql}]")
    spark.stop()
  }
}
