package graft.xml;

import java.util.Arrays;
import java.util.HashMap;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

/**
 * Exercises the engine's public surface from plain Java, mirroring the
 * reference's JavaXmlSuite: DataFrameReader/Writer with the short name and
 * full format class, the {@code graft.xml.functions} column facade, schema
 * inference, and SQL DDL registration. Driven by JavaInteropSuite (no JUnit
 * in the offline dependency cache); each method returns a value the Scala
 * spec asserts on.
 */
public final class JavaXmlInterop {
  private JavaXmlInterop() {}

  /** Parquet -> XML write -> schema'd XML read; returns the row count. */
  public static long roundtripCount(SparkSession spark, String parquetPath, String outPath) {
    Dataset<Row> df = spark.read().parquet(parquetPath);
    df.write().format("graft.xml").mode("overwrite").option("rowTag", "nation").save(outPath);
    Dataset<Row> back = spark.read().format("xmlng")
        .option("rowTag", "nation").schema(df.schema()).load(outPath);
    return back.count();
  }

  /** from_xml through the Java facade; returns the parsed (k, p) row. */
  public static Row fromXmlRow(SparkSession spark) {
    StructType schema = new StructType()
        .add("k", DataTypes.LongType)
        .add("p", DataTypes.StringType);
    Dataset<Row> payloads = spark.sql("SELECT '<o><k>7</k><p>hi</p></o>' AS payload");
    HashMap<String, String> options = new HashMap<>();
    return payloads
        .select(functions.from_xml(payloads.col("payload"), schema, options).alias("r"))
        .selectExpr("r.k", "r.p")
        .first();
  }

  /** schema_of_xml over a Java-built Dataset; returns the DDL string. */
  public static String inferredDdl(SparkSession spark) {
    Dataset<String> docs = spark.createDataset(
        Arrays.asList("<r><a>1</a><b>x</b></r>", "<r><a>2</a></r>"),
        Encoders.STRING());
    return functions.schema_of_xml(docs).toDDL();
  }

  /** SQL DDL with the xmlng short name and inferred schema; returns count. */
  public static long sqlViewCount(SparkSession spark, String xmlPath) {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW java_nation USING xmlng "
        + "OPTIONS (path '" + xmlPath + "', rowTag 'nation')");
    return spark.sql("SELECT n_name FROM java_nation").count();
  }

  /**
   * The pipeline operators are Scala objects, whose methods surface to Java
   * as static forwarders — this drives exact dedup, the quality gate, and
   * hash embeddings from plain Java and returns the surviving row count.
   */
  public static long pipelineFromJava(Dataset<Row> docs) {
    Dataset<Row> deduped = graft.pipeline.Dedup.exactDedup(docs, "doc_id", "text");
    Dataset<Row> gated = graft.pipeline.TextAnalysis
        .qualityFilter(deduped, "doc_id", "text",
            1, 100000, 0.0, 100.0, 1.0, 0.0, 1.0)
        .filter("keep"); // (doc_id, keep, reasons)
    Dataset<Row> kept = deduped.join(gated.select("doc_id"), "doc_id");
    return kept.select(
        graft.pipeline.Similarity.hashEmbed(kept.col("text"), 8).alias("e"))
        .count();
  }
}
