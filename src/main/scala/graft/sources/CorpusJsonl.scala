package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON document per line) corpus source/sink — the de facto
  * interchange format for LLM training corpora (each line a document
  * with text + provenance metadata, files gzip-compressed and sharded).
  *
  * Read posture for scale:
  *   - ALWAYS an explicit schema: schema inference reads every byte of
  *     the corpus once before the real job starts — a full extra pass
  *     over 100 TB. The schema is part of the corpus contract.
  *   - PERMISSIVE with a retained corrupt-record column: a handful of
  *     malformed lines must quarantine, not kill a day-long job
  *     (FAILFAST) or silently vanish (DROPMALFORMED). [[readSplit]]
  *     returns (clean, quarantined) so the caller lands both, the same
  *     containment contract as the CSV pipeline's ledger gate (K6).
  *   - gzip JSONL is NOT splittable — one task per shard, so shard size
  *     at write time IS read parallelism. [[write]] therefore shards by
  *     count; zstd/none stay splittable but gzip is what public corpora
  *     actually ship.
  */
object CorpusJsonl {

  /** The documents-table contract, nullable text/meta, non-null id. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Write a documents DataFrame as sharded JSONL. `shards` controls
    * file count (= max read parallelism for gzip); `compression` is
    * "gzip", "zstd", or "none". */
  def write(df: DataFrame, path: String, shards: Int = 16,
      compression: String = "gzip"): Unit =
    df.repartition(shards).write.mode("overwrite")
      .option("compression", compression).json(path)

  /** Read a JSONL corpus with the documents schema; malformed lines
    * surface as raw text in the second frame. Returns (clean rows in
    * contract order, quarantined raw lines).
    *
    * Implementation: `text` scan + `from_json` per line, NOT the json
    * datasource's `_corrupt_record` — the datasource forbids selecting
    * only the corrupt column without caching the whole parsed relation
    * (an unacceptable ask at corpus scale), while this shape is one
    * narrow codegen'd projection with both outputs plain filters over
    * it. A line quarantines if it isn't JSON at all (null struct) or
    * violates the contract's required key (null doc_id). */
  def readSplit(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), schema).as("d"))
    val ok = col("d").isNotNull && col("d.doc_id").isNotNull
    val clean = parsed.filter(ok).select(schema.fieldNames.map(f =>
      col(s"d.$f")): _*)
    val bad = parsed.filter(!ok).select(col("value").as("raw_line"))
    (clean, bad)
  }
}
