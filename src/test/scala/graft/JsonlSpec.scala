package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.CorpusJsonl

class JsonlSpec extends SparkSpecBase {

  test("jsonl round-trip preserves the documents table exactly") {
    val root = TestFixtures.tempRoot("jsonl-rt")
    val out = root.resolve("corpus").toString
    val src = Tables(spark, sf0001, "documents")
    CorpusJsonl.write(src, out, shards = 4, compression = "gzip")
    // gzip shards: one file per shard, read parallelism = shard count
    val parts = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".json.gz"))
    assert(parts == 4)
    val (clean, bad) = CorpusJsonl.readSplit(spark, out)
    assert(bad.count() == 0)
    val a = src.orderBy("doc_id").collect()
    val b = clean.orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("malformed jsonl lines quarantine instead of failing the read") {
    val root = TestFixtures.tempRoot("jsonl-bad")
    val dir = root.resolve("corpus")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "good line", "lang": "en", "source": "s", "n_chars": 9}
        |{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}
        |{not json at all
        |{"doc_id": "WRONG TYPE", "text": "bad id", "lang": "en"}
        |""".stripMargin)
    val (clean, bad) = CorpusJsonl.readSplit(spark, dir.toString)
    assert(clean.count() == 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))
    val quarantined = bad.collect().map(_.getString(0))
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("not json")))
    assert(quarantined.exists(_.contains("WRONG TYPE")))
  }
}
