package graft

import org.apache.spark.sql.functions.col
import graft.ops.Clean
import graft.schema.Schemas

class CleanSpec extends SparkSpecBase {

  test("rename maps every unit-annotated header to snake_case") {
    val root = TestFixtures.tempRoot("clean-rename")
    TestFixtures.writeCsv(root, "2024-03-01", 1, 5)
    val raw = Clean.readIncomingCsvs(spark, Seq(s"$root/incoming/*/*.csv"))
    val renamed = Clean.rename(raw)
    assert(Schemas.requiredCols.forall(renamed.columns.contains))
    // unmapped columns pass through
    assert(renamed.columns.contains(Schemas.indexArtifactCol))
  }

  test("index artifact drop is idempotent and guarded") {
    val root = TestFixtures.tempRoot("clean-drop")
    TestFixtures.writeCsv(root, "2024-03-01", 1, 3, withArtifact = false)
    val raw = Clean.readIncomingCsvs(spark, Seq(s"$root/incoming/*/*.csv"))
    val once = Clean.dropIndexArtifact(Clean.rename(raw))
    val twice = Clean.dropIndexArtifact(once)
    assert(once.columns.sameElements(twice.columns))
    assert(!once.columns.contains(Schemas.indexArtifactCol))
    // columns bind BY NAME: without the artifact column nothing shifts —
    // simulation_id is the uuid and rxn_time starts at 0.0
    val row = once.orderBy("rxn_time").select("simulation_id", "rxn_time").head()
    assert(row.getString(0) == TestFixtures.simUuid(1))
    assert(row.getDouble(1) == 0.0)
  }

  test("missing required column fails validation with its name") {
    val root = TestFixtures.tempRoot("clean-miss")
    TestFixtures.writeCsv(root, "2024-03-01", 2, 3,
      dropColumn = Some("CB (mol/m^3)"))
    val raw = spark.read.option("header", "true")
      .csv(s"$root/incoming/2024-03-01/*.csv")
    val e = intercept[IllegalArgumentException] {
      Clean.validated(Clean.rename(raw))
    }
    assert(e.getMessage.contains("cb"))
  }

  test("simulation_id and day recovered from path") {
    val root = TestFixtures.tempRoot("clean-path")
    TestFixtures.writeCsv(root, "2024-03-02", 7, 4)
    val df = Clean.clean(
      Clean.readIncomingCsvs(spark, Seq(s"$root/incoming/*/*.csv")))
    val rows = df.select("file_simulation_id", "day", "simulation_id").distinct().collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == TestFixtures.simUuid(7))
    assert(rows(0).getString(1) == "2024-03-02")
    // filename id agrees with the in-file column (FIXTURES.md contract)
    assert(rows(0).getString(2) == TestFixtures.simUuid(7))
  }
}
