package graft

import java.nio.file.{Files, Path, Paths}

/** Synthesizes a reference-shaped `incoming/` tree (FIXTURES.md §1):
  * `incoming/<day>/rxndata_<uuid36>.csv` + `metadata_<uuid36>.json`. */
object TestFixtures {

  val csvHeader =
    """Unnamed: 0,SimulationID,CA (mol/m^3),CB (mol/m^3),CC (mol/m^3),CD (mol/m^3),T (K),Tsensor (K),t (sec)"""

  def simUuid(n: Int): String = f"00000000-0000-4000-8000-${n}%012d"

  def writeCsv(root: Path, day: String, simNo: Int, nRows: Int,
      withArtifact: Boolean = true, dropColumn: Option[String] = None,
      inFileIdOverride: Option[String] = None): Path = {
    val id = simUuid(simNo)
    val inFileId = inFileIdOverride.getOrElse(id)
    val dir = root.resolve(s"incoming/$day")
    Files.createDirectories(dir)
    val header = dropColumn match {
      case Some(c) => csvHeader.split(",").filterNot(_ == c).mkString(",")
      case None if withArtifact => csvHeader
      case None => csvHeader.split(",").drop(1).mkString(",")
    }
    val cols = header.split(",")
    val rows = (0 until nRows).map { i =>
      cols.map {
        case "Unnamed: 0" => i.toString
        case "SimulationID" => inFileId
        case "t (sec)" => (i * 0.5).toString
        case _ => (300.0 + simNo * 10 + i * 0.25).toString
      }.mkString(",")
    }
    val f = dir.resolve(s"rxndata_$id.csv")
    Files.writeString(f, (header +: rows).mkString("\n"))
    f
  }

  def writeMetadata(root: Path, day: String, simNo: Int,
      dateRun: String = "2024-03-01", omitId: Boolean = false): Path = {
    val id = simUuid(simNo)
    val dir = root.resolve(s"incoming/$day")
    Files.createDirectories(dir)
    val idField = if (omitId) "" else s""""simulation_id": "$id","""
    val json =
      s"""{$idField
         |"reaction_name": "rxn_$simNo",
         |"activation_energy (J/mol)": ${50000.0 + simNo},
         |"CA0_(mol/m^3)": ${1.0 + simNo},
         |"CB0_(mol/m^3)": ${2.0 + simNo},
         |"T0_(K)": 300.0,
         |"date_run": "$dateRun",
         |"stop_reason": "converged",
         |"stop_time_(s)": ${100.0 + simNo}}""".stripMargin
    val f = dir.resolve(s"metadata_$id.json")
    Files.writeString(f, json)
    f
  }

  def tempRoot(prefix: String): Path =
    Files.createTempDirectory(prefix)
}
