package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.sources.{Dbf, Landing, Tables}

/** The landing-zone loop ([[graft.sources.Landing]]) replayed offline,
  * end-to-end: remote catalog → worklist → out-of-band "fetch" (a local
  * copy stands in for curl/lftp) → worklist drains → distributed dbc
  * decode. Plus the size-mismatch re-download rule and the
  * metadata-only contract of the state scan.
  */
class LandingSpec extends SparkSpec {

  import spark.implicits._

  private def writeRemote(root: String): Unit = {
    val src = Tables.documents(spark, sfDir).select(
      col("doc_id").cast("string").as("DOC_ID"),
      col("lang").as("LANG"))
    Dbf.writeDbc(src.repartition(4), root)
  }

  test("worklist -> external fetch -> empty worklist -> decode, offline") {
    val base = s"${GraftSession.scratchRoot}/graft-landing"
    val remote = s"$base/remote"
    val landing = s"$base/zone"
    writeRemote(remote)
    Files.createDirectories(Paths.get(landing))
    val remoteFiles = new java.io.File(remote).listFiles
      .filter(_.getName.endsWith(".dbc")).sortBy(_.getName)
    assert(remoteFiles.length == 4)

    // the remote catalog IS a landed-state scan of the remote dir here;
    // a real deployment parses an FTP LIST dump with Listing.parseLines
    val catalog = Landing.landedState(spark, remote, "*.dbc")

    // land the first file only → the other three come back "ausente"
    Files.copy(remoteFiles.head.toPath,
      Paths.get(landing, remoteFiles.head.getName),
      StandardCopyOption.REPLACE_EXISTING)
    val wl1 = Landing.fetchWorklist(catalog, Landing.landedState(spark, landing, "*.dbc"))
      .select("nome_completo", "motivo").as[(String, String)].collect().sortBy(_._1)
    assert(wl1.map(_._1).toSeq == remoteFiles.tail.map(_.getName).toSeq)
    assert(wl1.forall(_._2 == "ausente"))

    // "external fetch": copy exactly what the worklist names
    wl1.map(_._1).foreach { f =>
      Files.copy(Paths.get(remote, f), Paths.get(landing, f),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val wl2 = Landing.fetchWorklist(catalog, Landing.landedState(spark, landing, "*.dbc"))
    assert(wl2.isEmpty, "a current landing zone must drain the worklist")

    // decode the landed zone distributed; rows equal the source
    val got = Dbf.readDbc(spark, landing)
      .as[(String, String)].collect().sortBy(_._1).toSeq
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string"), col("lang"))
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(got == want)

    // corrupt one landed file (truncate a byte) → size-mismatch re-fetch
    val victim = Paths.get(landing, remoteFiles.head.getName)
    val bytes = Files.readAllBytes(victim)
    Files.write(victim, bytes.dropRight(1))
    val wl3 = Landing.fetchWorklist(catalog, Landing.landedState(spark, landing, "*.dbc"))
      .select("nome_completo", "motivo").as[(String, String)].collect().toSeq
    assert(wl3 == Seq((remoteFiles.head.getName, "tamanho_diferente")))
  }

  test("landed-state scan prunes the binaryFile content column") {
    val base = s"${GraftSession.scratchRoot}/graft-landing-prune"
    writeRemote(base)
    val state = Landing.landedState(spark, base, "*.dbc")
    state.collect()
    val plan = state.queryExecution.executedPlan.toString
    assert(!plan.contains("content"),
      s"state scan must never read file contents:\n$plan")
  }
}
