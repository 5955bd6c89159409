package graft.sources.docstore

import java.nio.file.Files

import graft.SparkSpec

/** Deterministic pins for the crash states [[DocStore.writeFileAtomic]]
  * can leave around its rename — the classes [[graft.LeaseFuzzSpec]]'s
  * kill -9 runs hit statistically, frozen as unit tests. Lives in this
  * package because the metadata accessors are deliberately
  * `private[docstore]`.
  */
class MetadataCrashSpec extends SparkSpec {

  test("metadata crash states stay readable: no-crc reads unverified, a stale crc heals on the next write") {
    // The two states a kill -9 can leave around writeFileAtomic's rename
    // (LeaseFuzzSpec's full-suite kills hit the pre-fix versions of both):
    // (1) the crc sidecar was dropped but the new data landed — the file
    // must read fine WITHOUT a checksum; (2) an out-of-band stale crc
    // sits beside the file (the pre-fix torn state, or hand tampering) —
    // the next metadata WRITE must heal it rather than crash on it.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_docstore_meta_crash").toString
    (1L to 20L).map(i => (i, s"doc$i")).toDF("id", "s")
      .coalesce(1).write.format("docstore").mode("overwrite").save(dir)
    val statsBefore = DocStore.readStats(dir)
    assert(statsBefore.nonEmpty)
    val statsPath = java.nio.file.Paths.get(dir, "_stats.json")
    val crcPath = java.nio.file.Paths.get(dir, "._stats.json.crc")
    // state (1): data present, sidecar gone — crash fell between the
    // crc drop and the crc half of the rename
    Files.deleteIfExists(crcPath)
    assert(DocStore.readStats(dir) === statsBefore,
      "a checksum-less stats file must read unverified, not fail")
    // state (2): stale crc beside rewritten bytes (simulated with a raw
    // byte append that invalidates the checksum) — the read fails loudly
    // (documented corruption contract), but the next WRITE must heal it
    DocStore.writeStats(dir, statsBefore) // recreate a crc sidecar
    Files.write(statsPath, Files.readAllBytes(statsPath) ++ " ".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](DocStore.readStats(dir))
    assert(e.getMessage.contains("_stats.json"), e.getMessage)
    DocStore.writeStats(dir, statsBefore)
    assert(DocStore.readStats(dir) === statsBefore,
      "writeStats over a stale-crc state must heal, not crash")
  }
}
