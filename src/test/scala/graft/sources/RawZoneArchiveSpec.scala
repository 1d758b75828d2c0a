package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** K7 — archive + restore round trip over a raw-zone date folder. */
class RawZoneArchiveSpec extends AnyFunSuite {

  test("archiveDay compacts and deletes; restoreDay round-trips") {
    val base = Files.createTempDirectory("graft_arch").toString
    val day = new java.io.File(base, "2024-01-15"); day.mkdirs()
    Files.writeString(new java.io.File(day, "AAPL.detailed-estimates.html")
      .toPath, "<html>a</html>")
    Files.writeString(new java.io.File(day, "MSFT.detailed-estimates.html")
      .toPath, "<html>m</html>")

    val n = RawZoneArchive.archiveDay(base, "2024-01-15")
    assert(n === 2)
    assert(!day.exists())
    assert(new java.io.File(base, "2024-01-15.zip").exists())

    val restored = RawZoneArchive.restoreDay(base, "2024-01-15")
    assert(restored === 2)
    assert(Files.readString(new java.io.File(day,
      "AAPL.detailed-estimates.html").toPath) === "<html>a</html>")
  }
}
