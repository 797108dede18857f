package graft.streaming

import java.nio.file.{Files, Path => JPath}
import java.util.Comparator
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import StoreHarness.adapters

/** Exhaustive crash-point fuzz of the marked-swap compaction protocol
  * (round-17 item: replace the hand-enumerated crash windows with
  * exhaustion). For every store with a compactor:
  *
  *  1. build a 3-batch store once (the template) and record its state;
  *  2. dry-run a compaction through [[CrashFs]] to COUNT its mutating
  *     filesystem operations (N);
  *  3. for every k in 0..N-1: restore the template, arm a crash at
  *     mutating op k, run the compaction (op k and everything after it
  *     throws — a process death at that exact point), then with the
  *     injector disarmed assert the store invariant:
  *       - serving state equals the pre-compaction state (recovery is
  *         read-side: the serving read itself must converge), and
  *       - a subsequent clean compaction completes and preserves state
  *         (the store is not wedged).
  *
  * The sweep covers every window the round-16 hand-enumeration argued
  * about — crash before the marker write, between the two renames,
  * after the final rename but before the `.old` delete — plus every
  * window inside Spark's own rewrite commit that nobody enumerated.
  */
class CrashFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def copyTree(src: JPath, dst: JPath): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private def deleteTree(p: JPath): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[JPath]())
        .forEach(f => Files.delete(f))

  // ingest-path sweep for the three most fragile semantics: the
  // manifest (a modular SUM — any double-count or loss is permanent),
  // the MinHash dedup store (replays recompute against history), and
  // heavy hitters (TWO substores under one batch — a crash between the
  // sketch and cand writes leaves the batch half-landed, and CMS
  // counters double on any re-add). A crash at every mutating op of a
  // batch REPLAY, including inside the retract-then-write marker and
  // breadcrumb windows, must heal on the next replay.
  for (a <- adapters.filter(x =>
      x.name == "IncrementalManifest" || x.name == "IncrementalDedup" ||
        x.name == "IncrementalHeavyHitters")) {
    test(s"${a.name}: a batch replay survives a crash at EVERY mutating fs operation") {
      hconf.set("fs.crash.impl", classOf[CrashFs].getName)
      val template = Files.createTempDirectory(s"graft-ifuzz-${a.name}")
      (0 to 1).foreach(a.ingest(template.toString, _))
      val expected = a.state(template.toString)

      // count the replay's mutating ops (batch 1 re-ingested, crash fs)
      val probe = Files.createTempDirectory(s"graft-ifuzz-${a.name}-probe")
      deleteTree(probe); copyTree(template, probe)
      CrashFs.armCounting()
      a.ingest(s"crash://$probe", 1)
      val n = CrashFs.opCount
      assert(n > 0)
      info(s"${a.name}: $n mutating ops in one batch replay — sweeping all")

      (0L until n).foreach { k =>
        val work = Files.createTempDirectory(s"graft-ifuzz-${a.name}-$k")
        deleteTree(work); copyTree(template, work)
        CrashFs.armCrashAfter(k)
        try a.ingest(s"crash://$work", 1) // the crashing replay
        catch { case _: Throwable => () }
        finally CrashFs.disarm()
        a.ingest(work.toString, 1) // streaming replays it again on restart
        assert(a.state(work.toString) == expected,
          s"replay after a crash at mutating op $k must converge")
        deleteTree(work)
      }
      deleteTree(probe)
    }
  }

  // one compaction sweep per compactable store
  for (a <- adapters if a.compact.isDefined) {
    test(s"${a.name}: compaction survives a crash at EVERY mutating fs operation") {
      hconf.set("fs.crash.impl", classOf[CrashFs].getName)
      val template = Files.createTempDirectory(s"graft-fuzz-${a.name}")
      (0 to 2).foreach(a.ingest(template.toString, _))
      val expected = a.state(template.toString)

      // crash-scheme twin of the template root: same local bytes,
      // every fs op routed through the injector
      def crashRoot(p: JPath): String = s"crash://$p"

      // dry run: count the compaction's mutating ops
      val probe = Files.createTempDirectory(s"graft-fuzz-${a.name}-probe")
      deleteTree(probe); copyTree(template, probe)
      CrashFs.armCounting()
      a.compact.get(crashRoot(probe))
      val n = CrashFs.opCount
      assert(n > 0, "the dry run must traverse the injector")
      info(s"${a.name}: $n mutating ops in one compaction — sweeping all")

      (0L until n).foreach { k =>
        val work = Files.createTempDirectory(s"graft-fuzz-${a.name}-$k")
        deleteTree(work); copyTree(template, work)
        CrashFs.armCrashAfter(k)
        try a.compact.get(crashRoot(work))
        catch { case _: Throwable => () } // the injected crash
        finally CrashFs.disarm()
        assert(a.state(work.toString) == expected,
          s"serving after a crash at mutating op $k must converge")
        a.compact.get(work.toString) // the store must not be wedged
        assert(a.state(work.toString) == expected,
          s"clean re-compaction after a crash at op $k must preserve state")
        deleteTree(work)
      }
      deleteTree(probe)
    }
  }
}
