package graft.tools

import java.io.File

/** Pre-run /tmp reclaim for heavy bench/verify runs.
  *
  * Crashed or killed Spark JVMs leave shuffle/spill debris behind
  * (`blockmgr-*`, `spark-*` scratch dirs) plus graft's own ephemeral
  * staging (stream landing dirs, reliable-CC checkpoints, per-run
  * daily-app bases). A big probe then fails on `No space left` hours in
  * — the round-10 sf100 probe grew a 40 GB blockmgr into an 89 %-full
  * disk. Sweeping STALE debris first makes the heavy run's budget
  * deterministic.
  *
  * Safety: a directory is deleted only when NOTHING under it (walked
  * fully, early-exit on the first fresh entry) was modified within
  * `ageHours` — a live JVM touches its scratch dirs continuously, so
  * freshness is liveness. Scaled data dirs (`graft-sf*`), models, and
  * bucketed/backfill tables are NOT swept: they are inputs keyed by
  * fingerprint, not debris.
  */
object Reclaim {

  private val debrisPrefixes = Seq(
    "blockmgr-", "spark-", // Spark scratch (crashed runs)
    "graft_twse_stream_", "graft_stream_", "graft_daily_q_",
    "graft_daily_spec_", "graft_cc_reliable")

  /** Sweep stale debris under `tmpDir`; returns bytes reclaimed. */
  def sweep(tmpDir: String = sys.props("java.io.tmpdir"),
      ageHours: Int = 6): Long = {
    val cutoff = System.currentTimeMillis() - ageHours * 3600L * 1000L
    val root = new File(tmpDir)
    val candidates = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => debrisPrefixes.exists(f.getName.startsWith))
      // never sweep the shared spark-local dir some setups pin
      .filterNot(_.getName == "spark-local")
    var reclaimed = 0L
    candidates.foreach { dir =>
      val (stale, bytes) = walk(dir, cutoff)
      if (stale) {
        delete(dir)
        reclaimed += bytes
      }
    }
    if (reclaimed > 0)
      System.err.println(
        f"[reclaim] freed ${reclaimed / (1L << 20)}%d MiB of stale debris")
    reclaimed
  }

  /** (allOlderThanCutoff, totalBytes); early-exits false on fresh entry. */
  private def walk(f: File, cutoff: Long): (Boolean, Long) = {
    if (f.lastModified() >= cutoff) return (false, 0L)
    if (f.isFile) (true, f.length())
    else {
      var bytes = 0L
      val children = Option(f.listFiles()).getOrElse(Array.empty)
      var i = 0
      while (i < children.length) {
        val (ok, b) = walk(children(i), cutoff)
        if (!ok) return (false, 0L)
        bytes += b
        i += 1
      }
      (true, bytes)
    }
  }

  private def delete(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val age = args.headOption.map(_.toInt).getOrElse(6)
    sweep(ageHours = age): Unit
  }
}
