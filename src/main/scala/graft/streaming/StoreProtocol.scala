package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** The generation-store crash protocol shared by [[DedupStream]] and
  * [[AnnStream]]: marker-listed cleanup of superseded generation dirs,
  * compaction-id derivation, generation listing, and recursive
  * copy/delete. One implementation so a protocol fix lands in both
  * stores at once (each previously carried a private copy, and the
  * r17 marker-retirement fixes had to be hand-mirrored).
  */
private[graft] object StoreProtocol {

  /** Delete any superseded generations a crashed compaction left
    * behind (marker present, listed dirs still on disk), then retire
    * the marker. Each marker line records the dir's OBSERVED mtime at
    * supersede time (`<mtime>\t<path>`), and a listed dir is deleted
    * iff it still carries exactly that mtime:
    *  - a genuinely superseded dir is immutable after supersede
    *    (compaction is the store's single writer), so it always
    *    matches and is always reclaimed — no mtime-tie leak on a
    *    coarse-granularity filesystem (the prior strictly-older guard
    *    could retire a marker while a same-tick dir survived,
    *    leaking it permanently when no later compaction ran);
    *  - a dir whose mtime CHANGED since supersede was re-created or
    *    re-seeded after the crash — live data — and survives: dropped
    *    from consideration, never deleted by this marker. Leftover
    *    live-but-stale generations are harmless in both stores (the
    *    dedup verdict aggregates are duplicate-tolerant; the ann fold
    *    dedups vec_ids and its readers pin the newest seed) and a
    *    LATER compaction folds and re-lists them under a fresh marker.
    *  - legacy lines without a recorded mtime (pre-r18 markers) fall
    *    back to the strictly-older-than-marker guard. A legacy line
    *    that survives on a TIE (dir mtime == marker mtime — ambiguous
    *    between same-tick supersede and same-tick re-creation on a
    *    coarse filesystem) is not abandoned: the marker is REWRITTEN
    *    listing the survivor with its now-observed mtime, so the NEXT
    *    cleanup pass disambiguates — still unchanged ⇒ superseded and
    *    reclaimed; changed ⇒ genuinely live, ceded. Without the
    *    rewrite a tie-surviving superseded dir leaked permanently
    *    whenever no later compaction ran. RESIDUAL ASSUMPTION, stated
    *    plainly: the rewrite trades the leak for a wrong-delete iff a
    *    legacy-listed path was RE-CREATED in the same mtime tick as
    *    the marker write and never written again — the two cases
    *    (superseded at tick T, re-created at tick T) leave IDENTICAL
    *    filesystem states, so no later observation can separate them;
    *    the protocol relies on same-tick re-creation not happening.
    *    That holds for every compaction-produced path (`b=seed<N>`/
    *    `b=fold<N>` ids are monotone via [[nextCompactId]], which
    *    reserves pending-marker ids — the path is never reused) and
    *    for per-batch `b=<id>` dirs under a preserved checkpoint
    *    (engine batch ids are monotone); the uncovered sliver is an
    *    operator action that reuses a path within one filesystem
    *    timestamp tick of the legacy supersede — a bare `b=seed`
    *    re-seed, or a fresh-checkpoint restart re-emitting an old
    *    batch id — against a marker that additionally predates r18.
    * The marker is retired only when every line was reclaimed or
    * deliberately ceded to a later compaction; otherwise it persists
    * (rewritten) and the next entry finishes the job. Id monotonicity
    * comes from live seed-dir suffixes ([[nextCompactId]]) AND pending
    * marker ids, so a rewritten marker also keeps its id reserved.
    */
  def finishPendingCleanup(root: String): Unit = {
    val commits = new java.io.File(root, "commits")
    Option(commits.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("compact-"))
      .foreach { m =>
        val markerMtime = m.lastModified()
        val relist = scala.collection.mutable.ArrayBuffer.empty[String]
        new String(Files.readAllBytes(m.toPath), "UTF-8")
          .linesIterator.filter(_.nonEmpty).foreach { line =>
            val (recorded, path) = line.indexOf('\t') match {
              case -1 => (None, line)
              case i => (scala.util.Try(line.take(i).toLong).toOption,
                line.drop(i + 1))
            }
            val d = Paths.get(path)
            if (Files.exists(d)) {
              val mtime = Files.getLastModifiedTime(d).toMillis
              recorded match {
                case Some(rec) =>
                  // unchanged since supersede ⇒ immutable superseded
                  // data; changed ⇒ re-created live data, ceded to a
                  // later compaction (never deleted by this marker)
                  if (mtime == rec) deleteRecursively(d)
                case None =>
                  if (mtime < markerMtime) deleteRecursively(d)
                  // the ambiguous legacy tie: observe now, decide at
                  // the next pass (see Scaladoc)
                  else if (mtime == markerMtime)
                    relist += s"$mtime\t$path"
                // mtime > markerMtime: re-created after the marker —
                // live, ceded (the legacy analog of the mismatch arm)
              }
            }
          }
        if (relist.isEmpty) Files.delete(m.toPath)
        else Files.write(m.toPath,
          relist.mkString("\n").getBytes("UTF-8"))
      }
  }

  /** The next compaction id: past BOTH every pending marker id and
    * every live compaction-produced generation suffix (`b=seed<N>`
    * from a scope-widening rebuild, `b=fold<N>` from the ann store's
    * flat consolidation), so a crash between the directory moves and
    * the marker write (a moved-but-unmarked generation) never wedges
    * future compactions on an id collision — the orphan folds in
    * under a fresh id.
    */
  def nextCompactId(root: String, genDirNames: Seq[String]): Int = {
    val liveIds = Seq("b=seed", "b=fold").flatMap(pre =>
      genDirNames.filter(_.startsWith(pre))
        .flatMap(d => scala.util.Try(d.stripPrefix(pre).toInt).toOption))
    1 + (pendingCompactIds(root) ++ liveIds).foldLeft(-1)(math.max)
  }

  def pendingCompactIds(root: String): Seq[Int] = {
    val commits = new java.io.File(root, "commits")
    Option(commits.listFiles).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.startsWith("compact-"))
      .flatMap(n => scala.util.Try(n.stripPrefix("compact-").toInt).toOption)
  }

  /** Write the superseded-dirs marker (each line `<mtime>\t<path>`,
    * the dir's mtime at supersede time — see [[finishPendingCleanup]]
    * for why the snapshot matters), delete the dirs, retire the marker
    * (a crash at any point is recovered by [[finishPendingCleanup]] at
    * the next compaction's entry).
    */
  def supersede(root: String, n: Int, superseded: Seq[String]): Unit = {
    val marker = Paths.get(root, "commits", s"compact-$n")
    Files.createDirectories(marker.getParent)
    val lines = superseded.map { p =>
      val d = Paths.get(p)
      val mt = if (Files.exists(d))
        Files.getLastModifiedTime(d).toMillis else 0L
      s"$mt\t$p"
    }
    Files.write(marker, lines.mkString("\n").getBytes("UTF-8"))
    superseded.foreach(p => deleteRecursively(Paths.get(p)))
    Files.delete(marker) // cleanup done; crash here = next-entry no-op
  }

  def generationDirs(root: String, kind: String): Seq[java.io.File] = {
    val d = new java.io.File(root, kind)
    if (!d.isDirectory) Seq.empty
    else Option(d.listFiles).map(_.filter(_.isDirectory).toSeq
      .sortBy(_.getName)).getOrElse(Seq.empty)
  }

  def copyRecursively(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          Files.createDirectories(t.getParent)
          Files.copy(p, t,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally walk.close()
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally walk.close()
    }

  def dirBytes(d: java.io.File): Long = {
    val walk = Files.walk(d.toPath)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(Files.isRegularFile(_)).map(Files.size).sum
    } finally walk.close()
  }
}
