package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** The generation-store crash protocol shared by [[DedupStream]] and
  * [[AnnStream]]: marker-listed cleanup of superseded generation dirs,
  * compaction-id derivation, generation listing, and recursive
  * copy/delete. One implementation so a protocol fix lands in both
  * stores at once (each previously carried a private copy, and the
  * r17 marker-retirement fixes had to be hand-mirrored).
  */
private[streaming] object StoreProtocol {

  /** Delete any superseded generations a crashed compaction left
    * behind (marker present, listed dirs still on disk), then retire
    * the marker. Guards:
    *  - a listed dir must be STRICTLY older than its marker to be
    *    deleted. Superseded dirs always predate the marker that lists
    *    them, so the normal crash-recovery path is unaffected; a dir
    *    whose mtime ties or exceeds the marker's may be a LIVE
    *    re-seeded generation (same-tick creation on a coarse-mtime
    *    filesystem, or a clock step) and survives — leftover stale
    *    data is harmless in both stores (the dedup verdict aggregates
    *    are duplicate-tolerant; the ann fold dedups vec_ids and its
    *    readers pin the newest seed) and a LATER compaction folds and
    *    re-lists it under a fresh, younger marker, which then deletes
    *    it;
    *  - a marker is retired once nothing it lists survives as a
    *    strictly-older target, keeping cleanup O(pending). Id
    *    monotonicity comes from live seed-dir suffixes
    *    ([[nextCompactId]]), not the markers.
    */
  def finishPendingCleanup(root: String): Unit = {
    val commits = new java.io.File(root, "commits")
    Option(commits.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("compact-"))
      .foreach { m =>
        val markerMtime = m.lastModified()
        def staleTarget(p: String): Option[Path] = {
          val d = Paths.get(p)
          if (Files.exists(d) &&
              Files.getLastModifiedTime(d).toMillis < markerMtime)
            Some(d)
          else None
        }
        val listed = new String(Files.readAllBytes(m.toPath), "UTF-8")
          .linesIterator.filter(_.nonEmpty).toSeq
        listed.flatMap(staleTarget).foreach(deleteRecursively)
        if (!listed.exists(p => staleTarget(p).isDefined))
          Files.delete(m.toPath)
      }
  }

  /** The next compaction id: past BOTH every pending marker id and
    * every live `b=seed<N>` generation suffix, so a crash between the
    * directory moves and the marker write (a moved-but-unmarked
    * generation) never wedges future compactions on an id collision —
    * the orphan folds in under a fresh id.
    */
  def nextCompactId(root: String, genDirNames: Seq[String]): Int = {
    val seedIds = genDirNames.filter(_.startsWith("b=seed"))
      .flatMap(d => scala.util.Try(d.stripPrefix("b=seed").toInt).toOption)
    1 + (pendingCompactIds(root) ++ seedIds).foldLeft(-1)(math.max)
  }

  def pendingCompactIds(root: String): Seq[Int] = {
    val commits = new java.io.File(root, "commits")
    Option(commits.listFiles).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.startsWith("compact-"))
      .flatMap(n => scala.util.Try(n.stripPrefix("compact-").toInt).toOption)
  }

  /** Write the superseded-dirs marker, delete the dirs, retire the
    * marker (a crash at any point is recovered by
    * [[finishPendingCleanup]] at the next compaction's entry).
    */
  def supersede(root: String, n: Int, superseded: Seq[String]): Unit = {
    val marker = Paths.get(root, "commits", s"compact-$n")
    Files.createDirectories(marker.getParent)
    Files.write(marker, superseded.mkString("\n").getBytes("UTF-8"))
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
