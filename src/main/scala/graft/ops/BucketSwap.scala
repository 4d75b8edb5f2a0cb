package graft.ops

/** Crash-safe per-bucket directory swap for partitioned parquet
  * artifacts maintained in place — the device behind the LSH-index
  * compaction, the cluster map and the kNN graph: rewrite only touched
  * `part=N` dirs into a sibling `.merge` tree, then per bucket move the
  * live dir ASIDE (outside the artifact path, so partition discovery
  * never sees it), move the rewrite in, and delete the aside LAST. A
  * crash at any step leaves either the old or the new bucket intact on
  * disk (never neither); [[recover]] heals on the next entry, and the
  * caller's unadvanced frontier makes the interrupted batch replay.
  */
private[graft] object BucketSwap {

  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** Recursive copy (prefix artifacts are copied per maintenance
    * exercise — maintenance mutates them). */
  def copyTree(src: String, dst: String): Unit = {
    val s0 = java.nio.file.Paths.get(src)
    val d0 = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s0).forEach { q =>
      val t = d0.resolve(s0.relativize(q))
      if (java.nio.file.Files.isDirectory(q)) java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(q, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
    ()
  }

  /** Hardlink tree: the near-free way to give a maintenance exercise its
    * own mutable view of a prefix artifact (round-12 directive: the
    * copyTree in the timed body dominated the maintenance boards at
    * fixture scale). SAFE because maintenance never writes a data file
    * in place — parquet writes create new files, [[swap]] moves/deletes
    * directory ENTRIES, and [[writeFrontier]] goes through a fresh
    * `.tmp` + ATOMIC_MOVE — so unlinking or replacing a link never
    * touches the prefix's inodes. Falls back to a byte copy per file if
    * the filesystem refuses the link (cross-device, no-hardlink fs). */
  def linkTree(src: String, dst: String): Unit = {
    val s0 = java.nio.file.Paths.get(src)
    val d0 = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s0).forEach { q =>
      val t = d0.resolve(s0.relativize(q))
      if (java.nio.file.Files.isDirectory(q)) java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        try java.nio.file.Files.createLink(t, q)
        catch {
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            java.nio.file.Files.copy(q, t,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        ()
      }
    }
    ()
  }

  /** Heal an artifact left by a swap interrupted mid-flight:
    *  - live bucket MISSING, aside present → restore the aside copy
    *    (pre-merge data, still complete; the batch replays);
    *  - live present AND aside present → the swap committed, drop the
    *    aside;
    *  - a stale `.merge` rewrite tree → dead, drop it.
    * Returns restored bucket ids. No-crash cost: two existence checks.
    */
  def recover(path: String, partCol: String): Seq[Int] = {
    val aside = new java.io.File(s"$path.merge.aside")
    val restored = scala.collection.mutable.ListBuffer[Int]()
    if (aside.exists()) {
      Option(aside.listFiles()).getOrElse(Array.empty).toSeq
        .filter(d => d.isDirectory && d.getName.startsWith(s"$partCol=")).foreach { d =>
          val live = new java.io.File(s"$path/${d.getName}")
          if (!live.exists()) {
            java.nio.file.Files.move(d.toPath, live.toPath)
            restored += d.getName.stripPrefix(s"$partCol=").toInt
          }
        }
      rmTree(aside)
    }
    rmTree(new java.io.File(s"$path.merge"))
    restored.toSeq.sorted
  }

  /** Swap `buckets` of the `.merge` rewrite tree into the live artifact
    * (see class doc for the crash-ordering argument). A bucket with no
    * rewrite dir is DRAINED: its live dir is removed. */
  def swap(path: String, partCol: String, buckets: Seq[Int]): Unit = {
    val tmp = s"$path.merge"
    buckets.foreach { b =>
      val dst = java.nio.file.Paths.get(s"$path/$partCol=$b")
      val asideB = java.nio.file.Paths.get(s"$tmp.aside/$partCol=$b")
      java.nio.file.Files.createDirectories(asideB.getParent)
      if (java.nio.file.Files.exists(dst)) java.nio.file.Files.move(dst, asideB)
      val src = java.nio.file.Paths.get(s"$tmp/$partCol=$b")
      if (java.nio.file.Files.exists(src)) java.nio.file.Files.move(src, dst)
    }
    rmTree(new java.io.File(s"$tmp.aside"))
    rmTree(new java.io.File(tmp))
  }

  /** Read `$path/$name` as "batchId,maxId", or the given defaults. */
  def readFrontier(path: String, name: String): (Long, Long) = {
    val f = java.nio.file.Paths.get(s"$path/$name")
    if (java.nio.file.Files.exists(f)) {
      val parts = java.nio.file.Files.readString(f).trim.split(",")
      (parts(0).toLong, if (parts.length > 1) parts(1).toLong else Long.MinValue)
    } else (-1L, Long.MinValue)
  }

  /** Advance `$path/$name` to "batchId,maxId" via tmp + ATOMIC_MOVE
    * (the watermark-persist device; underscore-prefixed names are
    * invisible to parquet file listing). */
  def writeFrontier(path: String, name: String, batchId: Long, maxId: Long): Unit = {
    val tmpF = java.nio.file.Paths.get(s"$path/$name.tmp")
    java.nio.file.Files.writeString(tmpF, s"$batchId,$maxId")
    java.nio.file.Files.move(tmpF, java.nio.file.Paths.get(s"$path/$name"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}
