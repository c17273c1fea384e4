package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Named storage connections — the reference's worker connection registry
  * (config/worker.rs:100-180: `ConnectionType::{S3, Fs}` with endpoint /
  * keys / bucket / root / region / path-style), re-expressed the Spark
  * way: an S3 connection becomes per-bucket Hadoop `fs.s3a.*` settings on
  * the session (so EVERY executor picks them up through the broadcast
  * Hadoop conf — no per-node config files), and `read_files(glob,
  * connection=>'name')` resolves through [[resolve]] to a fully-qualified
  * URI that Spark's FileIndex lists and reads with its usual pushdown.
  */
object Connections {

  sealed trait ConnectionType
  /** S3-compatible endpoint (config/worker.rs:115-131). */
  final case class S3(endpoint: String, accessKeyId: String,
                      secretAccessKey: String, bucket: String, root: String,
                      region: String, forcePathStyle: Boolean)
    extends ConnectionType
  /** Local/posix root (config/worker.rs:132-136). */
  final case class Fs(root: String) extends ConnectionType

  final class InvalidConnection(msg: String) extends Exception(msg)

  // Registry is keyed per session (a long-lived server may host several).
  private val registry =
    new ConcurrentHashMap[(String, String), ConnectionType]()

  // fs.s3a.bucket.* settings live on the CONTEXT-global Hadoop conf (one
  // per JVM), so two registrations for the same bucket with different
  // settings would silently clobber each other — track what each bucket
  // was configured with and reject conflicting re-registration loudly.
  private val bucketConf = new ConcurrentHashMap[String, S3]()

  // Register/rotate are control-plane operations (a handful per session
  // lifetime), so a single JVM-wide lock over the check-then-act on
  // bucketConf + the Hadoop conf + the registry is the right cost: it
  // closes the window where a concurrent register with pre-rotation
  // credentials could interleave with rotate and rewrite the fs.s3a.*
  // settings back to the revoked keys. Reads (get/resolve) stay lock-free
  // on the concurrent maps.
  private val mutationLock = new Object

  private def key(spark: SparkSession, name: String) =
    (System.identityHashCode(spark).toString, name)

  /** Validate (name non-empty ascii, like worker.rs:101-112) and register;
    * S3 settings are applied to the session's Hadoop conf per-bucket.
    */
  def register(spark: SparkSession, name: String,
               conn: ConnectionType): Unit = mutationLock.synchronized {
    if (name.isEmpty || !name.forall(c => c < 128))
      throw new InvalidConnection(s"name - '$name'")
    conn match {
      case s3 @ S3(endpoint, accessKey, secretKey, bucket, root, region,
          pathStyle) =>
        if (endpoint.isEmpty || bucket.isEmpty)
          throw new InvalidConnection(s"s3 connection '$name' needs endpoint+bucket")
        if (root.startsWith("/"))
          throw new InvalidConnection(s"s3 root must be relative: '$root'")
        // differing root is fine (a URI concern, not a Hadoop-conf one)
        val prior = bucketConf.putIfAbsent(bucket, s3)
        if (prior != null && prior.copy(root = "") != s3.copy(root = ""))
          throw new InvalidConnection(
            s"bucket '$bucket' already configured with different " +
              "endpoint/credentials — per-bucket fs.s3a.* settings are " +
              "JVM-global, refusing to clobber")
        val hc = spark.sparkContext.hadoopConfiguration
        val p = s"fs.s3a.bucket.$bucket"
        hc.set(s"$p.endpoint", endpoint)
        hc.set(s"$p.access.key", accessKey)
        hc.set(s"$p.secret.key", secretKey)
        if (region.nonEmpty) hc.set(s"$p.endpoint.region", region)
        hc.set(s"$p.path.style.access", pathStyle.toString)
      case Fs(root) =>
        if (root.isEmpty)
          throw new InvalidConnection(s"fs connection '$name' needs a root")
    }
    registry.put(key(spark, name), conn)
    ()
  }

  def get(spark: SparkSession, name: String): Option[ConnectionType] =
    Option(registry.get(key(spark, name)))

  /** Remove a named connection. The per-bucket conflict guard is
    * deliberately NOT released: other names/sessions may still depend on
    * the bucket's JVM-global fs.s3a.* settings, so different-credential
    * re-registration of a once-configured bucket stays rejected for the
    * JVM's lifetime (conservative by design — [[rotate]] is the explicit
    * path for changing a bucket's credentials).
    */
  def unregister(spark: SparkSession, name: String): Unit = {
    registry.remove(key(spark, name))
    ()
  }

  /** Explicit mid-session credential rotation for an S3 connection.
    *
    * [[register]] refuses conflicting re-registration of a configured
    * bucket because silent clobbering is how one tenant's credentials
    * leak into another's reads; rotation is the sanctioned exception —
    * same name, same bucket, NEW credentials/endpoint, applied loudly:
    *  1. the per-bucket fs.s3a.* settings are overwritten on the Hadoop
    *     conf (new tasks pick them up through the broadcast conf), and
    *  2. the JVM's cached FileSystem client for `s3a://bucket/` is
    *     closed and evicted, so the NEXT access builds a client with the
    *     rotated credentials instead of reusing a connection pool
    *     authenticated with the old ones. Without the eviction the
    *     rotation would only apply after an unrelated cache flush —
    *     exactly the silent-staleness this method exists to remove.
    * The name must already be registered as S3 on the same bucket; a
    * bucket change is a different connection, not a rotation.
    *
    * Because the fs.s3a.* settings are per-BUCKET while names are
    * per-session aliases, every OTHER registry entry on the same bucket
    * (register allows aliases whose credentials matched) is re-pointed at
    * the rotated credentials too — each keeps its own `root`. Without
    * this, `get` on a sibling alias would keep returning the revoked
    * keys even though the Hadoop conf (what reads actually use) already
    * rotated. The whole method holds the register/rotate lock so a
    * concurrent register with the old credentials can neither interleave
    * mid-rotation nor win afterward (its putIfAbsent-equality check runs
    * against the rotated bucketConf entry and is rejected).
    */
  def rotate(spark: SparkSession, name: String, conn: S3): Unit =
      mutationLock.synchronized {
    // same validity bar as register — a rotation must not be the one
    // path that writes a malformed connection into the conf
    if (conn.endpoint.isEmpty || conn.bucket.isEmpty)
      throw new InvalidConnection(s"rotate '$name' needs endpoint+bucket")
    if (conn.root.startsWith("/"))
      throw new InvalidConnection(s"s3 root must be relative: '${conn.root}'")
    get(spark, name) match {
      case Some(prior: S3) if prior.bucket == conn.bucket => ()
      case Some(_: S3) => throw new InvalidConnection(
        s"rotate '$name': bucket change is not a rotation — unregister " +
          "and register a new connection")
      case Some(_) | None => throw new InvalidConnection(
        s"rotate '$name': no existing s3 connection under this name")
    }
    val hc = spark.sparkContext.hadoopConfiguration
    val p = s"fs.s3a.bucket.${conn.bucket}"
    hc.set(s"$p.endpoint", conn.endpoint)
    hc.set(s"$p.access.key", conn.accessKeyId)
    hc.set(s"$p.secret.key", conn.secretAccessKey)
    // a region-less rotation must CLEAR a previously set region — a
    // stale one signs requests against the wrong region, silently
    if (conn.region.nonEmpty) hc.set(s"$p.endpoint.region", conn.region)
    else hc.unset(s"$p.endpoint.region")
    hc.set(s"$p.path.style.access", conn.forcePathStyle.toString)
    bucketConf.put(conn.bucket, conn)
    registry.put(key(spark, name), conn)
    // Re-point sibling aliases on the same bucket (any session — the
    // Hadoop conf they read through is JVM-global) at the rotated
    // credentials, preserving each alias's own root prefix.
    registry.replaceAll { (_, existing) =>
      existing match {
        case s3: S3 if s3.bucket == conn.bucket =>
          conn.copy(root = s3.root)
        case other => other
      }
    }
    // Evict the cached client. FileSystem.get returns the cached
    // instance when one exists; close() removes it from the JVM cache.
    // Only an UNLOADABLE s3a implementation (no hadoop-aws on the
    // classpath) is tolerated silently-ish — the conf rotation above is
    // still complete and a client can't have been cached for a scheme
    // that can't load. Any OTHER failure means a pooled client may still
    // hold the old credentials, so it is logged, loudly.
    // Hadoop wraps the no-impl signal variously (bare, in RuntimeException,
    // in IOException text) across versions — walk the cause chain.
    def isNoImpl(t: Throwable): Boolean = t != null && (t match {
      case _: ClassNotFoundException | _: NoClassDefFoundError |
           _: java.util.ServiceConfigurationError |
           _: org.apache.hadoop.fs.UnsupportedFileSystemException => true
      case e: java.io.IOException
          if Option(e.getMessage).exists(_.contains(
            "No FileSystem for scheme")) => true
      case _ => isNoImpl(t.getCause)
    })
    try org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(s"s3a://${conn.bucket}/"), hc).close()
    catch {
      case e: Throwable if isNoImpl(e) => ()
      case e: Throwable =>
        System.err.println(s"[connections] rotate '$name': FileSystem " +
          s"cache eviction failed (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}) — a pooled s3a client may still hold the " +
          "pre-rotation credentials until the cache is flushed")
    }
  }

  /** Resolve a `read_files` glob through a named connection to the URI
    * Spark reads. Unregistered name "s3" keeps the bare-scheme fallback
    * (glob already carries bucket/key); any other unknown name is an
    * error, mirroring the reference's unknown-connection failure.
    */
  def resolve(spark: SparkSession, name: String, glob: String): String =
    get(spark, name) match {
      case Some(S3(_, _, _, bucket, root, _, _)) =>
        val prefix = if (root.isEmpty) "" else s"${root.stripSuffix("/")}/"
        s"s3a://$bucket/$prefix${glob.stripPrefix("/")}"
      case Some(Fs(root)) =>
        s"${root.stripSuffix("/")}/${glob.stripPrefix("/")}"
      case None if name == "s3" => s"s3a://$glob"
      case None =>
        throw new InvalidConnection(s"unknown connection '$name'")
    }
}
