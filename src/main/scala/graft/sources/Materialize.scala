package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates.
  *
  * A pipeline's expensive shared subtrees (the near-dup pair list, a
  * shingle index, a feature table) are consumed by several downstream
  * queries. Recomputing the subtree per consumer multiplies its cost by
  * fan-out; Spark's exchange reuse only dedups WITHIN one action, and
  * cached/checkpointed blocks pin executor memory for the session
  * lifetime. The storage-backed pattern — compute once, write to a
  * table, every consumer scans the table — is how a production pipeline
  * ships this at 100 TB (the intermediate is a vanishing fraction of
  * the corpus; the scan is cheap and partition-prunable).
  *
  * `table` is that pattern scoped to one JVM: the first caller builds
  * and writes parquet under a process-private temp dir, every later
  * caller (same Spark application + key) gets a plain parquet scan.
  * Results are bit-identical to the direct computation — asserted in
  * graft.MaterializeSpec. `SPARK_GRAFT_NO_MEMO=1` disables the memo for
  * A/B measurement of the underlying build.
  */
object Materialize {
  private lazy val root = {
    val dir = Files.createTempDirectory("graft-materialized-")
    // the intermediates are process-private scratch — reclaim them when
    // the JVM exits instead of accreting across Bench/Verify/test runs
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
  private val done = new ConcurrentHashMap[String, String]()

  private def enabled = !sys.env.contains("SPARK_GRAFT_NO_MEMO")

  def table(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    if (!enabled) return build
    // Key by application: temp-dir contents outlive a stopped session,
    // but a new application must not trust another's files (different
    // conf, different data dir lifetimes are encoded in the key).
    val full = s.sparkContext.applicationId + "/" + key
    // NOT computeIfAbsent (r19): memo builds NEST — curateFateManifest
    // builds through curatePairs, coPurchaseInfluence through coPurchase —
    // and a nested computeIfAbsent on one ConcurrentHashMap throws
    // IllegalStateException("Recursive update") whenever the two keys
    // land in the same hash bin. The keys embed the per-run applicationId,
    // so the collision was a per-run lottery: the inherited
    // CORRECTNESS_LOCAL.json carried exactly this failure on
    // q_train_ready_epochs. Double-checked build under the object
    // monitor instead — reentrant, so nested builds on one thread are
    // fine; builds are one-time per key, so serializing them is
    // irrelevant next to the build cost; the path is a pure function of
    // the key, so publishing after the parquet write keeps every reader
    // on a fully-written table.
    if (!done.containsKey(full)) this.synchronized {
      if (!done.containsKey(full)) {
        val p = root + "/" +
          java.util.UUID.nameUUIDFromBytes(full.getBytes("UTF-8")).toString
        build.write.mode("overwrite").parquet(p)
        done.put(full, p)
        ()
      }
    }
    s.read.parquet(done.get(full))
  }
}
