package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted intermediates the DuckDB oracle can read.
  *
  * The LSH dedups' signature stages use engine hashes (xxhash64) DuckDB
  * cannot reproduce, which made their queries rows-only at the gate. But
  * their VERIFICATION stages — banding, signature agreement, Hamming
  * distance — are pure functions of the Spark-computed columns. This
  * helper writes those columns to parquet once per JVM and both engines
  * then run the verification over the SAME file: Spark reads it back for
  * the `q_*_verify` queries, and their `oracleSql` re-derives the
  * banding/agreement/Hamming logic in DuckDB from the identical bytes.
  *
  * The path is ABSOLUTE and scale-factor-suffixed because `oracleSql` is
  * a static string: the driver's gate always runs at sf0.01, so the SQL
  * hardcodes that directory; a Verify/Bench run at another SF writes its
  * own suffix and never clobbers the gate's input. Unlike
  * [[Materialize]] (process-private scratch), these files intentionally
  * OUTLIVE the Spark JVM — the gate's DuckDB pass runs after it exits.
  */
object OracleAux {

  /** Root for emitted tables — inside the repo's build dir (gitignored). */
  val Root = "/root/repo/target/oracle_aux"

  /** Every aux name a [[gateGlob]] call has minted this JVM — the
    * registry [[rewriteForSf]]'s invariant check runs against.
    * `SparkEntry.oracleSql` is built (all gateGlob calls evaluated)
    * before Verify rewrites any SQL, so the registry is complete by
    * check time. */
  private val mintedNames = ConcurrentHashMap.newKeySet[String]()

  /** The glob `oracleSql` should embed for table `name` at the gate SF. */
  def gateGlob(name: String): String = {
    mintedNames.add(name)
    s"$Root/sf0.01/$name/*.parquet"
  }

  /** Re-target the gate-SF aux globs in an oracle SQL string at the SF
    * actually being dumped. `oracleSql` is a static `Map[String,String]`
    * (the driver contract), so its embedded globs necessarily name ONE
    * directory — the gate's `sf0.01`. [[graft.Verify]] pushes every SQL
    * through this before writing `oracle_sql.json`, so the dumped SQL
    * always reads the aux tables the SAME Verify run just wrote next to
    * it: a DuckDB check at ANY scale factor is self-consistent with the
    * dump beside it, no manual glob substitution (VERDICT r13 #1a). A
    * textual replace is exact because [[gateGlob]] is the only producer
    * of the `sf0.01` path fragment in any oracle SQL — an invariant this
    * method now ENFORCES (ADVICE r14) rather than assumes: every
    * occurrence of the fragment must be the prefix of a glob gateGlob
    * minted this JVM, else the rewrite refuses loudly instead of
    * silently mangling an oracle that embedded the literal for another
    * purpose. */
  def rewriteForSf(sql: String, sfDir: String): String = {
    val frag = s"$Root/sf0.01/"
    var i = sql.indexOf(frag)
    while (i >= 0) {
      val rest = sql.substring(i + frag.length)
      val matched = mintedNames.stream()
        .anyMatch(n => rest.startsWith(n + "/*.parquet"))
      require(matched,
        s"oracle SQL embeds the gate aux fragment '$frag' not followed " +
          s"by a gateGlob-minted '<name>/*.parquet' (at index $i); " +
          "rewriteForSf only rewrites gateGlob output — use " +
          "OracleAux.gateGlob for aux paths")
      i = sql.indexOf(frag, i + frag.length)
    }
    val sf = new java.io.File(sfDir).getName
    if (sf == "sf0.01") sql
    else sql.replace(frag, s"$Root/$sf/")
  }

  private val written = new ConcurrentHashMap[String, String]()

  /** Write `build` to `<Root>/<sf-basename>/<name>` (once per JVM and
    * application) and return a read-back frame of the written bytes.
    *
    * NOT computeIfAbsent (r19): aux builds NEST — pq_adc_codes builds
    * through the shared pq_adc_codebook aux — and a nested
    * computeIfAbsent on one ConcurrentHashMap throws
    * IllegalStateException("Recursive update") whenever the keys land in
    * the same hash bin (the keys embed the per-run applicationId, so the
    * collision is a per-run lottery — the Materialize twin of this bug
    * was caught in the inherited CORRECTNESS_LOCAL.json). Double-checked
    * build under the object monitor: reentrant for nested builds,
    * one-time per key. */
  def table(s: SparkSession, sfDir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val sf = new java.io.File(sfDir).getName
    val key = s.sparkContext.applicationId + "/" + sf + "/" + name
    if (!written.containsKey(key)) this.synchronized {
      if (!written.containsKey(key)) {
        val p = s"$Root/$sf/$name"
        build.write.mode("overwrite").parquet(p)
        written.put(key, p)
        ()
      }
    }
    s.read.parquet(written.get(key))
  }
}
