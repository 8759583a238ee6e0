package graft.queries

/** SF-selection for pinned-VALUES oracles (r13).
  *
  * A pinned oracle freezes a bit-deterministic Spark output (KMeans
  * assignments, ANN picks, trained-model probs, sketch rows) as a
  * DuckDB VALUES table — data-dependent, so each pin is valid at
  * exactly one scale factor. Verify stamps the dump's SF dir into the
  * `graft.pin.sf` system property BEFORE any query object
  * initializes, and the pinned oracle builders route through [[at]]
  * to emit the matching pin set; tools/check.py's HASH_SF_SCOPED
  * lists, per query, the SFs a pin exists for and falls back to
  * rows-only elsewhere. The default (no property — the driver's
  * correctness run, tests) is the sf0.01 pin, the driver's SF.
  *
  * ONE-SF-PER-JVM CONTRACT (r14, per ADVICE r13): the property is
  * consumed during query-object static initialization, so a second
  * Verify at a different SF in the same JVM (sbt interactive with
  * fork disabled) silently keeps the first run's pins. Verify is
  * always forked one-shot by the driver and tools/check.py; if you
  * dump two SFs by hand, use two JVMs.
  */
object Pins {
  /** The pin-tier tag. Only the trailing `sfX` segment is ever
    * inspected (suffix match below), so the default is the bare
    * driver-SF tag, not a filesystem path.
    */
  def dir: String = System.getProperty("graft.pin.sf", "sf0.01")

  /** True when the current dump targets the sf0.1 tier. (Suffix
    * matching is unambiguous: "sf0.01" does not end in "sf0.1".)
    */
  def isSf01: Boolean = dir.stripSuffix("/").endsWith("sf0.1")

  /** True when the current dump targets the sf0.001 tier. */
  def isSf0001: Boolean = dir.stripSuffix("/").endsWith("sf0.001")

  /** True when the current dump targets the generated sf1 tier
    * (suffix "sf1" cannot collide: "sf0.1" ends in "0.1").
    */
  def isSf1: Boolean = dir.stripSuffix("/").endsWith("sf1")

  /** Select a pin payload: `sf001` is the driver-SF (sf0.01) default,
    * `sf01` the sf0.1 twin. By-name so unused literals cost nothing.
    */
  def at[T](sf001: => T, sf01: => T): T = if (isSf01) sf01 else sf001

  /** Three-tier variant: adds the sf0.001 twin. */
  def at[T](sf001: => T, sf01: => T, sf0001: => T): T =
    if (isSf01) sf01 else if (isSf0001) sf0001 else sf001

  /** Four-tier variant (r14): adds the generated-sf1 twin. */
  def at[T](sf001: => T, sf01: => T, sf0001: => T, sf1: => T): T =
    if (isSf1) sf1
    else if (isSf01) sf01
    else if (isSf0001) sf0001
    else sf001

  /** sf1 pin tier (r14): at the generated 10× tier the pinned oracle
    * is a COMPLETE generated SELECT-over-VALUES replay of the
    * 8-vs-32-thread-proven dump (tools/pingen_sf1.py), swapped in
    * front of the driver-SF builders — the recompute-style oracles
    * (ANN cosine re-derivation etc.) stay at the three driver SFs
    * where they carry the cross-engine correctness argument; the sf1
    * pin carries the reproducibility + regression argument.
    */
  def sf1Or(name: String, other: => String): String =
    if (isSf1) resource(s"oracle_sf1_$name.txt") else other

  /** Parse pinned `(query, cand, rank)` ANN pick tuples from a
    * resource of `(q,c,r)` terms (tools/pingen_sf1.py --picks).
    */
  def picksResource(name: String): Seq[(Int, Int, Int)] = {
    val Tup = """\((\d+),(\d+),(\d+)\)""".r
    Tup.findAllMatchIn(resource(name)).map(m =>
      (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)).toSeq
  }

  /** Load a pinned-VALUES payload from a classpath resource under
    * `graft/pins/` (r14: the multi-thousand-row pins that used to
    * live as main-source string literals — oracle test DATA, not
    * engine logic — moved out so the compile unit stays small).
    *
    * The files store one VALUES tuple per line; the join with " "
    * reproduces the previous in-source value byte-for-byte: both
    * pingen shapes (`\"\"\"…\"\"\".stripMargin.replace("\n"," ")` and
    * `Seq(chunks…).mkString(" ").replace("\n"," ")`) reduce to
    * margin-stripped lines joined by a single space. Verified by
    * tools/DumpOracles before/after diffs at every pin SF.
    */
  def resource(name: String): String = load(name, " ")

  /** Newline-preserving variant for payloads that were plain
    * `\"\"\"…\"\"\".stripMargin` (interpolated into other margin blocks,
    * where the line structure is part of the value).
    */
  def resourceLines(name: String): String = load(name, "\n")

  private def load(name: String, sep: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/pins/$name")
    require(in != null, s"missing pin resource graft/pins/$name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().mkString(sep)
    finally src.close()
  }
}
