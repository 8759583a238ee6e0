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
  */
object Pins {
  def dir: String =
    System.getProperty("graft.pin.sf", "/root/testdata/sf0.01")

  /** True when the current dump targets the sf0.1 tier. (Suffix
    * matching is unambiguous: "sf0.01" does not end in "sf0.1".)
    */
  def isSf01: Boolean = dir.stripSuffix("/").endsWith("sf0.1")

  /** True when the current dump targets the sf0.001 tier. */
  def isSf0001: Boolean = dir.stripSuffix("/").endsWith("sf0.001")

  /** Select a pin payload: `sf001` is the driver-SF (sf0.01) default,
    * `sf01` the sf0.1 twin. By-name so unused literals cost nothing.
    */
  def at[T](sf001: => T, sf01: => T): T = if (isSf01) sf01 else sf001

  /** Three-tier variant: adds the sf0.001 twin. */
  def at[T](sf001: => T, sf01: => T, sf0001: => T): T =
    if (isSf01) sf01 else if (isSf0001) sf0001 else sf001
}
