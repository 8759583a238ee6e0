package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.lakehouse.Silver
import graft.operators.{Clustering, Similarity}

/** Vector similarity + clustering query family (SURVEY.md §2 E5/E6,
  * C8-C10). `ann_topk` is oracle-gated (its ordered-fold dot product
  * is bit-portable); the IVF/index/PQ entries carry pinned-picks hash
  * oracles at the driver SF (pinnedAnnOracle — the quantizer fits are
  * bit-reproducible since r11) with recall/parity additionally
  * spec-gated; the K-Means entries pin full VALUES oracles.
  */
object VectorQueries {

  private def fact(s: org.apache.spark.sql.SparkSession, dir: String) =
    Silver.factEventsCached(s, dir)

  val queries: Map[String, Q] = Map(

    // E5 — brute-force cosine top-10 for queries vec_id < 8.
    "ann_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 10)
    },

    // E6 — IVF-bucketed ANN, same queries. Hash-gated at the driver SF
    // against a pinned-picks oracle (see pinnedAnnOracle — the
    // quantizer fit is bit-reproducible); recall vs brute force is
    // additionally asserted in SimilaritySpec. nprobe=8 of nlist=16:
    // top-k retrieval needs wider probing than the near-dup mode
    // (recall@10 0.775 vs pinned brute force under the r11 canonical
    // quantizer — the 500-vector uniform-random corpus is the IVF
    // worst case: cells are sparse arbitrary Voronoi regions; at
    // corpus scale the same probe fraction recalls strictly better).
    "ann_ivf_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 10, nprobe = 8, corpusTag = dir)
    },

    // E6b ∘ E14 — IVF-PQ with exact refine, served from the PERSISTED
    // codes lake (r11): first run trains + commits codebooks (CAS) and
    // the cell-partitioned codes table; later runs probe the
    // partition-pruned scan. Hash-gated at the driver SF against the
    // SAME pinnedAnnOracle as the in-memory form — the gate IS the
    // lake-parity contract (codes and norms round-trip parquet
    // exactly). Recall + the refine contract stay spec-gated in
    // SimilaritySpec/VectorIndexSpec. The candidate scan reads m=8
    // code ints + a norm instead of 64 floats; ADC scores cost m
    // table lookups; only the k*refine shortlist touches real vectors.
    "ann_pq_topk" -> { (s, dir) =>
      val root = "/root/repo/target/lake/pq_index_q2/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, dir)
      if (!graft.operators.VectorIndex.existsPq(root))
        graft.operators.VectorIndex.buildPq(emb, "vec_id", "embedding",
          root, nlist = 16, m = 8, ks = 16, seed = 42L)
      graft.operators.VectorIndex.topKPq(s,
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        root, k = 10, nprobe = 8, refine = 8)
    },

    // E6e — IVF binary (sign) quantization: one bit per dimension,
    // Hamming-angle shortlist (Charikar's cos(π·h/d) estimator),
    // exact refine — the 32× in-memory hot tier production vector
    // stores run, with ZERO trained artifacts (sign is
    // scale-invariant) beyond the shared coarse quantizer, so the
    // whole chain pins trivially. Recall/kernel contracts in
    // SimilaritySpec.
    "ann_bq_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.bqTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 10, nlist = 16, nprobe = 8,
        refine = 8, corpusTag = dir)
    },

    // E6d — IVF-SQ8 scalar quantization (FAISS
    // IndexIVFScalarQuantizer QT_8bit shape), SERVED FROM THE
    // PERSISTED INDEX like the PQ tiers: one affine uint8 code per
    // DIMENSION (BINARY — one byte/dim in the cell-partitioned codes
    // lake), decoded on the fly inside the dot kernel — the
    // near-exact 4×-compression rung between raw IVF and PQ. The
    // bounds fit is ONE exact order-independent min/max pass
    // (deterministic at any scale, no bounded feed needed), the
    // coarse quantizer is the shared canonical-feed fit, so the
    // whole chain pins; lake-served output is spec-proven bit-equal
    // to the in-memory Similarity.sqTopK. Recall/bound/kernel
    // contracts spec-gated in SimilaritySpec.
    "ann_sq_topk" -> { (s, dir) =>
      val root = "/root/repo/target/lake/sq_index_q1/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, dir)
      if (!graft.operators.VectorIndex.existsSq(root))
        graft.operators.VectorIndex.buildSq(emb, "vec_id", "embedding",
          root, nlist = 16, seed = 42L)
      graft.operators.VectorIndex.topKSq(s,
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        root, k = 10, nprobe = 8, refine = 8)
    },

    // E6c — OPQ-P rotation tier (parametric OPQ, Ge et al. 2013),
    // SERVED FROM THE PERSISTED INDEX like ann_pq/rpq_topk: ONE
    // learned orthogonal rotation — canonical-feed PCA eigenbasis
    // with eigenvalue-BALANCED subspace allocation — persists in the
    // CAS-committed params beside the codebooks; probes and appends
    // rotate map-side (the PCA projector kernel, zero mean) before
    // the residual coding, the shortlist runs in rotated space, and
    // the exact refine re-scores against the RAW vectors so reported
    // cosines match brute force bit-for-bit. Hash-gated at the
    // driver SF with the family's pinned-picks oracle (rotation,
    // quantizer, and codebooks are all canonical-feed deterministic;
    // lake-served output is spec-proven bit-equal to the in-memory
    // Similarity.opqTopK); the beats-residual claim is spec-gated on
    // a correlated corpus (SimilaritySpec — uniform corpora like
    // this one are the rotation's no-win case).
    "ann_opq_topk" -> { (s, dir) =>
      // q2: r13 rotation-allocation fix (ascending-LPT eigenvalue
      // balancing) — the persisted rotation changed, so the root
      // bumps and the picks re-pin
      val root = "/root/repo/target/lake/opq_index_q2/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, dir)
      if (!graft.operators.VectorIndex.existsPq(root))
        graft.operators.VectorIndex.buildPq(emb, "vec_id", "embedding",
          root, nlist = 16, m = 8, ks = 16, seed = 42L,
          residual = true, opq = true)
      graft.operators.VectorIndex.topKPq(s,
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        root, k = 10, nprobe = 8, refine = 8)
    },

    // E6b residual variant — FAISS-IVFPQ-shape residual coding,
    // SERVED FROM THE PERSISTED INDEX like ann_pq_topk: the codebooks
    // quantize unit(v) − centroid(cell) (unit-space residuals — the
    // coarse quantizer is spherical), the ADC table is per (query,
    // probed cell) with the centroid folded in so the ADC dot IS the
    // approximate cosine, the plan is otherwise identical. Hash-gated
    // at the driver SF against a pinned-picks oracle (the training
    // chain is the same canonical bounded feed), so the gate doubles
    // as the residual lake-parity contract; the residual-beats-raw
    // claim is spec-gated on a clustered corpus (SimilaritySpec —
    // uniform corpora like this one are the variant's no-win case,
    // clustered real embeddings are where it pays).
    "ann_rpq_topk" -> { (s, dir) =>
      val root = "/root/repo/target/lake/rpq_index_q1/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, dir)
      if (!graft.operators.VectorIndex.existsPq(root))
        graft.operators.VectorIndex.buildPq(emb, "vec_id", "embedding",
          root, nlist = 16, m = 8, ks = 16, seed = 42L,
          residual = true)
      graft.operators.VectorIndex.topKPq(s,
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        root, k = 10, nprobe = 8, refine = 8)
    },

    // E2-family — embedding-cosine near-dup over the whole corpus via
    // IVF-cell bucketing. Hash-gated at the driver SF (r12): the pair
    // ID set pins as VALUES (bit-stable fresh-JVM builds, proven) and
    // DuckDB recomputes the cosines via the ordered fold; recall vs
    // brute force stays in SimilaritySpec and check.py's tolerance
    // sweep.
    // The synthetic embeddings carry no true near-dups (max pairwise
    // cosine ≈ 0.51), so the demo threshold mines the most-similar
    // pairs; production near-dedup runs the same operator at ~0.95.
    // nprobe=4: with the canonical bounded training feed (r11) the
    // quantizer's cells shifted; 3 probes recover 55/59 of the exact
    // pair set at sf0.01, 4 recover all 59 (measured; 5 and 6 add
    // nothing). The oracle is the exact all-pairs sweep, so the gate
    // enforces full recall.
    "dedup_embedding" -> { (s, dir) =>
      Similarity.cosineNearDup(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.4, nprobe = 4,
        corpusTag = dir)
    },

    // SemDeDup-style semantic dedup: IVF-scoped cosine pairs →
    // connected components → keep min id per group. Hash-gated [O] at
    // the driver SF: the SURVIVOR ID SET is integer-exact as long as
    // both engines agree on the pair set, which they do at sf0.01 —
    // nprobe=4 recall is 1.0 there (dedup_embedding's contract) and
    // the closest cosine sits 1.3e-4 from the 0.4 threshold, four
    // orders above cross-engine float error. At sf0.1 the margin
    // thins to 1e-5, so check.py SF-scopes the gate (rows-only
    // elsewhere) rather than bet on libm ulps.
    "dedup_semantic" -> { (s, dir) =>
      // consumes the MATERIALIZED pair artifact (the dedup_components
      // pattern): selection never re-runs the cosine sweep — in
      // production the pair table is a lake artifact shared by every
      // downstream consumer
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticDedupFromPairs(emb, "vec_id",
          Similarity.cosineNearDupCached(emb, "vec_id", "embedding",
            threshold = 0.4, nprobe = 4, corpusTag = dir))
        .select(col("vec_id"))
    },

    // E14 — persisted IVF index probe. Hash-gated at the driver SF
    // (pinnedAnnOracle — fresh index builds are bit-reproducible);
    // VectorIndexSpec keeps the in-memory-parity and recall gates.
    // First run builds the
    // cell-partitioned index lake; later runs REUSE it (params CAS +
    // existing assignments) — the probe is the partition-pruned scan.
    "ann_index_topk" -> { (s, dir) =>
      // q3: the quantizer now trains on UNIT vectors (the ivfIndex
      // metric contract; q2 trained raw) — a stale q2 index must
      // rebuild, not serve the pinned oracle
      val root = "/root/repo/target/lake/vector_index_q3/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(s, dir)
      if (!graft.operators.VectorIndex.exists(root))
        graft.operators.VectorIndex.build(emb, "vec_id", "embedding",
          root, nlist = 8, seed = 42L)
      graft.operators.VectorIndex.topK(s,
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", root,
        k = 10, nprobe = 3)
    },

    // E13 — PCA projection of the embedding corpus to 16 dims. One
    // bounded-feed pass fits (a d(d+1)/2 Gram triangle), the
    // projection is a map-side codegen kernel. r11: the fit rides the
    // canonical bounded feed (Pca.fitCanonical — one sorted
    // partition, so ONE Gram partial and a fixed addition order),
    // which makes the model bit-reproducible across runs and CPU
    // counts — verified — and lets pc1 hash-gate against a
    // pinned-model DuckDB replay (ordered fold + FLOAT cast, the
    // mm_image_embed discipline); SF-scoped to the driver SF in
    // check.py (the pinned mean/axis literals are that fit's).
    // PcaSpec keeps axis recovery/orthonormality/kernel parity.
    "emb_pca_project" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val m = graft.operators.Pca.fitCanonical(emb, "vec_id",
        "embedding", k = 16)
      graft.operators.Pca.transform(emb, "embedding", m)
        .select(col("vec_id"),
          org.apache.spark.sql.functions.size(col("embedding"))
            .as("pca_dims"),
          element_at(col("embedding"), 1).as("pc1"))
    },

    // C8 — K-Means (k=3, seed=42) daily-pattern assignments.
    "gold_cluster_assignments" -> { (s, dir) =>
      Clustering.assignmentsCached(fact(s, dir), dir)
    },

    // C9 — per-cluster typical day.
    "gold_cluster_typical_day" -> { (s, dir) =>
      val f = fact(s, dir)
      Clustering.typicalDayByCluster(f, Clustering.assignmentsCached(f, dir))
    },

    // C10 — cluster sizes + modal day name.
    "gold_cluster_sizes" -> { (s, dir) =>
      Clustering.interpret(Clustering.assignmentsCached(fact(s, dir), dir))
    }
  )

  private val foldDot = (a: String, b: String) =>
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
       |   FOR i IN generate_series(1, len($a))]),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Fixed-expectation oracle for the approximate-ANN family, pinned
    * at the driver's correctness SF (the gold_cluster_assignments
    * pattern): the canonical bounded training feed makes every
    * quantizer fit bit-reproducible (Similarity.canonicalTrainFeed —
    * proven by two fresh-JVM runs agreeing byte-for-byte, including a
    * from-scratch persisted-index rebuild), so the (query, candidate,
    * rank) picks are pinned as VALUES while the cosine column is
    * RECOMPUTED by DuckDB from the parquet embeddings via the
    * bit-portable ordered fold — the gate is exact on every column
    * without betting on pinned-double round-trips. Valid ONLY at
    * sf0.01 (check.py HASH_SF_SCOPED; rows-only elsewhere).
    */
  /** Pinned (query, cand, rank) picks as a DuckDB oracle; DuckDB
    * recomputes the cosines via the ordered fold so every column
    * gates exactly. `picksSf01` (r13) is the sf0.1 twin of the same
    * bit-reproducible build — [[Pins.at]] selects by the dump's SF.
    */
  private def pinnedAnnOracle(picks: Seq[(Int, Int, Int)],
      picksSf01: Seq[(Int, Int, Int)] = Nil): String = {
    val chosen =
      if (picksSf01.nonEmpty) Pins.at(picks, picksSf01) else picks
    val vals = chosen.map { case (q, c, r) =>
      s"  ($q, $c, CAST($r AS INT))" }.mkString(",\n")
    s"""WITH picks(query_id, cand_id, rank) AS (VALUES
       |$vals),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv,
       |    sqrt(${foldDot("embedding", "embedding")}) AS qn
       |  FROM embeddings),
       |c AS (
       |  SELECT vec_id AS cand_id, embedding AS cv,
       |    sqrt(${foldDot("embedding", "embedding")}) AS cn
       |  FROM embeddings)
       |SELECT p.query_id, p.cand_id,
       |  ${foldDot("qv", "cv")} / (qn * cn) AS cosine, p.rank
       |FROM picks p JOIN q USING (query_id) JOIN c USING (cand_id)"""
      .stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_ivf_topk" -> pinnedAnnOracle(Seq(
      (0,365,1), (0,334,2), (0,387,3), (0,423,4), (0,73,5), (0,320,6),
      (0,190,7), (0,464,8), (0,388,9), (0,483,10), (1,386,1),
      (1,27,2), (1,407,3), (1,195,4), (1,64,5), (1,472,6), (1,203,7),
      (1,363,8), (1,312,9), (1,353,10), (2,117,1), (2,450,2),
      (2,320,3), (2,418,4), (2,471,5), (2,172,6), (2,197,7),
      (2,440,8), (2,109,9), (2,97,10), (3,130,1), (3,149,2),
      (3,343,3), (3,174,4), (3,231,5), (3,207,6), (3,192,7),
      (3,437,8), (3,474,9), (3,363,10), (4,114,1), (4,408,2),
      (4,482,3), (4,280,4), (4,249,5), (4,257,6), (4,89,7), (4,470,8),
      (4,384,9), (4,346,10), (5,404,1), (5,419,2), (5,157,3),
      (5,33,4), (5,359,5), (5,395,6), (5,464,7), (5,266,8), (5,225,9),
      (5,11,10), (6,430,1), (6,145,2), (6,437,3), (6,386,4),
      (6,268,5), (6,395,6), (6,214,7), (6,252,8), (6,371,9),
      (6,11,10), (7,340,1), (7,425,2), (7,209,3), (7,334,4),
      (7,381,5), (7,0,6), (7,332,7), (7,156,8), (7,442,9), (7,99,10)
    )),
    "ann_index_topk" -> pinnedAnnOracle(Seq(
      (0,334,1), (0,387,2), (0,7,3), (0,320,4), (0,190,5), (0,464,6),
      (0,388,7), (0,483,8), (0,323,9), (0,498,10), (1,386,1),
      (1,27,2), (1,407,3), (1,195,4), (1,64,5), (1,402,6), (1,472,7),
      (1,220,8), (1,203,9), (1,363,10), (2,117,1), (2,450,2),
      (2,145,3), (2,320,4), (2,418,5), (2,350,6), (2,197,7),
      (2,109,8), (2,198,9), (2,97,10), (3,130,1), (3,149,2),
      (3,343,3), (3,174,4), (3,231,5), (3,192,6), (3,437,7),
      (3,474,8), (3,363,9), (3,463,10), (4,114,1), (4,496,2),
      (4,408,3), (4,482,4), (4,280,5), (4,89,6), (4,470,7), (4,346,8),
      (4,288,9), (4,332,10), (5,419,1), (5,157,2), (5,33,3),
      (5,359,4), (5,395,5), (5,464,6), (5,487,7), (5,266,8),
      (5,453,9), (5,433,10), (6,350,1), (6,430,2), (6,145,3),
      (6,437,4), (6,268,5), (6,395,6), (6,252,7), (6,374,8),
      (6,371,9), (6,11,10), (7,340,1), (7,425,2), (7,334,3),
      (7,381,4), (7,445,5), (7,221,6), (7,302,7), (7,332,8),
      (7,442,9), (7,99,10)
    )),
    // E13 pinned-model replay: the canonical-feed PCA fit is
    // bit-reproducible (one Gram partial — see Pca.fitCanonical), so
    // the model's mean and first axis pin as literals and DuckDB
    // replays pc1 = fold_i (x_i − mean_i)·axis_i in the kernel's
    // i-ascending double accumulation, FLOAT-cast at the end (the
    // mm_image_embed discipline). SF-scoped to sf0.01 in check.py.
    "emb_pca_project" ->
      s"""WITH m(mean, ax) AS (SELECT
         |[0.0021647098540561274, -0.004547794351470656, 0.003930154383007902,
-0.004793201057444094, 0.009943076466443017, 0.007772532952541951,
-0.01823135569485021, 0.009217355088097975, -0.0024274034147092607,
-6.178791260463186E-4, 0.006436078068451025, 0.0033540127822197976,
-0.0026588912964216433, 0.0020540317017294003,
-2.1456623025005683E-4, 0.005910249243548606,
0.0033342206680827074, 0.005826121678226628,
-4.6127636556047945E-4, 0.0012317155191558413,
-0.0038391390424221752, 0.0023021840666187926,
0.004168265111627988, -0.008054586122045293,
-0.0018911654613621067, 0.012808142676018179,
-0.0015970649567898362, 0.01062632681982359,
-0.0011532765734009445, 3.903653704910539E-4,
0.0056047214816790075, -0.005792685562460974, 0.008335300238788477,
-0.0066753798398422074, 0.005155627750558779, 0.001177179405814968,
-0.0053353315424174074, -0.0015937965741213702,
-9.667016767925815E-4, -0.001140981935830496,
-0.0017442115085141267, -0.01183411476330366,
3.1351819908741164E-4, -5.631569666620635E-4,
-0.011520562025547406, 0.003832613509031944, -5.98060307384003E-4,
0.005890298187849112, -0.003749661162350094, -0.010264404615503736,
0.009377152467495762, -0.001481992187706055, 0.007770042697302415,
-0.003917563282562696, 0.00470978261413984, -0.003577291431953199,
0.004773866848874604, -0.0024703639050130733,
-0.004844514904165408, -0.00872118095526821, -2.811656921039685E-4,
0.005004184705336229, -0.0011590625974931754,
-0.013266222528531216],
         |[-0.2096393303658782, -0.120572731428751, 0.03654785325894207,
0.01181957938734597, 0.0756701162561686, 0.013214635864444468,
0.09058413427626621, 0.2866187756491006, 0.04954697972767778,
0.41405654299686345, 0.06530500475730752, 0.18207886842807455,
0.06513224638707366, -0.03653204103801003, 0.1711489623901352,
-0.1853497761294581, 0.08898990232836926, -0.15702647605351325,
-0.030136695172509782, 0.032178946179186305, 0.061213196437497945,
-0.1106883220283598, -0.0834751099006234, -0.05543751931232015,
0.019549964003127526, 0.19912536701560093, -0.03751725019614954,
0.14950770732679677, -0.1728796346906129, -0.006123148225127482,
-0.05871572784769839, 0.06203768144612755, 0.29653854350100967,
0.10616458906763815, -0.032041929761849476, 0.10414385454446931,
0.044538781323947334, 0.06146406272610149, 0.013006743241259831,
0.021771213196293836, -0.11667899871834032, 0.005524581440204672,
-0.2408369393335731, 0.09570755741811228, -0.028307680331664996,
-0.22512748623474915, 0.008731820438583634, -0.07903747599640608,
-0.08368081721210044, -0.1184509387357731, 0.1204594559586036,
0.07248323650296927, -0.01718647192563654, 0.0816043689752015,
-0.015031306788684091, -0.06676476085651618, -0.055650704928621224,
-0.05137607222716874, 0.06019603095736141, -0.09113916301050577,
0.12198695691605087, 0.05064983541094307, -0.2182114831542099,
-0.10201390073638703])
         |SELECT e.vec_id, CAST(16 AS INT) AS pca_dims,
         |  CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    [(CAST(e.embedding[i] AS DOUBLE) - m.mean[i]) * m.ax[i]
         |     FOR i IN generate_series(1, len(e.embedding))]),
         |    (acc, v) -> acc + v) AS FLOAT) AS pc1
         |FROM embeddings e CROSS JOIN m""".stripMargin,
    "ann_bq_topk" -> pinnedAnnOracle(Seq(
      (0,365,1), (0,334,2), (0,387,3), (0,423,4), (0,73,5), (0,320,6),
      (0,190,7), (0,464,8), (0,483,9), (0,323,10), (1,386,1),
      (1,27,2), (1,407,3), (1,195,4), (1,64,5), (1,472,6), (1,203,7),
      (1,363,8), (1,312,9), (1,353,10), (2,117,1), (2,450,2),
      (2,320,3), (2,471,4), (2,172,5), (2,197,6), (2,440,7),
      (2,109,8), (2,128,9), (2,202,10), (3,149,1), (3,343,2),
      (3,231,3), (3,207,4), (3,192,5), (3,437,6), (3,474,7),
      (3,363,8), (3,463,9), (3,134,10), (4,114,1), (4,408,2),
      (4,482,3), (4,280,4), (4,249,5), (4,257,6), (4,89,7), (4,470,8),
      (4,384,9), (4,346,10), (5,404,1), (5,419,2), (5,157,3),
      (5,33,4), (5,359,5), (5,395,6), (5,266,7), (5,11,8), (5,453,9),
      (5,433,10), (6,430,1), (6,145,2), (6,268,3), (6,395,4),
      (6,214,5), (6,252,6), (6,11,7), (6,53,8), (6,270,9),
      (6,403,10), (7,340,1), (7,425,2), (7,209,3), (7,334,4),
      (7,381,5), (7,0,6), (7,156,7), (7,442,8), (7,319,9), (7,407,10)
    )),
    // identical to ann_ivf_topk's picks — at refine=8 the SQ8
    // shortlist recovers the exact within-cell top-10, which is the
    // near-exact-tier claim made measurable
    "ann_sq_topk" -> pinnedAnnOracle(Seq(
      (0,365,1), (0,334,2), (0,387,3), (0,423,4), (0,73,5), (0,320,6),
      (0,190,7), (0,464,8), (0,388,9), (0,483,10), (1,386,1),
      (1,27,2), (1,407,3), (1,195,4), (1,64,5), (1,472,6), (1,203,7),
      (1,363,8), (1,312,9), (1,353,10), (2,117,1), (2,450,2),
      (2,320,3), (2,418,4), (2,471,5), (2,172,6), (2,197,7),
      (2,440,8), (2,109,9), (2,97,10), (3,130,1), (3,149,2),
      (3,343,3), (3,174,4), (3,231,5), (3,207,6), (3,192,7),
      (3,437,8), (3,474,9), (3,363,10), (4,114,1), (4,408,2),
      (4,482,3), (4,280,4), (4,249,5), (4,257,6), (4,89,7), (4,470,8),
      (4,384,9), (4,346,10), (5,404,1), (5,419,2), (5,157,3),
      (5,33,4), (5,359,5), (5,395,6), (5,464,7), (5,266,8), (5,225,9),
      (5,11,10), (6,430,1), (6,145,2), (6,437,3), (6,386,4),
      (6,268,5), (6,395,6), (6,214,7), (6,252,8), (6,371,9),
      (6,11,10), (7,340,1), (7,425,2), (7,209,3), (7,334,4),
      (7,381,5), (7,0,6), (7,332,7), (7,156,8), (7,442,9), (7,99,10)
    )),
    // re-pinned r13 after the rotation-allocation LPT fix (ascending
    // eigenvalue order — correlated-corpus shortlist recall 0.4625 →
    // 0.625 in SimilaritySpec); two fresh-JVM index builds verified
    // bit-identical before pinning
    "ann_opq_topk" -> pinnedAnnOracle(Seq(
      (0,365,1), (0,334,2), (0,387,3), (0,423,4), (0,73,5),
      (0,190,6), (0,464,7), (0,388,8), (0,483,9), (0,323,10),
      (1,386,1), (1,27,2), (1,407,3), (1,195,4), (1,64,5),
      (1,472,6), (1,363,7), (1,312,8), (1,353,9), (1,268,10),
      (2,117,1), (2,450,2), (2,320,3), (2,418,4), (2,471,5),
      (2,172,6), (2,197,7), (2,440,8), (2,109,9), (2,97,10),
      (3,130,1), (3,343,2), (3,174,3), (3,231,4), (3,207,5),
      (3,192,6), (3,437,7), (3,474,8), (3,363,9), (3,396,10),
      (4,114,1), (4,408,2), (4,482,3), (4,280,4), (4,249,5),
      (4,257,6), (4,89,7), (4,470,8), (4,288,9), (4,332,10),
      (5,404,1), (5,419,2), (5,157,3), (5,33,4), (5,359,5),
      (5,395,6), (5,464,7), (5,266,8), (5,225,9), (5,453,10),
      (6,145,1), (6,437,2), (6,386,3), (6,268,4), (6,395,5),
      (6,214,6), (6,371,7), (6,11,8), (6,53,9), (6,270,10),
      (7,340,1), (7,425,2), (7,209,3), (7,334,4), (7,381,5),
      (7,0,6), (7,332,7), (7,156,8), (7,442,9), (7,319,10)
    )),
    "ann_rpq_topk" -> pinnedAnnOracle(Seq(
      (0,334,1), (0,387,2), (0,423,3), (0,73,4), (0,320,5), (0,190,6),
      (0,464,7), (0,388,8), (0,483,9), (0,344,10), (1,386,1),
      (1,27,2), (1,407,3), (1,195,4), (1,64,5), (1,472,6), (1,203,7),
      (1,363,8), (1,312,9), (1,353,10), (2,117,1), (2,450,2),
      (2,418,3), (2,471,4), (2,172,5), (2,197,6), (2,97,7), (2,37,8),
      (2,1,9), (2,13,10), (3,130,1), (3,343,2), (3,174,3), (3,231,4),
      (3,207,5), (3,437,6), (3,474,7), (3,363,8), (3,396,9),
      (3,463,10), (4,114,1), (4,408,2), (4,482,3), (4,280,4),
      (4,249,5), (4,257,6), (4,89,7), (4,384,8), (4,346,9),
      (4,288,10), (5,404,1), (5,419,2), (5,157,3), (5,33,4),
      (5,359,5), (5,395,6), (5,464,7), (5,266,8), (5,225,9),
      (5,11,10), (6,430,1), (6,145,2), (6,395,3), (6,214,4),
      (6,252,5), (6,371,6), (6,11,7), (6,53,8), (6,270,9), (6,403,10),
      (7,340,1), (7,425,2), (7,209,3), (7,334,4), (7,381,5), (7,0,6),
      (7,332,7), (7,156,8), (7,442,9), (7,319,10)
    )),
    "ann_pq_topk" -> pinnedAnnOracle(Seq(
      (0,365,1), (0,334,2), (0,387,3), (0,423,4), (0,73,5), (0,190,6),
      (0,464,7), (0,388,8), (0,483,9), (0,323,10), (1,386,1),
      (1,27,2), (1,407,3), (1,195,4), (1,64,5), (1,472,6), (1,203,7),
      (1,363,8), (1,312,9), (1,353,10), (2,117,1), (2,450,2),
      (2,320,3), (2,418,4), (2,172,5), (2,197,6), (2,109,7), (2,97,8),
      (2,459,9), (2,128,10), (3,130,1), (3,149,2), (3,343,3),
      (3,207,4), (3,192,5), (3,437,6), (3,474,7), (3,363,8),
      (3,396,9), (3,463,10), (4,114,1), (4,408,2), (4,482,3),
      (4,280,4), (4,249,5), (4,257,6), (4,89,7), (4,346,8), (4,288,9),
      (4,332,10), (5,404,1), (5,157,2), (5,33,3), (5,395,4),
      (5,464,5), (5,266,6), (5,225,7), (5,11,8), (5,453,9),
      (5,433,10), (6,430,1), (6,145,2), (6,395,3), (6,214,4),
      (6,252,5), (6,371,6), (6,11,7), (6,53,8), (6,270,9), (6,403,10),
      (7,340,1), (7,425,2), (7,209,3), (7,334,4), (7,381,5), (7,0,6),
      (7,332,7), (7,156,8), (7,442,9), (7,99,10)
    )),
    // E2-family near-dup pairs, pinned at the driver SF (r12): the
    // pair ID SET is bit-stable across fresh JVMs (the quantizer
    // rides the canonical feed; the exact-cosine threshold margin is
    // 1.3e-4 at sf0.01, four orders above cross-engine float error),
    // so the pairs pin as VALUES and DuckDB recomputes cosine with
    // the bit-portable ordered fold — hash-exact on every column.
    // check.py keeps the all-pairs tolerance sweep as the
    // full-recall cross-check at this SF.
    "dedup_embedding" -> {
      val picks = Seq((7,340), (7,425), (16,402), (19,87), (24,234),
        (24,298), (24,384), (28,305), (32,200), (35,351), (44,301),
        (45,298), (53,234), (53,300), (53,430), (70,210), (75,256),
        (83,310), (84,190), (85,404), (108,142), (108,232), (120,421),
        (131,456), (150,152), (156,438), (158,452), (159,202),
        (162,282), (166,324), (169,466), (172,440), (181,194),
        (183,399), (191,431), (195,317), (197,318), (198,468),
        (200,204), (202,245), (203,414), (205,485), (207,326),
        (234,384), (238,287), (253,385), (262,291), (269,340),
        (290,325), (290,331), (325,331), (334,382), (334,438),
        (335,439), (338,406), (350,395), (350,479), (355,417),
        (387,388))
      val vals = picks.map { case (i, j) => s"  ($i, $j)" }
        .mkString(",\n")
      s"""WITH picks(id1, id2) AS (VALUES
         |$vals),
         |n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${foldDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings)
         |SELECT p.id1, p.id2,
         |  ${foldDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
         |    AS cosine
         |FROM picks p JOIN n a ON a.vec_id = p.id1
         |  JOIN n b ON b.vec_id = p.id2""".stripMargin
    },
    // SemDeDup survivors: exact cosine pair join → recursive-CTE
    // components (the dedup_components pattern) → drop non-min group
    // members. Integer ids only — exact hash gate (SF-scoped, see the
    // query comment).
    "dedup_semantic" ->
      """WITH RECURSIVE n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_dot_product(embedding, embedding)) AS nrm
        |  FROM embeddings),
        |jp AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.embedding, b.embedding)
        |    / (a.nrm * b.nrm) >= 0.4),
        |ed AS (SELECT id1 AS a, id2 AS b FROM jp
        |       UNION SELECT id2, id1 FROM jp),
        |walk(id, reach) AS (
        |  SELECT a, a FROM ed
        |  UNION SELECT w.id, ed.b FROM walk w JOIN ed ON w.reach = ed.a),
        |losers AS (
        |  SELECT id FROM walk GROUP BY 1 HAVING min(reach) <> id)
        |SELECT e.vec_id FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT id FROM losers)""".stripMargin,
    // C8-C10 fixed-expectation oracles, pinned at the driver's
    // correctness SF (sf0.01): best-of-10 KMeans on the canonically
    // ordered profile table is bit-deterministic (Clustering.scala —
    // one sorted partition feeds the fit), so the full assignment /
    // size / typical-day outputs are pinned as VALUES, the same
    // pattern as lake_sql_maintenance. Valid ONLY at sf0.01 — local
    // harness runs at other SFs skip them via check.py SF_SCOPED.
    "gold_cluster_assignments" ->
      """SELECT * FROM (VALUES
        |  (DATE '2024-01-01', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-02', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-03', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-04', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-05', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-06', CAST(2 AS BIGINT)),
        |  (DATE '2024-01-07', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-08', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-09', CAST(2 AS BIGINT)),
        |  (DATE '2024-01-10', CAST(2 AS BIGINT)),
        |  (DATE '2024-01-11', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-12', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-13', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-14', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-15', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-16', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-17', CAST(2 AS BIGINT)),
        |  (DATE '2024-01-18', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-19', CAST(1 AS BIGINT)),
        |  (DATE '2024-01-20', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-21', CAST(2 AS BIGINT)),
        |  (DATE '2024-01-22', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-23', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-24', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-25', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-26', CAST(2 AS BIGINT)),
        |  (DATE '2024-01-27', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-28', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-29', CAST(0 AS BIGINT)),
        |  (DATE '2024-01-30', CAST(1 AS BIGINT))
        |) t(date, cluster_id)""".stripMargin,
    "gold_cluster_sizes" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(14 AS BIGINT), 'Monday'),
        |  (CAST(1 AS BIGINT), CAST(10 AS BIGINT), 'Tuesday'),
        |  (CAST(2 AS BIGINT), CAST(6 AS BIGINT), 'Wednesday')
        |) t(cluster_id, days_in_cluster, typical_day)""".stripMargin,
    "gold_cluster_typical_day" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), CAST(52.41 AS DOUBLE), CAST(9014.15 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(1 AS INT), CAST(48.82 AS DOUBLE), CAST(8787.19 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(2 AS INT), CAST(41.1 AS DOUBLE), CAST(7685.37 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(3 AS INT), CAST(45.21 AS DOUBLE), CAST(7957.51 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(4 AS INT), CAST(51.8 AS DOUBLE), CAST(13001.38 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(5 AS INT), CAST(50.68 AS DOUBLE), CAST(10388.63 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(6 AS INT), CAST(43.26 AS DOUBLE), CAST(7527.9 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(7 AS INT), CAST(55.71 AS DOUBLE), CAST(10807.51 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(8 AS INT), CAST(53.82 AS DOUBLE), CAST(10548.42 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(9 AS INT), CAST(50.26 AS DOUBLE), CAST(9700.25 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(10 AS INT), CAST(53.87 AS DOUBLE), CAST(12337.26 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(11 AS INT), CAST(51.41 AS DOUBLE), CAST(9870.03 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(12 AS INT), CAST(51.18 AS DOUBLE), CAST(9519.44 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(13 AS INT), CAST(47.97 AS DOUBLE), CAST(10025.15 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(14 AS INT), CAST(51.19 AS DOUBLE), CAST(9572.76 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(15 AS INT), CAST(47.44 AS DOUBLE), CAST(8917.96 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(16 AS INT), CAST(48.91 AS DOUBLE), CAST(10907.56 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(17 AS INT), CAST(51.29 AS DOUBLE), CAST(9282.73 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(18 AS INT), CAST(44.68 AS DOUBLE), CAST(8890.8 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(19 AS INT), CAST(53.02 AS DOUBLE), CAST(12195.45 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(20 AS INT), CAST(46.55 AS DOUBLE), CAST(10288.52 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(21 AS INT), CAST(46.55 AS DOUBLE), CAST(8331.98 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(22 AS INT), CAST(46.59 AS DOUBLE), CAST(8991.29 AS DOUBLE)),
        |  (CAST(0 AS BIGINT), CAST(23 AS INT), CAST(54.7 AS DOUBLE), CAST(10885.93 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), CAST(50.01 AS DOUBLE), CAST(8301.93 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(1 AS INT), CAST(43.46 AS DOUBLE), CAST(6214.78 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(2 AS INT), CAST(47.27 AS DOUBLE), CAST(6334.38 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(3 AS INT), CAST(46.69 AS DOUBLE), CAST(5789.14 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(4 AS INT), CAST(50.13 AS DOUBLE), CAST(6516.87 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(5 AS INT), CAST(47.27 AS DOUBLE), CAST(6617.27 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(6 AS INT), CAST(53.71 AS DOUBLE), CAST(8325.53 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(7 AS INT), CAST(43.42 AS DOUBLE), CAST(5514.25 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(8 AS INT), CAST(45.37 AS DOUBLE), CAST(6351.26 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(9 AS INT), CAST(49.9 AS DOUBLE), CAST(6936.18 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(10 AS INT), CAST(47.33 AS DOUBLE), CAST(5537.23 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(11 AS INT), CAST(41.11 AS DOUBLE), CAST(5303.09 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(12 AS INT), CAST(50.61 AS DOUBLE), CAST(7439.81 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(13 AS INT), CAST(54.47 AS DOUBLE), CAST(7679.84 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(14 AS INT), CAST(55.95 AS DOUBLE), CAST(9792.03 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(15 AS INT), CAST(50.38 AS DOUBLE), CAST(8312.75 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(16 AS INT), CAST(45.73 AS DOUBLE), CAST(5533.26 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(17 AS INT), CAST(52.03 AS DOUBLE), CAST(5515.31 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(18 AS INT), CAST(55.55 AS DOUBLE), CAST(8666.56 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(19 AS INT), CAST(48.85 AS DOUBLE), CAST(7425.71 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(20 AS INT), CAST(44.56 AS DOUBLE), CAST(5881.62 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(21 AS INT), CAST(46.84 AS DOUBLE), CAST(5807.98 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(22 AS INT), CAST(49.84 AS DOUBLE), CAST(6429.9 AS DOUBLE)),
        |  (CAST(1 AS BIGINT), CAST(23 AS INT), CAST(49.54 AS DOUBLE), CAST(5796.24 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), CAST(47.37 AS DOUBLE), CAST(3173.86 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(1 AS INT), CAST(41.88 AS DOUBLE), CAST(3518.22 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(2 AS INT), CAST(54.2 AS DOUBLE), CAST(4606.58 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(3 AS INT), CAST(53.19 AS DOUBLE), CAST(4574.48 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(4 AS INT), CAST(42.18 AS DOUBLE), CAST(3332.07 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(5 AS INT), CAST(49.54 AS DOUBLE), CAST(3318.96 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(6 AS INT), CAST(52.56 AS DOUBLE), CAST(5676.41 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(7 AS INT), CAST(56.28 AS DOUBLE), CAST(4446.23 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(8 AS INT), CAST(54.1 AS DOUBLE), CAST(4436.54 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(9 AS INT), CAST(63.47 AS DOUBLE), CAST(6156.38 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(10 AS INT), CAST(51.39 AS DOUBLE), CAST(3854.06 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(11 AS INT), CAST(48.04 AS DOUBLE), CAST(4083.19 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(12 AS INT), CAST(44.42 AS DOUBLE), CAST(3553.65 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(13 AS INT), CAST(40.39 AS DOUBLE), CAST(3473.52 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(14 AS INT), CAST(48.56 AS DOUBLE), CAST(3739.06 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(15 AS INT), CAST(53.5 AS DOUBLE), CAST(4333.81 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(16 AS INT), CAST(47.62 AS DOUBLE), CAST(3428.94 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(17 AS INT), CAST(63.8 AS DOUBLE), CAST(5359.45 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(18 AS INT), CAST(46.91 AS DOUBLE), CAST(4221.81 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(19 AS INT), CAST(43.88 AS DOUBLE), CAST(3071.37 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(20 AS INT), CAST(52.1 AS DOUBLE), CAST(3125.84 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(21 AS INT), CAST(58.98 AS DOUBLE), CAST(4718.56 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(22 AS INT), CAST(50.25 AS DOUBLE), CAST(5226.0 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(23 AS INT), CAST(49.56 AS DOUBLE), CAST(3419.49 AS DOUBLE))
        |) t(cluster_id, hour, avg_trips, total_trips_sample)""".stripMargin,
    "ann_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv,
         |    sqrt(${foldDot("embedding", "embedding")}) AS qn
         |  FROM embeddings WHERE vec_id < 8),
         |c AS (
         |  SELECT vec_id AS cand_id, embedding AS cv,
         |    sqrt(${foldDot("embedding", "embedding")}) AS cn
         |  FROM embeddings),
         |scored AS (
         |  SELECT query_id, cand_id,
         |    ${foldDot("qv", "cv")} / (qn * cn) AS cosine
         |  FROM c, q WHERE cand_id <> query_id),
         |ranked AS (
         |  SELECT query_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, cand_id) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, cand_id, cosine, rank
         |FROM ranked WHERE rank <= 10""".stripMargin
  )
}
