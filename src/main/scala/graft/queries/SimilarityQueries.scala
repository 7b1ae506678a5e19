package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PipelineFunctions._

/** Approximate-nearest-neighbor search and embedding near-dup detection over
  * the `embeddings` table (64-dim float vectors).
  *
  * Scale design:
  *   - Vectors are L2-normalized ONCE, map-side, before any pairwise stage —
  *     every candidate pair then costs a single dot product (3× fewer flops
  *     than cosine-per-pair, and the normalize is O(corpus), not O(pairs)).
  *   - Brute force is the correctness baseline: broadcast the (small) query
  *     set against the corpus — one map-side pass, top-k per query via a
  *     bounded window. Right answer, O(corpus × queries) work.
  *   - The scale path buckets vectors by random-hyperplane LSH signature so
  *     candidate generation is an equi-join on the signature prefix —
  *     shuffle is O(corpus), not O(corpus²). Recall is tunable by
  *     planes/prefix bits; signatures are md5-derived and deterministic,
  *     computed from the driver-side literal weight matrix (LshWeights).
  */
object SimilarityQueries extends QueryPack {

  /** The IVF probe pipeline at a given probe budget: 16 seed centroids,
    * rank-1 assignment, queries probe their `nprobe` nearest inverted
    * lists, exact dot re-rank of list members. Returns
    * (top-5 per query, candidate count per query) — the candidate count
    * is the COST side of the recall-vs-cost curve (vectors actually
    * scored; each corpus vector lives in exactly one list, so no dedup).
    * Scale shape: centroids broadcast; candidate work per query =
    * probed-list depth, never the corpus. */
  private def ivfAt(s: SparkSession, dir: String,
                    nprobe: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val all = normVecs(s, dir, spread = true)
    val centroids = broadcast(all.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"v".as("cv")))
    // assignment: nearest centroid by dot product (rank 1) — map-side
    // argbest over the broadcast codebook array, no window shuffle
    val assigned = assignNearestByDot(all, centroids)
      .select($"vec_id", $"v", $"cid")
      .persist()
    val probes = all.filter($"vec_id" < 10).join(centroids)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"cid",
        round(dot($"v", $"cv"), 6).as("cdot"))
      .withColumn("r", row_number().over(
        Window.partitionBy($"qid").orderBy($"cdot".desc, $"cid")))
      .filter($"r" <= nprobe).select($"qid", $"qv", $"cid")
    val members = probes.join(assigned, "cid")
      .filter($"vec_id" =!= $"qid")
    val scored = members
      .select($"qid", $"vec_id", round(dot($"qv", $"v"), 6).as("sim"))
    val wTop = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
    val top5 = scored.withColumn("rnk", row_number().over(wTop))
      .filter($"rnk" <= 5)
      .select($"qid", $"rnk".cast("long").as("rnk"), $"vec_id", $"sim")
    val nCand = members.groupBy($"qid").agg(count(lit(1)).as("n_cand"))
    (top5, nCand)
  }

  /** vec_id + L2-normalized double vector (normalization happens once here,
    * never inside a pairwise stage). */
  private def normVecs(s: SparkSession, dir: String,
                       spread: Boolean = false): DataFrame =
    normVecsFrom(Tables.load(s, dir, "embeddings"), spread)

  /** Rank-1 nearest-centroid assignment WITHOUT the window shuffle: the
    * codebook (≤16 rows) collapses to ONE array row, broadcast to every
    * task, and the argbest is computed inside a single codegen'd
    * expression per corpus row. Selection order is IDENTICAL to the
    * `row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid)`
    * window it replaces: the rounded dot is negated so descending
    * similarity becomes the ascending first struct field (negation
    * preserves signed-zero order: −(−0.0) = 0.0), cid breaks ties. At
    * 100 TB this turns assignment from a 16n-row shuffle+sort into a
    * pure scan — the corpus is read once and never leaves its partition.
    * Returns (every column of `all`) + `cid` + `ccv` (the winning
    * centroid's vector, for residual computation). */
  private[graft] def assignNearestByDot(all: DataFrame,
                                        centroids: DataFrame): DataFrame = {
    import all.sparkSession.implicits._
    val cbRow = broadcast(
      centroids.agg(collect_list(struct($"cid", $"cv")).as("cb_arr")))
    all.crossJoin(cbRow)
      // sort CHEAP (nk, cid) structs only — carrying the 64-dim centroid
      // vectors through the comparator would dominate the scan; the
      // winner's vector is recovered by one filter pass below, and
      // Catalyst prunes that expression entirely when the caller never
      // selects `ccv`
      .withColumn("best", element_at(array_sort(transform($"cb_arr", c =>
        struct((-round(dot($"v", c("cv")), 6)).as("nk"),
          c("cid").as("cid")))), 1))
      .withColumn("cid", $"best.cid")
      .withColumn("ccv", element_at(
        filter($"cb_arr", c => c("cid") === $"best.cid"), 1)("cv"))
      .drop("cb_arr", "best")
  }

  /** The per-SUBSPACE form of [[assignNearestByDot]] for the PQ family:
    * `subs` rows are (vec_id, j, sv) sub-vectors; `codebook` rows are
    * (cid, cj, cv) per-subspace centroids (16 per j). The codebook
    * collapses to 8 array rows (one per subspace), broadcast-joined on
    * j, and the argmin by (round(L2², 9) ASC, cid ASC) — exactly the
    * `row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid)`
    * window's order — is one codegen'd expression per sub-vector row.
    * Returns (every column of `subs`) + `code` + `d2` (winning
    * centroid id and its rounded squared distance). */
  private[graft] def pqAssignNearest(subs: DataFrame,
                                     codebook: DataFrame): DataFrame = {
    import subs.sparkSession.implicits._
    val cbByJ = broadcast(codebook.groupBy($"cj")
      .agg(collect_list(struct($"cid", $"cv")).as("cb_arr")))
    subs.join(cbByJ, $"j" === $"cj")
      .withColumn("best", element_at(array_sort(transform($"cb_arr", c =>
        struct(round(aggregate(zip_with($"sv", c("cv"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x), 9)
          .as("d2"), c("cid").as("cid")))), 1))
      .drop("cj", "cb_arr")
      .withColumn("code", $"best.cid")
      .withColumn("d2", $"best.d2")
      .drop("best")
  }

  private[graft] def normVecsFrom(embeds: DataFrame,
                                  spread: Boolean = false): DataFrame = {
    import embeds.sparkSession.implicits._
    // spread = true: hash-repartition the vectors BEFORE a downstream
    // compute-AMPLIFIED stage (rank-1 scans over broadcast codebooks,
    // per-subspace PQ encode, Lloyd rounds): the local embeddings parquet
    // reads as ONE split, which serialized those pipelines into a single
    // task (r15; the q_curation_dsir pattern — at 100 TB the scan's own
    // splits provide the parallelism for free). Callers whose downstream
    // work is CHEAP per row (brute-force dot + broadcast query set, LSH
    // bucket signatures) skip the spread: for them the extra exchange
    // measured as a net loss (A/B: q_ann_lsh_bucketed 0.63→0.96 s).
    val base =
      if (spread)
        embeds.repartition(
          embeds.sparkSession.sparkContext.defaultParallelism, $"vec_id")
      else embeds
    base
      .select($"vec_id", vecD($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
      .select($"vec_id", transform($"v", x => x / $"nrm").as("v"))
  }

  override def queries: Map[String, Q] = Map(
    // Brute-force cosine top-5 for 10 query vectors. Rounded similarity in
    // the rank ordering keeps ranking deterministic cross-engine.
    "q_ann_bruteforce" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir)
      val q = all.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"v".as("qv"))
      val scored = all.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id", round(dot($"qv", $"v"), 6).as("sim"))
      val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"qid", $"rnk".cast("long").as("rnk"), $"vec_id", $"sim")
        .orderBy($"qid", $"rnk")
    }),

    // ANN RECALL diagnostic — "measure, don't guess" for the approximate
    // index: recall@5 of the IVF path against the brute-force ground
    // truth, per query. Composed from the two oracle-green pipelines at
    // the query level (any drift in either side moves this row), and the
    // oracle composes the same two oracle texts — DuckDB re-derives both
    // sides and the intersection independently.
    "q_ann_recall" -> ((s, dir) => {
      import s.implicits._
      val bf = queries("q_ann_bruteforce")(s, dir).select($"qid", $"vec_id")
      val ivf = queries("q_ann_ivf")(s, dir).select($"qid", $"vec_id")
        .withColumn("hit", lit(1L))
      bf.join(ivf, Seq("qid", "vec_id"), "left")
        .groupBy($"qid")
        .agg(round(sum(coalesce($"hit", lit(0L))).cast("double") / 5.0, 6)
          .as("recall5"))
        .orderBy($"qid")
    }),

    // The full RECALL MATRIX: recall@5 per (method, query) for every
    // approximate variant against the brute-force ground truth — the
    // index-selection table a pipeline owner reads before picking a
    // method/probe budget. Same composition rule as q_ann_recall, one
    // row per (method, qid).
    "q_ann_recall_matrix" -> ((s, dir) => {
      import s.implicits._
      val bf = queries("q_ann_bruteforce")(s, dir).select($"qid", $"vec_id")
        .persist()
      def recallOf(top: DataFrame): DataFrame =
        bf.join(top.select($"qid", $"vec_id").withColumn("hit", lit(1L)),
            Seq("qid", "vec_id"), "left")
          .groupBy($"qid")
          .agg(round(sum(coalesce($"hit", lit(0L))).cast("double") / 5.0, 6)
            .as("recall5"))
      val methods = Seq("ivf" -> "q_ann_ivf", "lsh" -> "q_ann_lsh_bucketed",
        "lsh_mp" -> "q_ann_lsh_multiprobe",
        "pq" -> "q_ann_pq", "ivfpq" -> "q_ann_ivfpq")
      val fixed = methods.map { case (label, qname) =>
        recallOf(queries(qname)(s, dir))
          .select(lit(label).as("method"), $"qid", $"recall5",
            lit(null).cast("long").as("n_cand"))
      }
      // the IVF nprobe SWEEP (r8 VERDICT #6): recall@5 AND candidate
      // count per probe budget — the recall-vs-cost curve an index owner
      // reads to pick the serving default empirically. n_cand is the
      // vectors actually scored (the probe's real cost); 0 when the
      // probed lists hold nothing but the query itself.
      val swept = Seq(1, 2, 4, 8).map { np =>
        val (top, cand) = ivfAt(s, dir, np)
        recallOf(top).join(cand, Seq("qid"), "left")
          .select(lit(s"ivf_np$np").as("method"), $"qid", $"recall5",
            coalesce($"n_cand", lit(0L)).as("n_cand"))
      }
      (fixed ++ swept).reduce(_ unionAll _)
        .orderBy($"method", $"qid")
    }),

    // Embedding-cosine near-duplicate pairs (sim ≥ 0.4). Brute force here as
    // ground truth; q_ann_lsh_bucketed is the O(n) candidate path.
    "q_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir, spread = true)
      all.as("a").join(all.as("b"), $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"),
          round(dot($"a.v", $"b.v"), 6).as("sim"))
        .filter($"sim" >= 0.4)
        .orderBy($"d1", $"d2")
    }),

    // Embedding-space near-dup CLUSTERING: connected components over the
    // cosine pair graph + canonical election — the embedding twin of
    // q_dedup_clusters (same Graph.connectedComponents operator). Built on
    // the brute-force ground-truth pairs so it stays exactly oracle-able;
    // at scale the SAME composition runs over q_ann_lsh_bucketed's
    // candidate pairs instead (bucketed edges in, identical CC + election).
    "q_embed_clusters" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir, spread = true)
      val pairs = all.as("a").join(all.as("b"), $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"),
          round(dot($"a.v", $"b.v"), 6).as("sim"))
        .filter($"sim" >= 0.4)
      val edges = pairs.select(explode(array(
          struct($"d1".as("u"), $"d2".as("v")),
          struct($"d2".as("u"), $"d1".as("v")))).as("e"))
        .select($"e.u", $"e.v")
      val labels = graft.operators.Graph.connectedComponents(edges)
      val members = labels.select($"u".as("vec_id"), $"lbl".as("canonical_id"))
      val sizes = members.groupBy($"canonical_id")
        .agg(count(lit(1)).as("cluster_size"))
      members.join(sizes, "canonical_id")
        .select($"vec_id", $"canonical_id", $"cluster_size")
        .orderBy($"vec_id")
    }),

    // SemDeDup-shape semantic dedup (Abbas et al. 2023, public): cluster
    // the embedding space with the same coarse quantizer IVF uses, then
    // compare pairs ONLY within a cluster — the pair space collapses from
    // O(n²) to Σ|cluster|², and at 100 TB members co-locate with ONE
    // shuffle on cid (giant clusters get capped/sub-bucketed in
    // production; the per-cluster kernel is unchanged). A dropped vector
    // reports its canonical (lowest-id) near-duplicate and best cosine.
    "q_dedup_semantic" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir, spread = true)
      val centroids = all.filter($"vec_id" < 16)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val assigned = assignNearestByDot(all, centroids)
        .select($"vec_id", $"v", $"cid")
        .persist()
      val pairs = assigned.as("a").join(assigned.as("b"),
          $"a.cid" === $"b.cid" && $"a.vec_id" < $"b.vec_id")
        .select($"b.vec_id".as("vec_id"), $"a.vec_id".as("dup_of"),
          round(dot($"a.v", $"b.v"), 6).as("sim"))
        .filter($"sim" >= 0.4)
      pairs.groupBy($"vec_id")
        .agg(min($"dup_of").as("dup_of"), max($"sim").as("best_sim"))
        .orderBy($"vec_id")
    }),

    // Random-hyperplane LSH signatures — the bucketing primitive, verified
    // value-exactly cross-engine (the oracle re-derives the same md5-based
    // plane weights the LshWeights literal matrix was built from).
    "q_lsh_signatures" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "embeddings")
        .select($"vec_id", lshSignatureFast(vecD($"embedding")).as("sig"))
        .orderBy($"vec_id")
    }),

    // IVF ANN (the other scale path): a coarse quantizer (16 deterministic
    // centroids = the first 16 vectors, normalized) partitions the corpus
    // into inverted lists; queries probe their 2 nearest lists and exact-
    // rank inside them. At 100 TB: corpus is bucketed/partitioned by
    // centroid id once at ingest; a query touches probes/nlist of the data.
    // Fully deterministic (round(6) ranking, cid/vec_id tie-breaks) — exact
    // DuckDB oracle below.
    "q_ann_ivf" -> ((s, dir) => ivfAt(s, dir, nprobe = 2)._1
      .orderBy(col("qid"), col("rnk"))),

    // IVF index TRAINING: 2 Lloyd (k-means) rounds refining the 16 seed
    // centroids — assignment by rounded dot (rank-1, cid tiebreak), then
    // element-wise means via DECIMAL(38,18)-exact sums (order-independent,
    // so map-side partial aggregation at 100 TB cannot perturb the result)
    // cast once to double, re-packed in ascending-dimension order and
    // re-normalized with the same ascending fold as every other vector op.
    // Each round shuffles (cid, dim, partial-sum) triples — 16×64 keys —
    // regardless of corpus size; the corpus itself is only scanned.
    "q_ann_ivf_train" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir, spread = true).persist()
      var centroids = all.filter($"vec_id" < 16)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      for (_ <- 1 to 2) {
        val assigned = assignNearestByDot(all, centroids)
          .select($"cid", $"v")
        val byDim = assigned
          .select($"cid", posexplode($"v").as(Seq("i", "x")))
          .groupBy($"cid", $"i")
          .agg((sum($"x".cast("decimal(38,18)")).cast("double") /
            count(lit(1))).as("m"))
        val packed = byDim.groupBy($"cid")
          .agg(array_sort(collect_list(struct($"i", $"m"))).as("im"))
          .select($"cid", transform($"im", e => e("m")).as("mv"))
        centroids = packed
          .withColumn("nrm", l2norm($"mv"))
          .select($"cid", transform($"mv", x => x / $"nrm").as("cv"))
          .persist()
      }
      centroids
        .select($"cid", posexplode($"cv").as(Seq("i", "x")))
        .select($"cid", $"i".cast("long").as("i"), round($"x", 6).as("val"))
        .orderBy($"cid", $"i")
    }),

    // LSH-bucketed ANN (the scale path): candidates share the top-8-bit
    // signature bucket; exact dot re-rank within the bucket. Deterministic
    // end-to-end, so it gets an exact oracle like the brute-force baseline.
    "q_ann_lsh_bucketed" -> ((s, dir) => {
      import s.implicits._
      val sig = normVecs(s, dir)
        .withColumn("bucket", shiftright(lshSignatureFast($"v"), 8))
        .persist() // feeds both sides of the bucket self-join
      val pairs = sig.as("a").join(sig.as("b"),
          $"a.bucket" === $"b.bucket" && $"a.vec_id" =!= $"b.vec_id")
        .select($"a.vec_id".as("qid"), $"b.vec_id".as("vec_id"),
          round(dot($"a.v", $"b.v"), 6).as("sim"))
      val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      pairs.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"qid", $"rnk".cast("long").as("rnk"), $"vec_id", $"sim")
        .orderBy($"qid", $"rnk")
    }),

    // MULTI-PROBE LSH (Lv et al., "Multi-Probe LSH", VLDB 2007 — public):
    // each query probes its own 8-bit bucket PLUS the 8 buckets at
    // Hamming distance 1 (a fixed perturbation set) — the classic recall
    // repair for bucketed LSH at ~9× the candidate work, no extra hash
    // tables. The recall matrix quantifies exactly what that buys over
    // the single-bucket form. Probe buckets are distinct values, so no
    // candidate pair can duplicate — no dedup stage needed.
    "q_ann_lsh_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val sig = normVecs(s, dir)
        .withColumn("bucket", shiftright(lshSignatureFast($"v"), 8))
        .persist()
      val probes = sig.select($"vec_id".as("qid"), $"v".as("qv"),
        explode(concat(array($"bucket"),
          expr("transform(sequence(0, 7), j -> bucket ^ shiftleft(1L, j))")))
          .as("bucket"))
      val pairs = probes.join(sig, "bucket")
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id", round(dot($"qv", $"v"), 6).as("sim"))
      val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      pairs.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"qid", $"rnk".cast("long").as("rnk"), $"vec_id", $"sim")
        .orderBy($"qid", $"rnk")
    }),

    // INT8 scalar quantization (per-vector min/max) + exact reconstruction
    // error — the compression step before ANN serving at scale: 4× smaller
    // vectors keep a 100 TB index cache-resident, and the dequantization
    // error bound (≤ scale/2 per dim) is what makes recall predictable.
    // Pure map-side codegen'd array expressions — zero shuffle; the codes
    // are pinned exactly (fingerprint + sum) and the MSE is a fixed-order
    // left fold, bit-identical cross-engine before rounding.
    "q_embed_quantize" -> ((s, dir) =>
      quantize(Tables.load(s, dir, "embeddings")).orderBy("vec_id")),

    // Bucketed ANN in PURE DIALECT TEXT (5th frontend for the similarity
    // pack): L2NORMALIZE/LSH16/SHIFTRIGHT build the bucket key, the batch
    // join (WITHIN-less — dialect extension) generates candidates within a
    // bucket only, DOT scores them, and TOPK + FLATTEN stands in for the
    // per-group rank window the grammar lacks — the top-5 VALUE multiset
    // per query vector is identical to q_ann_lsh_bucketed's rank output.
    // Same plan shape as the Column-API twin: one bucket equi-join, never
    // all pairs. Sim is pinned as ROUND(dot·1e6) (dialect ROUND is unary).
    "q_sql_ann" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      new graft.sql.SqlEngine(s).batch(
        """SELECT qid, sim FROM FLATTEN(
             (SELECT qid, TOPK(sim, 5) AS sims
              FROM (SELECT a.vec_id AS qid,
                           ROUND(DOT(a.nv, b.nv) * 1000000) AS sim
                    FROM (SELECT vec_id, L2NORMALIZE(embedding) AS nv,
                                 SHIFTRIGHT(LSH16(L2NORMALIZE(embedding)), 8) AS bucket
                          FROM embeddings) AS a
                    JOIN (SELECT vec_id, L2NORMALIZE(embedding) AS nv,
                                 SHIFTRIGHT(LSH16(L2NORMALIZE(embedding)), 8) AS bucket
                          FROM embeddings) AS b
                      ON a.bucket = b.bucket
                    WHERE a.vec_id <> b.vec_id) AS p
              GROUP BY qid) AS t, sims AS sim)
           ORDER BY qid, sim;""")
    }),

    // PRODUCT QUANTIZATION codes (PQ, Jégou et al. 2011, public): the
    // third ANN family next to IVF (coarse partition) and LSH (bucketing)
    // — compress each 64-dim vector to 8 centroid ids, one per 8-dim
    // subspace, against per-subspace codebooks (here: the sub-vectors of
    // the 16 deterministic seed vectors, the same seeds IVF uses;
    // q_ann_pq_train refines them with per-subspace Lloyd rounds). Encoding is rank-1 nearest-centroid by rounded L2² with
    // cid tie-break — deterministic, exact DuckDB oracle. At 100 TB the
    // codebook is 16×8 tiny rows broadcast everywhere and encoding is one
    // scan; the 8n×16 candidate frame never leaves its partition before
    // the rank-1 window's 8n-row shuffle.
    "q_ann_pq_codes" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir, spread = true)
      val subs = all.select($"vec_id", posexplode(
          transform(sequence(lit(0), lit(7)), j => slice($"v", j * 8 + 1, lit(8))))
          .as(Seq("j", "sv")))
      val codebook = subs.filter($"vec_id" < 16)
        .select($"vec_id".as("cid"), $"j".as("cj"), $"sv".as("cv"))
      pqAssignNearest(subs, codebook)
        .select($"vec_id", $"j".cast("long").as("j"),
          $"code".cast("long").as("code"), $"d2")
        .orderBy($"vec_id", $"j")
    }),

    // PQ ANN search, the full production shape: ADC shortlist + exact
    // re-rank. A query precomputes its distance table to every (subspace,
    // centroid) — 8×16 rounded L2² cells — and a candidate's APPROXIMATE
    // distance is the sum of 8 table lookups at its codes (asymmetric
    // distance computation); the top-50 shortlist by ADC is then re-ranked
    // by exact dot product and the top 5 kept. This is PQ's point at
    // 100 TB: the full scan touches 8-byte codes, never raw vectors — the
    // distance tables (10 queries × 128 cells) broadcast everywhere, and
    // only |shortlist| raw vectors per query are ever fetched for the
    // re-rank. Determinism: per-cell round(9) makes each partial a fixed
    // decimal, the per-pair ADC sum is DECIMAL-exact (order-independent),
    // so the shortlist boundary and final ranks reproduce cross-engine.
    "q_ann_pq" -> ((s, dir) => {
      import s.implicits._
      val all = normVecs(s, dir, spread = true).persist() // feeds subspaces AND the re-rank
      val subs = all.select($"vec_id", posexplode(
          transform(sequence(lit(0), lit(7)), j => slice($"v", j * 8 + 1, lit(8))))
          .as(Seq("j", "sv")))
      val codebook = subs.filter($"vec_id" < 16)
        .select($"vec_id".as("cid"), $"j".as("cj"), $"sv".as("cv"))
      val codes = pqAssignNearest(subs, codebook)
        .select($"vec_id", $"j", $"code")
      val dtab = broadcast(subs.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"j".as("qj"), $"sv".as("qv"))
        .join(broadcast(codebook), $"qj" === $"cj")
        .select($"qid", $"qj", $"cid",
          round(aggregate(zip_with($"qv", $"cv", (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 9).cast("decimal(20,9)").as("pd")))
      val wShort = Window.partitionBy($"qid").orderBy($"adist", $"vec_id")
      val shortlist = codes.join(dtab, $"j" === $"qj" && $"code" === $"cid")
        .filter($"vec_id" =!= $"qid")
        .groupBy($"qid", $"vec_id").agg(sum($"pd").as("adist"))
        .withColumn("r", row_number().over(wShort)).filter($"r" <= 50)
        .select($"qid", $"vec_id")
      val wTop = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      shortlist
        .join(all, "vec_id")
        .join(broadcast(all.filter($"vec_id" < 10)
          .select($"vec_id".as("qid2"), $"v".as("qv2"))), $"qid" === $"qid2")
        .select($"qid", $"vec_id", round(dot($"qv2", $"v"), 6).as("sim"))
        .withColumn("rnk", row_number().over(wTop))
        .filter($"rnk" <= 5)
        .select($"qid", $"rnk".cast("long").as("rnk"), $"vec_id", $"sim")
        .orderBy($"qid", $"rnk")
    }),

    // IVF-PQ — the billion-scale composite (Jégou et al. 2011 §V, public;
    // the index family behind FAISS's IVFx,PQy): a coarse quantizer
    // partitions the corpus into inverted lists AND each vector stores
    // only the PQ codes of its RESIDUAL (v − centroid) — residuals
    // concentrate near 0, so the same 8×16 codebook quantizes them far
    // more precisely than raw vectors. A query probes its 2 nearest
    // lists; per probed list it builds the ADC distance table of its OWN
    // residual against the codebook (the per-list query residual is what
    // distinguishes IVF-PQ from flat PQ), shortlists top-50 by
    // DECIMAL-exact ADC sums, and exact-re-ranks the shortlist. At
    // 100 TB: codes are 8 bytes/vector scanned only within probed lists
    // (probes/nlist of the corpus), the codebook and distance tables
    // broadcast, raw vectors are fetched only for |shortlist| rows.
    // Determinism: residual subtraction is the same IEEE double op in
    // both engines; per-cell round(9), rank-1 cid tie-breaks.
    "q_ann_ivfpq" -> ((s, dir) => ivfpqFrom(normVecs(s, dir, spread = true))),

    // PQ codebook TRAINING: 2 Lloyd rounds per 8-dim subspace, refining
    // the 16 seed sub-vectors — the trained form the q_ann_pq_codes
    // comment promises. Same determinism discipline as q_ann_ivf_train:
    // rank-1 assignment by round(9) L2² with cid tie-break, element-wise
    // means as DECIMAL(38,18)-exact sums (partial-agg order can never
    // perturb them), ascending repack. Scale: every round shuffles
    // (j, cid, dim, partial-sum) triples — 8×16×8 keys regardless of
    // corpus size — and the ≤128-row codebook broadcasts back for the
    // next assignment; the corpus itself is only scanned.
    "q_ann_pq_train" -> ((s, dir) => {
      import s.implicits._
      val subs = normVecs(s, dir, spread = true).select($"vec_id", posexplode(
          transform(sequence(lit(0), lit(7)), j => slice($"v", j * 8 + 1, lit(8))))
          .as(Seq("j", "sv"))).persist()
      var cb = subs.filter($"vec_id" < 16)
        .select($"j", $"vec_id".as("cid"), $"sv".as("cv"))
      for (_ <- 1 to 2) {
        val assigned = pqAssignNearest(subs,
            cb.select($"cid", $"j".as("cj"), $"cv"))
          .select($"j", $"code".as("cid"), $"sv")
        val byDim = assigned
          .select($"j", $"cid", posexplode($"sv").as(Seq("i", "x")))
          .groupBy($"j", $"cid", $"i")
          .agg((sum($"x".cast("decimal(38,18)")).cast("double") /
            count(lit(1))).as("m"))
        cb = byDim.groupBy($"j", $"cid")
          .agg(array_sort(collect_list(struct($"i", $"m"))).as("im"))
          .select($"j", $"cid", transform($"im", e => e("m")).as("cv"))
          .persist()
      }
      cb.select($"j", $"cid", posexplode($"cv").as(Seq("i", "x")))
        .select($"j".cast("long").as("j"), $"cid".cast("long").as("cid"),
          $"i".cast("long").as("i"), round($"x", 6).as("val"))
        .orderBy($"j", $"cid", $"i")
    }),

    // int8 quantization through dialect text — QUANTIZE_INT8 is the same
    // single-rounding-site codec as SimilarityQueries.quantize. The codes
    // array is pinned scalar-wise (FLATTEN + per-vector sum/min/max/count —
    // the driver's compare sorts rows by every column, so raw array columns
    // can't be gated directly).
    "q_sql_quantize" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      new graft.sql.SqlEngine(s).batch(
        """SELECT vec_id, SUM(c) AS code_sum, MIN(c) AS code_min,
                  MAX(c) AS code_max, COUNT(*) AS n
           FROM FLATTEN((SELECT vec_id, QUANTIZE_INT8(embedding) AS codes
                         FROM embeddings) AS t, codes AS c)
           GROUP BY vec_id ORDER BY vec_id;""")
    })
  )

  /** The IVF-PQ search pipeline over normalized (vec_id, v) rows — ONE
    * definition shared by the q_ann_ivfpq gate and the ScaleProbe row.
    * See the q_ann_ivfpq entry for the design notes. */
  private[graft] def ivfpqFrom(all0: DataFrame): DataFrame = {
    import all0.sparkSession.implicits._
    val all = all0.persist()
    val centroids = broadcast(all.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"v".as("cv")))
      val assigned = assignNearestByDot(all, centroids)
        .select($"vec_id", $"cid",
          zip_with($"v", $"ccv", (x, y) => x - y).as("rv"))
        .persist()
      val subs = assigned.select($"vec_id", $"cid", posexplode(
          transform(sequence(lit(0), lit(7)), j => slice($"rv", j * 8 + 1, lit(8))))
          .as(Seq("j", "sv")))
      // residual codebook: the first 16 vectors' residual subvectors
      val codebook = broadcast(subs.filter($"vec_id" < 16)
        .select($"vec_id".as("ccid"), $"j".as("cj"), $"sv".as("cv8")))
      val codes = pqAssignNearest(subs,
          subs.filter($"vec_id" < 16)
            .select($"vec_id".as("cid"), $"j".as("cj"), $"sv".as("cv")))
        .select($"vec_id", $"cid", $"j", $"code")
      val wProbe = Window.partitionBy($"qid").orderBy($"cdot".desc, $"cid")
      val probes = all.filter($"vec_id" < 10).join(centroids)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"cid", $"cv",
          round(dot($"v", $"cv"), 6).as("cdot"))
        .withColumn("r", row_number().over(wProbe)).filter($"r" <= 2)
        .select($"qid", $"cid",
          zip_with($"qv", $"cv", (x, y) => x - y).as("qrv"))
      val qsubs = probes.select($"qid", $"cid", posexplode(
          transform(sequence(lit(0), lit(7)), j => slice($"qrv", j * 8 + 1, lit(8))))
          .as(Seq("j", "qsv")))
      val dtab = broadcast(qsubs.join(codebook, $"j" === $"cj")
        .select($"qid", $"cid", $"j", $"ccid",
          round(aggregate(zip_with($"qsv", $"cv8", (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 9).cast("decimal(20,9)").as("pd")))
      val wShort = Window.partitionBy($"qid").orderBy($"adist", $"vec_id")
      val shortlist = codes.as("co").join(dtab.as("dt"),
          col("co.cid") === col("dt.cid") && col("co.j") === col("dt.j") &&
            col("co.code") === col("dt.ccid"))
        .filter(col("co.vec_id") =!= col("dt.qid"))
        .groupBy(col("dt.qid").as("qid"), col("co.vec_id").as("vec_id"))
        .agg(sum($"pd").as("adist"))
        .withColumn("r", row_number().over(wShort)).filter($"r" <= 50)
        .select($"qid", $"vec_id")
      val wTop = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      shortlist.join(all, "vec_id")
        .join(broadcast(all.filter($"vec_id" < 10)
          .select($"vec_id".as("qid2"), $"v".as("qv2"))), $"qid" === $"qid2")
        .select($"qid", $"vec_id", round(dot($"qv2", $"v"), 6).as("sim"))
        .withColumn("rnk", row_number().over(wTop)).filter($"rnk" <= 5)
        .select($"qid", $"rnk".cast("long").as("rnk"), $"vec_id", $"sim")
        .orderBy($"qid", $"rnk")
  }

  /** The int8 min/max quantization pipeline over (vec_id, embedding) rows —
    * ONE definition shared by the q_embed_quantize gate and the streaming
    * twin (StreamingTwinSpec), so codec and error metric cannot drift
    * between the batch and streaming paths. */
  def quantize(in: DataFrame): DataFrame = {
    import in.sparkSession.implicits._
    in.select($"vec_id", vecD($"embedding").as("v"))
      .withColumn("mn", array_min($"v"))
      .withColumn("scale", (array_max($"v") - $"mn") / 255.0)
      .withColumn("codes", transform($"v", x =>
        when($"scale" === 0, lit(0L))
          .otherwise(round((x - $"mn") / $"scale", 0).cast("long"))))
      // reconstruction error FROM the codes (zip_with) — one rounding
      // site, so a codec change can never diverge from its error metric
      .withColumn("sqerr", zip_with($"codes", $"v", { (c, x) =>
        val e = x - ($"mn" + c * $"scale")
        when($"scale" === 0, lit(0.0)).otherwise(e * e)
      }))
      .select($"vec_id",
        round($"mn", 6).as("mn"),
        round($"scale", 9).as("scale"),
        aggregate($"codes", lit(0L), (a, c) => a + c).as("code_sum"),
        md5(array_join(transform($"codes", c => c.cast("string")), ","))
          .as("codes_fp"),
        round(aggregate($"sqerr", lit(0.0), (a, e) => a + e)
          / size($"v"), 12).as("mse"))
  }

  /** Oracle CTE: the same normalize-once-then-dot pipeline with identical
    * left-fold summation order, so doubles match bit-for-bit pre-rounding. */
  private val normCte =
    """WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
                   FROM embeddings),
       e AS (SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_reduce(list_prepend(0.0,
           list_transform(range(1, 65), i -> v[i] * v[i])), (s, t) -> s + t))) nv
       FROM e0)"""

  private def dotSql(a: String, b: String): String =
    s"""round(list_reduce(list_prepend(0.0,
        list_transform(range(1, 65), i -> $a[i] * $b[i])), (s, t) -> s + t), 6)"""

  /** One DuckDB Lloyd round per PQ SUBSPACE over codebook relation `prev`
    * (requires the `sub` CTE of per-(vec_id, j) sub-vectors): rank-1
    * assignment by round(9) L2² (cid tiebreak) → DECIMAL(38,18)-exact
    * per-dim means → ascending repack, keyed by (j, cid). */
  private def pqLloydCte(r: Int, prev: String): String =
    s"""a$r AS (SELECT s.vec_id, s.j, s.sv, c.cid,
           row_number() OVER (PARTITION BY s.vec_id, s.j
             ORDER BY round(list_reduce(list_prepend(0.0,
               list_transform(range(1, 9),
                 i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
               (a, x) -> a + x), 9), c.cid) rk
         FROM sub s JOIN $prev c USING (j)),
       m$r AS (SELECT j, cid, i, sum(CAST(x AS DECIMAL(38,18)))::DOUBLE
             / count(*) AS m
         FROM (SELECT j, cid, unnest(sv) AS x, unnest(range(1, 9)) AS i
               FROM a$r WHERE rk = 1)
         GROUP BY j, cid, i),
       c$r AS (SELECT j, cid, list(m ORDER BY i) AS cv FROM m$r
               GROUP BY j, cid)"""

  /** One DuckDB Lloyd round over centroid relation `prev`: rank-1
    * assignment by rounded dot (cid tiebreak) → DECIMAL(38,18)-exact
    * per-dim means → ascending repack → renormalize (ascending fold). */
  private def lloydCte(r: Int, prev: String): String =
    s"""a$r AS (SELECT e.vec_id, e.nv, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${dotSql("e.nv", "c.cv")} DESC, c.cid) rk
         FROM e CROSS JOIN $prev c),
       m$r AS (SELECT cid, i, sum(CAST(x AS DECIMAL(38,18)))::DOUBLE / count(*) AS m
         FROM (SELECT cid, unnest(nv) AS x, unnest(range(1, 65)) AS i
               FROM a$r WHERE rk = 1)
         GROUP BY cid, i),
       p$r AS (SELECT cid, list(m ORDER BY i) AS mv FROM m$r GROUP BY cid),
       c$r AS (SELECT cid, list_transform(mv, x -> x / sqrt(list_reduce(
           list_prepend(0.0, list_transform(range(1, 65), i -> mv[i] * mv[i])),
           (s, t) -> s + t))) AS cv
         FROM p$r)"""

  private lazy val bruteOracleSql: String =
    s"""$normCte,
       q AS (SELECT vec_id qid, nv qv FROM e WHERE vec_id < 10),
       scored AS (SELECT qid, vec_id, ${dotSql("qv", "nv")} AS sim
         FROM e CROSS JOIN q WHERE vec_id <> qid),
       ranked AS (SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rnk
         FROM scored)
       SELECT qid, rnk, vec_id, sim FROM ranked WHERE rnk <= 5
       ORDER BY qid, rnk"""

  /** The shared CTE chain of the IVF oracle down to the probed-list
    * members, parameterized on the probe budget. */
  private def ivfMembersCte(np: Int): String =
    s"""$normCte,
       c AS (SELECT vec_id cid, nv cv FROM e WHERE vec_id < 16),
       asg0 AS (SELECT e.vec_id, e.nv, c.cid, ${dotSql("e.nv", "c.cv")} AS cdot
         FROM e CROSS JOIN c),
       asg AS (SELECT vec_id, nv, cid FROM (
         SELECT vec_id, nv, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) r
         FROM asg0) WHERE r = 1),
       pr0 AS (SELECT e.vec_id qid, e.nv qv, c.cid, ${dotSql("e.nv", "c.cv")} AS cdot
         FROM e CROSS JOIN c WHERE e.vec_id < 10),
       pr AS (SELECT qid, qv, cid FROM (
         SELECT qid, qv, cid,
           row_number() OVER (PARTITION BY qid ORDER BY cdot DESC, cid) r
         FROM pr0) WHERE r <= $np),
       mem AS (SELECT pr.qid, pr.qv, asg.vec_id, asg.nv
         FROM pr JOIN asg USING (cid) WHERE asg.vec_id <> pr.qid)"""

  private def ivfOracleSqlAt(np: Int): String =
    s"""${ivfMembersCte(np)},
       scored AS (SELECT qid, vec_id, ${dotSql("qv", "nv")} AS sim FROM mem),
       ranked AS (SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rnk
         FROM scored)
       SELECT qid, rnk, vec_id, sim FROM ranked WHERE rnk <= 5
       ORDER BY qid, rnk"""

  /** (qid, n_cand) — how many vectors an nprobe-budget probe scores. */
  private def ivfCandOracleSqlAt(np: Int): String =
    s"""${ivfMembersCte(np)}
       SELECT qid, count(*)::BIGINT AS n_cand FROM mem GROUP BY qid"""

  private lazy val ivfOracleSql: String = ivfOracleSqlAt(2)

  /** normalized vectors + 16-bit hyperplane signature + 8-bit bucket —
    * the shared front of both LSH ANN oracles. */
  private lazy val lshSigCte: String =
    s"""$normCte,
       sg AS (SELECT vec_id, nv, (list_sum(list_transform(range(0, 16), p ->
           CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, 64), d ->
               ((('0x' || substr(md5(concat('h', p::VARCHAR, '_', d::VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)
                 * nv[d + 1])), (s, x) -> s + x) >= 0
             THEN (1::BIGINT << p) ELSE 0 END)))::BIGINT AS sig
         FROM e),
       b AS (SELECT vec_id, nv, sig >> 8 AS bucket FROM sg)"""

  private lazy val lshBucketedOracleSql: String =
    s"""$lshSigCte,
       pairs AS (SELECT a.vec_id qid, b2.vec_id vec_id,
           ${dotSql("a.nv", "b2.nv")} AS sim
         FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
       ranked AS (SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rnk
         FROM pairs)
       SELECT qid, rnk, vec_id, sim FROM ranked WHERE rnk <= 5
       ORDER BY qid, rnk"""

  private lazy val lshMultiprobeOracleSql: String =
    s"""$lshSigCte,
       pr AS (SELECT vec_id AS qid, nv AS qv,
                unnest(list_prepend(bucket,
                  list_transform(range(0, 8), j -> xor(bucket, 1 << j)))) AS bucket
              FROM b),
       pairs AS (SELECT pr.qid, b2.vec_id, ${dotSql("pr.qv", "b2.nv")} AS sim
         FROM pr JOIN b b2 ON pr.bucket = b2.bucket AND b2.vec_id <> pr.qid),
       ranked AS (SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rnk
         FROM pairs)
       SELECT qid, rnk, vec_id, sim FROM ranked WHERE rnk <= 5
       ORDER BY qid, rnk"""

  private lazy val pqOracleSql: String =
    s"""$normCte,
       sub AS (SELECT vec_id, j, list_slice(nv, j*8+1, j*8+8) AS sv
               FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
       cb AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < 16),
       enc0 AS (SELECT s.vec_id, s.j, c.cid,
                  round(list_reduce(list_prepend(0.0, list_transform(range(1, 9),
                    i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
                    (a, x) -> a + x), 9) AS d2
                FROM sub s JOIN cb c ON s.j = c.j),
       codes AS (SELECT vec_id, j, cid AS code FROM (
                   SELECT vec_id, j, cid,
                     row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) r
                   FROM enc0) WHERE r = 1),
       dt AS (SELECT s.vec_id AS qid, s.j, c.cid,
                round(list_reduce(list_prepend(0.0, list_transform(range(1, 9),
                  i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
                  (a, x) -> a + x), 9)::DECIMAL(20,9) AS pd
              FROM sub s JOIN cb c ON s.j = c.j WHERE s.vec_id < 10),
       sc AS (SELECT dt.qid, codes.vec_id, sum(pd) AS adist
              FROM codes JOIN dt ON codes.j = dt.j AND codes.code = dt.cid
              WHERE codes.vec_id <> dt.qid
              GROUP BY dt.qid, codes.vec_id),
       short AS (SELECT qid, vec_id FROM (
                   SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY adist, vec_id) r
                   FROM sc) WHERE r <= 50),
       rr AS (SELECT short.qid, short.vec_id,
                ${dotSql("q.nv", "x.nv")} AS sim
              FROM short
              JOIN e x ON x.vec_id = short.vec_id
              JOIN e q ON q.vec_id = short.qid),
       ranked AS (SELECT qid, vec_id, sim,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY sim DESC, vec_id) rnk
                  FROM rr)
       SELECT qid, rnk, vec_id, sim
       FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk"""

  private lazy val ivfpqOracleSql: String =
    s"""$normCte,
       c AS (SELECT vec_id cid, nv cv FROM e WHERE vec_id < 16),
       asg0 AS (SELECT e.vec_id, e.nv, c.cid, c.cv,
           ${dotSql("e.nv", "c.cv")} AS cdot
         FROM e CROSS JOIN c),
       asg AS (SELECT vec_id,
           list_transform(range(1, 65), i -> nv[i] - cv[i]) AS rv, cid
         FROM (SELECT vec_id, nv, cid, cv,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY cdot DESC, cid) r
           FROM asg0) WHERE r = 1),
       subs AS (SELECT vec_id, cid, rj.range AS j,
           rv[rj.range * 8 + 1 : rj.range * 8 + 8] AS sv
         FROM asg CROSS JOIN range(0, 8) rj),
       cb AS (SELECT vec_id ccid, j cj, sv cv8 FROM subs WHERE vec_id < 16),
       enc0 AS (SELECT s.vec_id, s.cid, s.j, cb.ccid,
           round(list_reduce(list_prepend(0.0, list_transform(range(1, 9),
             i -> (s.sv[i] - cb.cv8[i]) * (s.sv[i] - cb.cv8[i]))),
             (a, x) -> a + x), 9) AS d2
         FROM subs s JOIN cb ON s.j = cb.cj),
       codes AS (SELECT vec_id, cid, j, ccid AS code
         FROM (SELECT vec_id, cid, j, ccid,
             row_number() OVER (PARTITION BY vec_id, j
               ORDER BY d2, ccid) r
           FROM enc0) WHERE r = 1),
       pr0 AS (SELECT e.vec_id qid, e.nv qv, c.cid, c.cv,
           ${dotSql("e.nv", "c.cv")} AS cdot
         FROM e CROSS JOIN c WHERE e.vec_id < 10),
       pr AS (SELECT qid,
           list_transform(range(1, 65), i -> qv[i] - cv[i]) AS qrv, cid
         FROM (SELECT qid, qv, cid, cv,
             row_number() OVER (PARTITION BY qid
               ORDER BY cdot DESC, cid) r
           FROM pr0) WHERE r <= 2),
       qsubs AS (SELECT qid, cid, rj.range AS j,
           qrv[rj.range * 8 + 1 : rj.range * 8 + 8] AS qsv
         FROM pr CROSS JOIN range(0, 8) rj),
       dtab AS (SELECT q.qid, q.cid, q.j, cb.ccid,
           round(list_reduce(list_prepend(0.0, list_transform(range(1, 9),
             i -> (q.qsv[i] - cb.cv8[i]) * (q.qsv[i] - cb.cv8[i]))),
             (a, x) -> a + x), 9)::DECIMAL(20,9) AS pd
         FROM qsubs q JOIN cb ON q.j = cb.cj),
       adc AS (SELECT d.qid, co.vec_id, sum(d.pd) AS adist
         FROM codes co JOIN dtab d
           ON co.cid = d.cid AND co.j = d.j AND co.code = d.ccid
         WHERE co.vec_id <> d.qid
         GROUP BY d.qid, co.vec_id),
       short AS (SELECT qid, vec_id FROM (
           SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid
               ORDER BY adist, vec_id) r
           FROM adc) WHERE r <= 50),
       rr AS (SELECT short.qid, short.vec_id,
           ${dotSql("q.nv", "x.nv")} AS sim
         FROM short
         JOIN e x ON x.vec_id = short.vec_id
         JOIN e q ON q.vec_id = short.qid),
       ranked AS (SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid
             ORDER BY sim DESC, vec_id) rnk
         FROM rr)
       SELECT qid, rnk, vec_id, sim
       FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk"""

  override def oracleSql: Map[String, String] = Map(
    "q_ann_bruteforce" -> bruteOracleSql,
    "q_embed_neardup" ->
      s"""$normCte
         SELECT d1, d2, sim FROM (
           SELECT a.vec_id d1, b.vec_id d2, ${dotSql("a.nv", "b.nv")} AS sim
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         WHERE sim >= 0.4 ORDER BY d1, d2""",
    // CC replica: same recursive-CTE min-reachable-id as the text cluster
    // oracle, over the cosine pair graph
    "q_embed_clusters" ->
      s"""${normCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         vp AS (SELECT d1, d2 FROM (
           SELECT a.vec_id d1, b.vec_id d2, ${dotSql("a.nv", "b.nv")} AS sim
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
           WHERE sim >= 0.4),
         edges AS (SELECT d1 AS u, d2 AS v FROM vp UNION SELECT d2, d1 FROM vp),
         walk(node, lbl) AS (
           SELECT u, v FROM edges
           UNION
           SELECT e2.u, w.lbl FROM edges e2 JOIN walk w ON w.node = e2.v),
         cc AS (SELECT node AS vec_id, least(node, min(lbl)) AS canonical_id
                FROM walk GROUP BY node)
         SELECT vec_id, canonical_id,
                count(*) OVER (PARTITION BY canonical_id) AS cluster_size
         FROM cc ORDER BY vec_id""",
    // SemDeDup replica: identical rank-1 centroid assignment, then the
    // within-cluster pair scan + min/max rollup.
    "q_dedup_semantic" ->
      s"""$normCte,
         c AS (SELECT vec_id cid, nv cv FROM e WHERE vec_id < 16),
         asg0 AS (SELECT e.vec_id, e.nv, c.cid, ${dotSql("e.nv", "c.cv")} AS cdot
           FROM e CROSS JOIN c),
         asg AS (SELECT vec_id, nv, cid FROM (
           SELECT vec_id, nv, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) r
           FROM asg0) WHERE r = 1),
         pairs AS (SELECT b.vec_id AS vec_id, a.vec_id AS dup_of,
             ${dotSql("a.nv", "b.nv")} AS sim
           FROM asg a JOIN asg b
           ON a.cid = b.cid AND a.vec_id < b.vec_id)
         SELECT vec_id, min(dup_of) AS dup_of, max(sim) AS best_sim
         FROM pairs WHERE sim >= 0.4 GROUP BY vec_id ORDER BY vec_id""",
    "q_lsh_signatures" ->
      """SELECT vec_id, list_sum(list_transform(range(0, 16), p ->
           CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, 64), d ->
               ((('0x' || substr(md5(concat('h', p::VARCHAR, '_', d::VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)
                 * embedding[d + 1]::DOUBLE)), (s, x) -> s + x) >= 0
             THEN (1::BIGINT << p) ELSE 0 END))::BIGINT AS sig
         FROM embeddings ORDER BY vec_id""",
    // IVF replica: same 16 deterministic centroids, same rank-1 assignment
    // (round(6) cdot, cid tie-break), same 2-probe, same exact re-rank.
    "q_ann_ivf" -> ivfOracleSql,
    "q_ann_recall_matrix" ->
      s"""WITH bf AS ($bruteOracleSql),
         m_ivf AS ($ivfOracleSql),
         m_lsh AS ($lshBucketedOracleSql),
         m_lshmp AS ($lshMultiprobeOracleSql),
         m_pq AS ($pqOracleSql),
         m_ivfpq AS ($ivfpqOracleSql),
         ${Seq(1, 2, 4, 8).map(np =>
           s"np$np AS (${ivfOracleSqlAt(np)}), " +
           s"cn$np AS (${ivfCandOracleSqlAt(np)})").mkString(",\n         ")},
         u AS (
           SELECT 'ivf' AS method, qid, vec_id FROM m_ivf
           UNION ALL SELECT 'lsh', qid, vec_id FROM m_lsh
           UNION ALL SELECT 'lsh_mp', qid, vec_id FROM m_lshmp
           UNION ALL SELECT 'pq', qid, vec_id FROM m_pq
           UNION ALL SELECT 'ivfpq', qid, vec_id FROM m_ivfpq
           ${Seq(1, 2, 4, 8).map(np =>
             s"UNION ALL SELECT 'ivf_np$np', qid, vec_id FROM np$np")
             .mkString("\n           ")}),
         cands AS (
           ${Seq(1, 2, 4, 8).map(np =>
             s"SELECT 'ivf_np$np' AS method, qid, n_cand FROM cn$np")
             .mkString("\n           UNION ALL ")}),
         names AS (SELECT unnest(['ivf', 'lsh', 'lsh_mp', 'pq', 'ivfpq',
           'ivf_np1', 'ivf_np2', 'ivf_np4', 'ivf_np8']) AS method)
         SELECT n.method, bf.qid,
           round(count(u.vec_id)::DOUBLE / 5, 6) AS recall5,
           CASE WHEN n.method LIKE 'ivf_np%'
             THEN COALESCE(any_value(c.n_cand), 0) END::BIGINT AS n_cand
         FROM names n CROSS JOIN bf
         LEFT JOIN u ON u.method = n.method AND u.qid = bf.qid
           AND u.vec_id = bf.vec_id
         LEFT JOIN cands c ON c.method = n.method AND c.qid = bf.qid
         GROUP BY n.method, bf.qid ORDER BY n.method, bf.qid""",
    "q_ann_recall" ->
      s"""WITH bf AS ($bruteOracleSql),
         iv AS ($ivfOracleSql)
         SELECT bf.qid, round(count(iv.vec_id)::DOUBLE / 5, 6) AS recall5
         FROM bf LEFT JOIN iv ON iv.qid = bf.qid AND iv.vec_id = bf.vec_id
         GROUP BY bf.qid ORDER BY bf.qid""",
    // Lloyd-training replica: identical assignment, the same
    // DECIMAL(38,18)-exact per-dimension sums (one double division), same
    // ascending repack + renormalization fold — unrolled two rounds.
    "q_ann_ivf_train" ->
      s"""$normCte,
         c0 AS (SELECT vec_id AS cid, nv AS cv FROM e WHERE vec_id < 16),
         ${lloydCte(1, "c0")},
         ${lloydCte(2, "c1")}
         SELECT cid, unnest(range(0, 64)) AS i, round(unnest(cv), 6) AS val
         FROM c2 ORDER BY cid, i""",
    // LSH-bucketed replica: signatures over the NORMALIZED vectors (unlike
    // q_lsh_signatures, which signs the raw embedding), same ascending-d
    // left fold as graft_lsh16, bucket = sig >> 8.
    "q_ann_lsh_bucketed" -> lshBucketedOracleSql,
    "q_ann_lsh_multiprobe" -> lshMultiprobeOracleSql,
    // Same sg/b CTEs as q_ann_lsh_bucketed; sim is round(rawdot·1e6) —
    // mirroring the dialect's unary-ROUND pinning (NOT round(dot,6)·1e6,
    // which could differ at half-ulp boundaries) — and only the VALUE
    // multiset of the top 5 per qid is selected, which is rank-window and
    // TOPK agree on by construction.
    "q_sql_ann" ->
      s"""$normCte,
         sg AS (SELECT vec_id, nv, (list_sum(list_transform(range(0, 16), p ->
             CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, 64), d ->
                 ((('0x' || substr(md5(concat('h', p::VARCHAR, '_', d::VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)
                   * nv[d + 1])), (s, x) -> s + x) >= 0
               THEN (1::BIGINT << p) ELSE 0 END)))::BIGINT AS sig
           FROM e),
         b AS (SELECT vec_id, nv, sig >> 8 AS bucket FROM sg),
         pairs AS (SELECT a.vec_id qid, b2.vec_id vec_id,
             round(list_reduce(list_prepend(0.0,
               list_transform(range(1, 65), i -> a.nv[i] * b2.nv[i])),
               (s, t) -> s + t) * 1000000) AS sim
           FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
         ranked AS (SELECT qid, vec_id, sim,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rnk
           FROM pairs)
         SELECT qid, sim FROM ranked WHERE rnk <= 5
         ORDER BY qid, sim""",
    // PQ replicas: identical subspace slicing (1-indexed inclusive windows
    // of 8), identical ascending L2² folds, round(9) cells, rank-1 with
    // cid tie-break, and DECIMAL-exact ADC sums.
    "q_ann_pq_codes" ->
      s"""$normCte,
         sub AS (SELECT vec_id, j, list_slice(nv, j*8+1, j*8+8) AS sv
                 FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
         cb AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < 16),
         enc0 AS (SELECT s.vec_id, s.j, c.cid,
                    round(list_reduce(list_prepend(0.0, list_transform(range(1, 9),
                      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
                      (a, x) -> a + x), 9) AS d2
                  FROM sub s JOIN cb c ON s.j = c.j)
         SELECT vec_id, j, cid AS code, d2 FROM (
           SELECT vec_id, j, cid, d2,
             row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) r
           FROM enc0) WHERE r = 1
         ORDER BY vec_id, j""",
    "q_ann_pq" -> pqOracleSql,
    // PQ codebook training: 2 Lloyd rounds per subspace (same exactness
    // discipline as the IVF trainer's oracle, keyed by (j, cid))
    "q_ann_pq_train" ->
      s"""$normCte,
         sub AS (SELECT vec_id, rj.range AS j,
             nv[rj.range * 8 + 1 : rj.range * 8 + 8] AS sv
           FROM e CROSS JOIN range(0, 8) rj),
         c0 AS (SELECT j, vec_id cid, sv cv FROM sub WHERE vec_id < 16),
         ${pqLloydCte(1, "c0")},
         ${pqLloydCte(2, "c1")}
         SELECT j::BIGINT AS j, cid::BIGINT AS cid, (i - 1)::BIGINT AS i,
           round(x, 6) AS val
         FROM (SELECT j, cid, unnest(cv) AS x, unnest(range(1, 9)) AS i
               FROM c2)
         ORDER BY j, cid, i""",
    // IVF-PQ: coarse assign → residuals → residual-codebook PQ codes →
    // probe 2 lists → per-list query-residual ADC → top-50 → exact re-rank
    "q_ann_ivfpq" -> ivfpqOracleSql,
    "q_sql_quantize" ->
      """WITH v AS (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
         s AS (SELECT vec_id, v, list_min(v) AS mn,
                 (list_max(v) - list_min(v)) / 255.0 AS scale
               FROM v),
         q AS (SELECT vec_id,
                 list_transform(v, x -> CASE WHEN scale = 0 THEN 0::BIGINT
                   ELSE CAST(round((x - mn) / scale, 0) AS BIGINT) END) AS codes
               FROM s)
         SELECT vec_id, list_sum(codes)::BIGINT AS code_sum,
           list_min(codes)::BIGINT AS code_min,
           list_max(codes)::BIGINT AS code_max,
           len(codes)::BIGINT AS n
         FROM q ORDER BY vec_id""",
    "q_embed_quantize" ->
      """WITH v AS (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
         s AS (SELECT vec_id, v, list_min(v) AS mn,
                 (list_max(v) - list_min(v)) / 255.0 AS scale
               FROM v),
         q AS (SELECT vec_id, v, mn, scale,
                 list_transform(v, x -> CASE WHEN scale = 0 THEN 0::BIGINT
                   ELSE CAST(round((x - mn) / scale, 0) AS BIGINT) END)
                   AS codes,
                 list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                   ELSE (x - (mn + round((x - mn) / scale, 0) * scale))
                      * (x - (mn + round((x - mn) / scale, 0) * scale)) END)
                   AS sqerr
               FROM s)
         SELECT vec_id, round(mn, 6) AS mn, round(scale, 9) AS scale,
           list_sum(codes)::BIGINT AS code_sum,
           md5(array_to_string(codes, ',')) AS codes_fp,
           round(list_reduce(list_prepend(0.0, sqerr), (a, e) -> a + e)
             / len(v), 12) AS mse
         FROM q ORDER BY vec_id"""
  )
}
