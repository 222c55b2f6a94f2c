package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._
import graft.functions.Vectors

/** Similarity search over embedding columns.
  *
  * Two paths, one API shape:
  *  - `bruteForceTopK` — exact cosine top-k: broadcast the (small) probe
  *    set against the corpus scan, rank per probe. The corpus is read
  *    once, never shuffled; per-probe ranking shuffles only
  *    (probe × corpus-partition) partial top-k rows. This is the
  *    correctness baseline and the oracle-checked query.
  *  - `lshTopK` — the 100 TB path: random-hyperplane LSH with L
  *    independent tables of b bits. Candidates come from an equi-join on
  *    (table, bucket) — no cross join anywhere — then exact cosine
  *    re-ranking of the candidate set. Recall is tunable via (L, b);
  *    hyperplanes are deterministic (seeded MurmurHash3), so results are
  *    reproducible across runs and clusters.
  */
object Similarity {

  /** Deterministic pseudorandom hyperplanes: component (t,b,i) from
    * MurmurHash3 → [-1, 1). No RNG state, identical on every executor. */
  def hyperplanes(tables: Int, bits: Int, dim: Int): Seq[Seq[Array[Double]]] =
    (0 until tables).map { tb =>
      (0 until bits).map { b =>
        Array.tabulate(dim) { i =>
          val h = scala.util.hashing.MurmurHash3
            .productHash((tb, b, i), seed = 42)
          (h.toDouble / Int.MaxValue)
        }
      }
    }

  /** Bucket id for one LSH table: sign bits of `bits` hyperplane dots. */
  def bucketId(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, k) =>
      when(Vectors.dot(v, lit(p)) > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact top-k neighbors for each probe vector. Norms are computed
    * once per corpus row / per probe; the pair loop is one codegen'd
    * dot product. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.withColumn("vn", Vectors.norm(col("v")))
    val p = probes.withColumn("qn", Vectors.norm(col("qv")))
    val cos = Vectors.dot(col("qv"), col("v")) / (col("qn") * col("vn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(p), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** LSH table/bit defaults. The recall/cost trade: a pair at cosine τ
    * collides per b-bit table with probability (1 − acos(τ)/π)^b, and
    * expected bucket size is corpus/2^b — more bits = smaller buckets
    * but lower per-table recall, compensated with more tables or with
    * MULTIPROBE (also read the `bits` buckets at Hamming distance 1 per
    * table — probe-side cost only, the corpus index is untouched; one
    * flipped sign bit is by far the likeliest miss, so each probed
    * neighbor bucket behaves like an extra table). History: 8×8 plain
    * measured recall 0.24, 24×6 plain 0.78/0.74 at sf0.01/sf0.1 and
    * 1.31 s in bench; 12×6 multiprobe measures ≥ 0.9 with HALF the
    * corpus-side banding rows. At 100 TB raise `bits` with
    * log₂(corpus) to keep buckets bounded and add tables / probes to
    * buy recall back. */
  val Tables = 12
  val Bits = 6

  /** ANN top-k: LSH candidate generation + exact re-rank. Bucket ids
    * come from ONE [[graft.functions.LshBuckets]] expression per row
    * (the composed per-table/per-bit DotProduct formulation — kept
    * below as [[bucketId]] for the equivalence spec — spent its time
    * Janino-compiling 64 expressions). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      tables: Int = Tables, bits: Int = Bits, dim: Int = 64,
      multiprobe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    // dim must equal the embedding dimensionality: shorter hyperplanes
    // would silently bucket on a prefix of the vector
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec), posexplode(GraftBridge.column(
          graft.functions.LshBuckets(
            GraftBridge.expression(col(vec)), tables, bits, dim))))
        .select(col(id), col(vec), col("pos").as("tb"), col("col").as("bk"))
    val c = banded(corpus, "vec_id", "v")
    val p0 = banded(probes, "query_id", "qv")
    val p = if (!multiprobe) p0 else {
      // probe bucket + its `bits` Hamming-1 neighbors (mask 0 = self)
      val masks = array((0 +: (0 until bits).map(1 << _)).map(lit(_)): _*)
      p0.select(col("query_id"), col("qv"), col("tb"),
        explode(transform(masks, m => col("bk").bitwiseXOR(m))).as("bk"))
    }
    val cands = p.join(c, Seq("tb", "bk"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands
      .withColumn("cos", Vectors.dot(col("qv"), col("v")) /
        (Vectors.norm(col("qv")) * Vectors.norm(col("v"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  val IvfClusters = 16
  val IvfProbes = 4
  /** Rows used to fit IVF centroids: above this, k-means trains on a
    * seeded random sample so the fit cost stops scaling with the corpus
    * (centroid QUALITY needs a representative sample, not every row —
    * recall is the only thing affected, never the exact re-ranked
    * scores). 100k rows × 64 dims ≈ 50 MB, comfortably one executor. */
  val IvfFitSampleCap = 100000L

  /** IVF (inverted-file) ANN: cluster the corpus once (seeded k-means →
    * deterministic), assign every vector to its nearest centroid, and
    * at query time search only the `nprobe` clusters whose centroids
    * are closest to the probe. At 100 TB the centroid table is tiny and
    * broadcast; the corpus is partitioned by cluster id so a probe
    * touches nprobe/k of the data. Exact cosine re-rank inside the
    * probed clusters keeps returned scores identical to brute force. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      clusters: Int = IvfClusters, nprobe: Int = IvfProbes): DataFrame = {
    val (assigned, centDf) = ivfFit(corpus, clusters)
    ivfSearch(assigned, centDf, probes, k, nprobe)
  }

  /** Simplified (centroid-based) silhouette of the IVF clustering —
    * the monitoring number that says whether the partition actually
    * separates the corpus: a(i) = distance to own centroid, b(i) =
    * distance to the nearest OTHER centroid, s = (b−a)/max(a,b).
    * One pass over the corpus × a broadcast |clusters|-row centroid
    * table (k distances per row, min-reduced per vector) — never the
    * O(n²) pairwise silhouette; per-cluster means decimal-summed.
    * Rows-only (the k-means fit has no DuckDB twin); the spec plants
    * separated vs. split blobs and checks the score orders them. */
  def silhouetteIvf(corpus: DataFrame,
      clusters: Int = IvfClusters): DataFrame = {
    val (assigned, centDf) = ivfFit(corpus, clusters)
    val dists = assigned
      .crossJoin(broadcast(centDf.select(col("cluster").as("cid"),
        col("centroid"))))
      .withColumn("dist", sqrt(aggregate(
        zip_with(col("v"), col("centroid"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)))
    dists.groupBy(col("vec_id"), col("cluster"))
      .agg(min(when(col("cid") === col("cluster"), col("dist"))).as("a"),
        min(when(col("cid") =!= col("cluster"), col("dist"))).as("b"))
      .withColumn("s", when(greatest(col("a"), col("b")) > 0,
        (col("b") - col("a")) / greatest(col("a"), col("b")))
        .otherwise(lit(0.0)))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(davg(col("s")), 6)
        .as("mean_silhouette"))
      .orderBy(col("cluster"))
  }

  /** The build stage: seeded k-means → (assignments, centroid table). */
  private def ivfFit(corpus: DataFrame,
      clusters: Int): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // carry v through fit/transform: k-means iterates over this input
    // (cache it), and keeping v avoids a join back to the corpus
    val projected = corpus.select(col("vec_id"), col("v"),
      array_to_vector(col("v")).as("features"))
    // fit on a bounded sample: the count is one columnar-scan job, and
    // past the cap the 4 k-means passes run over ≤ IvfFitSampleCap rows
    // instead of the whole corpus
    val n = projected.count()
    val train = (if (n > IvfFitSampleCap)
        projected.sample(withReplacement = false,
          IvfFitSampleCap.toDouble / n, seed = 42L)
      else projected)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // random init (1 pass) + few iterations: centroid quality only
    // shifts which clusters a probe visits (recall), never the exact
    // re-ranked scores; k-means|| init alone costs ~5 extra jobs
    val model = new KMeans().setK(clusters).setSeed(42L)
      .setInitMode("random").setMaxIter(4).fit(train)
    // fit is eager — release the cache now rather than leak one pinned
    // dataset per invocation; the single assignment pass below simply
    // recomputes the projection from the source
    train.unpersist(blocking = false)
    val assigned = model.transform(projected)
      .select(col("vec_id"), col("prediction").as("cluster"), col("v"))
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray)
    }.toSeq
    (assigned, spark.createDataFrame(centroids).toDF("cluster", "centroid"))
  }

  /** Build the IVF index ONCE and persist it — the build-once /
    * probe-many lifecycle of production vector search (the in-session
    * [[ivfTopK]] refits per query; this amortizes the fit across every
    * future probe batch). Assignments are written PARTITIONED BY
    * cluster, so a probe that visits nprobe of `clusters` partitions
    * reads nprobe/clusters of the index bytes — partition pruning is
    * the on-disk analogue of the inverted file. */
  def ivfIndexBuild(corpus: DataFrame, path: String,
      clusters: Int = IvfClusters): Unit = {
    val (assigned, centDf) = ivfFit(corpus, clusters)
    assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assignments")
    centDf.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a persisted IVF index. Identical output contract to
    * [[ivfTopK]] (same seed + params → identical rows, asserted in
    * OpsSpec). The cluster restriction reaches the scan through the
    * probe-clusters join, so actual file skipping is runtime behavior
    * (broadcast join / dynamic partition pruning); the cluster-
    * partitioned layout locked in PlanSpec is what makes that pruning
    * available — a probe batch restricted to a literal cluster set
    * reads only the matching directories. */
  def ivfIndexProbe(s: SparkSession, path: String, probes: DataFrame,
      k: Int, nprobe: Int = IvfProbes): DataFrame = {
    val assigned = s.read.parquet(s"$path/assignments")
    val centDf = s.read.parquet(s"$path/centroids")
    ivfSearch(assigned, centDf, probes, k, nprobe)
  }

  /** The probe stage shared by the in-session [[ivfTopK]] and the
    * persisted-index [[ivfIndexProbe]]: nprobe nearest centroids per
    * probe (centroid table broadcast), candidates from ONLY those
    * clusters, exact cosine re-rank. */
  private def ivfSearch(assigned: DataFrame, centDf: DataFrame,
      probes: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probeClusters = probes.crossJoin(broadcast(centDf))
      .withColumn("cd", Vectors.l2sq(col("qv"), Vectors.toDouble(col("centroid"))))
      .withColumn("cr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cd"), col("cluster"))))
      .filter(col("cr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val cands = probeClusters.join(assigned, "cluster")
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands
      .withColumn("cos", Vectors.dot(col("qv"), col("v")) /
        (Vectors.norm(col("qv")) * Vectors.norm(col("v"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  // Defaults picked by a seeded parameter sweep against the real
  // embeddings table (recall of top-5 vs brute force at sf0.01):
  // (m=8,k=16,cand=50) → 0.72; (m=16,k=16,cand=50) → 0.88;
  // (m=16,k=16,cand=100) → 0.97. Finer subspaces beat more centroids
  // at equal code budget, and the 100-row shortlist is still only
  // |probes|·100 re-rank rows.
  val PqM = 16           // subspaces (64-dim → 16 sub-vectors of 4 dims)
  val PqK = 16           // centroids per subspace codebook (codes 0..15)
  val PqCandidates = 100 // ADC shortlist size before the exact re-rank

  /** Codebook training sample bound: 20k × 64 doubles ≈ 10 MB on the
    * driver, and Lloyd over it is sub-second. k=16 centroids per 4-dim
    * subspace saturate well below this. */
  val PqTrainSampleCap = 20000L

  /** Product-quantization codebooks: seeded k-means of [[PqK]]
    * centroids per sub-vector slice, trained DRIVER-LOCAL on a seeded
    * sample of ≤ [[PqTrainSampleCap]] rows. Codebook training is a
    * bounded-size model fit — the distributed cost is ONE sample scan
    * regardless of corpus size; fitting m tiny k-means problems as m
    * sequential Spark-ML jobs paid m× job-scheduling latency for no
    * parallelism (measured 40+ s of a 46 s query at sf0.1). The
    * collected sample is sorted before init so the codebook does not
    * depend on partition/collect order. The whole codebook is
    * m·k·(dim/m) = dim·k doubles (8 KB here) — it travels to executors
    * as a LITERAL inside the encode/probe expressions, no join, no
    * broadcast machinery. */
  def pqTrain(corpus: DataFrame, m: Int = PqM, k: Int = PqK,
      dim: Int = 64): Array[Array[Array[Double]]] = {
    val d = dim / m
    val n = corpus.count()
    val sample: Array[Array[Double]] =
      (if (n > PqTrainSampleCap)
         corpus.sample(withReplacement = false,
           PqTrainSampleCap.toDouble / n, seed = 42L)
       else corpus)
        .select(col("v")).collect()
        .map(_.getSeq[Double](0).toArray)
    // partition-order-independent: lexicographic sort of the sample
    val lex = new Ordering[Array[Double]] {
      def compare(a: Array[Double], b: Array[Double]): Int = {
        var i = 0
        while (i < a.length && i < b.length) {
          val c = java.lang.Double.compare(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    }
    java.util.Arrays.sort(sample, lex)
    Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * d, j * d + d))
      val rnd = new scala.util.Random(42L + j)
      val cent = Array.tabulate(k)(_ => pts(rnd.nextInt(pts.length)).clone)
      for (_ <- 1 to 4) {
        val sums = Array.fill(k, d)(0.0)
        val cnts = Array.fill(k)(0L)
        pts.foreach { p =>
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < k) {
            var s = 0.0; var t = 0
            while (t < d) { val f = p(t) - cent(c)(t); s += f * f; t += 1 }
            if (s < bd) { bd = s; best = c }
            c += 1
          }
          cnts(best) += 1
          var t = 0
          while (t < d) { sums(best)(t) += p(t); t += 1 }
        }
        for (c <- 0 until k if cnts(c) > 0; t <- 0 until d)
          cent(c)(t) = sums(c)(t) / cnts(c)
      }
      cent
    }
  }

  private def cbLiteral(cb: Array[Array[Array[Double]]]): Column =
    typedlit(cb.map(_.map(_.toSeq).toSeq).toSeq)

  /** PQ-encode a vector: per subspace, the index of the nearest codebook
    * centroid (ties → lowest code). One codegen'd expression — at 100 TB
    * this is the map-only pass that turns a 256-byte float vector into
    * m bytes; the corpus is read once and never shuffled. */
  def pqEncode(v: Column, cb: Array[Array[Array[Double]]]): Column = {
    val (m, k, d) = (cb.length, cb(0).length, cb(0)(0).length)
    val lit_cb = cbLiteral(cb)
    transform(sequence(lit(0), lit(m - 1)), j =>
      aggregate(sequence(lit(0), lit(k - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(0).as("c")),
        (acc, c) => {
          val dist = Vectors.l2sq(slice(v, j * d + 1, lit(d)),
            element_at(element_at(lit_cb, j + 1), c + 1))
          when(dist < acc.getField("d"),
            struct(dist.as("d"), c.as("c"))).otherwise(acc)
        },
        acc => acc.getField("c")))
  }

  /** Per-query ADC distance table: dtab[j][c] = ‖q_sub_j − cb[j][c]‖².
    * Computed once per PROBE row (m·k·d multiplications on the tiny
    * probe side); the corpus-side scan then prices each candidate with
    * m table lookups instead of a dim-length dot product. */
  def pqDistTable(qv: Column, cb: Array[Array[Array[Double]]]): Column = {
    val (m, k, d) = (cb.length, cb(0).length, cb(0)(0).length)
    val lit_cb = cbLiteral(cb)
    transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(k - 1)), c =>
        Vectors.l2sq(slice(qv, j * d + 1, lit(d)),
          element_at(element_at(lit_cb, j + 1), c + 1))))
  }

  /** Asymmetric-distance PQ search: train codebooks, encode the corpus
    * to m-byte codes, scan CODES ONLY against each probe's broadcast
    * distance table, shortlist [[PqCandidates]] by ADC, then join the
    * raw vectors back BY ID for an exact cosine re-rank of the
    * shortlist. The scan side touches (id, codes) — 16 nibble codes vs
    * a 256-byte float vector, a 16–32× memory/IO reduction at 100 TB,
    * which is the entire point of PQ; raw vectors are read only for
    * |probes|·kCand candidate rows. Returned scores are exact cosines
    * (approximation affects recall only — audited by
    * `audit_pq_recall`, 0.97 at sf0.01 with the default settings). */
  def pqTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      m: Int = PqM, kk: Int = PqK, kCand: Int = PqCandidates,
      dim: Int = 64): DataFrame = {
    val cb = pqTrain(corpus, m, kk, dim)
    // Q.spread: pqEncode (m·k·d flops through interpreted higher-order
    // array lambdas) and the per-candidate ADC pricing below both run
    // inside the one-row-group corpus scan task otherwise; the encode
    // is per-row-deterministic and the shortlist/rank windows carry
    // full tie-breaks, so the exchange cannot change the answer. The
    // TRAIN path above stays unspread: its seeded sample depends on
    // partitioning, and the codebook must not move.
    val codes = Q.spread(corpus)
      .select(col("vec_id"), pqEncode(col("v"), cb).as("codes"))
    val pr = probes.select(col("query_id"),
      pqDistTable(col("qv"), cb).as("dtab"))
    val adc = codes.crossJoin(broadcast(pr))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, j) => acc + element_at(element_at(col("dtab"), j + 1),
          element_at(col("codes"), j + 1) + 1)))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("vec_id"))
    val shortlist = adc
      .withColumn("ar", row_number().over(wA)).filter(col("ar") <= kCand)
      .select(col("query_id"), col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(corpus, "vec_id")
      .join(probes, "query_id")
      .withColumn("cos", Vectors.dot(col("qv"), col("v")) /
        (Vectors.norm(col("qv")) * Vectors.norm(col("v"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** IVF-PQ: the two approximations composed the way production vector
    * indexes compose them — IVF decides WHICH partitions are scanned
    * (nprobe/clusters of the corpus), PQ decides WHAT is scanned
    * (m-byte codes instead of raw vectors). Codebooks are trained on
    * RESIDUALS v − centroid(v): within a cluster the residual cloud is
    * centered and much tighter than the raw corpus, so the same 4-bit
    * codes carry more precision (the classic IVFADC layout). At query
    * time each (probe, probed-cluster) pair gets its own ADC table from
    * the probe's residual against that cluster's centroid — nprobe
    * small tables per probe, probe-side cost only. Shortlist by ADC,
    * then exact cosine re-rank by id join, so returned scores are
    * exact; recall is the only approximation (audited below). With
    * nprobe = clusters and an unbounded shortlist this degenerates to
    * exact brute force — the OpsSpec equivalence. */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      clusters: Int = IvfClusters, nprobe: Int = IvfProbes,
      m: Int = PqM, kk: Int = PqK, kCand: Int = PqCandidates,
      dim: Int = 64): DataFrame = {
    val (assigned, centDf) = ivfFit(corpus, clusters)
    // residual frame, named v so pqTrain/pqEncode see their contract
    val resid = assigned.join(broadcast(centDf), "cluster")
      .select(col("vec_id"), col("cluster"),
        zip_with(col("v"), Vectors.toDouble(col("centroid")),
          (a, b) => a - b).as("v"))
    val cb = pqTrain(resid, m, kk, dim)
    val codes = resid.select(col("vec_id"), col("cluster"),
      pqEncode(col("v"), cb).as("codes"))
    // nprobe nearest centroids per probe, centroid kept for the
    // residual ADC table; probe side stays broadcast-sized
    val pc = probes.crossJoin(broadcast(centDf))
      .withColumn("cd",
        Vectors.l2sq(col("qv"), Vectors.toDouble(col("centroid"))))
      .withColumn("cr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cd"), col("cluster"))))
      .filter(col("cr") <= nprobe)
      .withColumn("qresid", zip_with(col("qv"),
        Vectors.toDouble(col("centroid")), (a, b) => a - b))
      .select(col("query_id"), col("cluster"),
        pqDistTable(col("qresid"), cb).as("dtab"))
    val adc = codes.join(broadcast(pc), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, j) => acc + element_at(element_at(col("dtab"), j + 1),
          element_at(col("codes"), j + 1) + 1)))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("vec_id"))
    val shortlist = adc
      .withColumn("ar", row_number().over(wA)).filter(col("ar") <= kCand)
      .select(col("query_id"), col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(corpus, "vec_id")
      .join(probes, "query_id")
      .withColumn("cos", Vectors.dot(col("qv"), col("v")) /
        (Vectors.norm(col("qv")) * Vectors.norm(col("v"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Approximation-quality audit: fraction of the exact top-k
    * (query, neighbor) pairs the approximate result also returned.
    * Deterministic (seeded hyperplanes / seeded k-means), so the driver
    * can track recall per round as a first-class query result instead
    * of a spec-only property. */
  def recallVsBruteForce(approx: DataFrame, exact: DataFrame): DataFrame = {
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"))
    val matched = a.join(e, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_matched"))
    val total = e.agg(count(lit(1)).as("n_exact"))
    total.crossJoin(matched) // two 1-row aggregates
      // n_exact = 0 would make recall NULL (x/0) and the audit row
      // ambiguous — report 1.0 explicitly: nothing to find, nothing missed
      .select(col("n_exact"), col("n_matched"),
        when(col("n_exact") === 0, lit(1.0)).otherwise(
          round(col("n_matched").cast(DoubleType) / col("n_exact"), 4))
          .as("recall"))
  }

  /** Majority-vote label per probe from a (query_id, neighbor_id, …)
    * neighbor list (ties → smaller label). */
  private def knnPredictions(e: DataFrame, nn: DataFrame): DataFrame = {
    val votes = nn
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel")), "neighbor_id")
      .groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("nlabel"))
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("nlabel").as("pred_label"))
  }

  /** Confusion counts of predicted vs true labels. */
  private def knnConfusion(e: DataFrame, nn: DataFrame): DataFrame =
    knnPredictions(e, nn)
      .join(e.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), "query_id")
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_label"), col("pred_label"))

  private def corpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))

  /** Deterministic PLANTED-CLUSTER fixture derived from the embeddings
    * table: vector i = 2·centroid(vec_id mod k) + original_i, with
    * unit-norm seeded pseudo-random centroids (MurmurHash3 over
    * (cluster, dim), the [[hyperplanes]] generator family). The
    * originals are unit vectors with pair cosines ~N(0, 1/64), so
    * within-cluster cosine lands ≈ A²/(A²+1) = 0.8 and cross-cluster
    * ≈ 0.8·(cᵢ·cⱼ) ≈ ±0.1 — a corpus the IVF partition CAN separate.
    * Purpose (r13 verdict ask 3): on the near-structureless shipped
    * embeddings, IVF recall is bounded by the nprobe/k scan fraction
    * (frozen at 0.58/0.66), so the audit measured the FIXTURE, not the
    * index; on this derivation a working index must reach ≈1.0 recall
    * at nprobe = 4 of 16 and a broken one cannot, so the audit floor
    * (≥ 0.9, OpsSpec) is a real measurement of cluster routing.
    * Pure per-row column ops (one zip_with over a literal centroid
    * matrix) — no UDF, no shuffle. */
  private[ops] def clusteredCorpus(s: SparkSession, dir: String): DataFrame = {
    val cents: Seq[Array[Double]] = (0 until IvfClusters).map { g =>
      val raw = Array.tabulate(64) { i =>
        scala.util.hashing.MurmurHash3.productHash((g, i), seed = 7)
          .toDouble / Int.MaxValue
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ * 2.0 / nrm) // A = 2 pre-applied
    }
    val centArr = array(cents.map(a => array(a.map(lit(_)): _*)): _*)
    corpus(s, dir).select(col("vec_id"),
      zip_with(
        element_at(centArr,
          (col("vec_id") % IvfClusters).cast(IntegerType) + 1),
        col("v"), (c, x) => c + x).as("v"))
  }

  private def labeled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))

  private def probes(c: DataFrame): DataFrame =
    c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  /** Mean-centered embedding vectors. Per-dim means come from EXACT
    * DECIMAL(18,6) sums (one IEEE division each — deterministic and
    * reproducible cell-for-cell in the DuckDB oracle); the 64 means are
    * a collected literal (statistics, not data — same driver-scalar
    * class as the bench's one-row aggregates). */
  private def centeredVecs(s: SparkSession, dir: String): DataFrame = {
    val vdf = t(s, dir, "embeddings")
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val stats = vdf.select(posexplode(col("v")))
      .groupBy(col("pos"))
      .agg(sum(col("col").cast(DecimalType(18, 6))).as("sm"),
        count(lit(1)).as("n"))
      .collect()
    val means = stats.sortBy(_.getInt(0))
      .map(r => r.getDecimal(1).doubleValue() / r.getLong(2))
    val meanArr = array(means.map(lit(_)): _*)
    vdf.select(col("vec_id"),
      zip_with(col("v"), meanArr, (x, m) => x - m).as("c"))
  }

  /** Spec hook: the centered-vector frame (OpsSpec cross-checks GramAgg
    * against the oracle-checked probe on it). */
  private[ops] def centeredForSpec(s: SparkSession, dir: String): DataFrame =
    centeredVecs(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact cosine top-5 for 10 probe vectors (oracle-checked)
    "sim_topk_bruteforce" -> { (s, dir) =>
      val c = corpus(s, dir)
      bruteForceTopK(c, probes(c), 5)
        .orderBy(col("query_id"), col("rank"))
    },
    // Matryoshka truncation eval (Kusupati et al. 2022): how much
    // top-1 retrieval quality survives keeping only the first k of 64
    // dims — the measurement that licenses shipping 8× cheaper vectors.
    // Per probe × k ∈ {8,16,32,64}: the truncated-metric argmax
    // neighbor, its agreement with the full-metric pick, and its
    // FULL-metric cosine (the honest quality of the cheap pick). Runs
    // on the bounded probe sample by design (eval, not serving):
    // probes broadcast against one corpus scan, the per-(probe, k)
    // argmax is a bounded window, output is |k| rows. Strict-fold
    // cosines on both engines → identical doubles → identical argmax
    // with the (cos DESC, id) tie-break.
    "sim_matryoshka_eval" -> { (s, dir) =>
      val c = corpus(s, dir)
      val base = c.crossJoin(broadcast(probes(c)))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos_full", Vectors.cosine(col("qv"), col("v")))
      val exploded = base.select(col("query_id"), col("vec_id"),
          col("cos_full"), col("qv"), col("v"),
          explode(array(Seq(8, 16, 32, 64).map(lit): _*)).as("k"))
        .withColumn("cos_k", Vectors.cosine(
          slice(col("qv"), lit(1), col("k")),
          slice(col("v"), lit(1), col("k"))))
      val w = Window.partitionBy(col("query_id"), col("k"))
        .orderBy(col("cos_k").desc, col("vec_id"))
      val picks = exploded.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("k"), col("vec_id").as("pick_id"),
          col("cos_full").as("pick_cos_full"))
      val full = picks.filter(col("k") === 64)
        .select(col("query_id"), col("pick_id").as("full_pick"))
      picks.join(full, "query_id")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_probes"),
          round(sum((col("pick_id") === col("full_pick"))
            .cast(IntegerType)).cast(DoubleType) / count(lit(1)), 6)
            .as("top1_agreement"),
          round(davg(col("pick_cos_full")), 6).as("mean_full_cosine"))
        .orderBy(col("k"))
    },

    // ANN via random-hyperplane LSH + exact re-rank (recall < 1 by
    // design → not oracle-expressible; rows-only check)
    "sim_topk_lsh" -> { (s, dir) =>
      val c = corpus(s, dir)
      lshTopK(c, probes(c), 5)
        .orderBy(col("query_id"), col("rank"))
    },
    // ANN via product quantization: m-byte codes + ADC shortlist +
    // exact re-rank (seeded codebooks → deterministic; recall < 1 by
    // design → rows-only, audited below)
    "sim_topk_pq" -> { (s, dir) =>
      val c = corpus(s, dir)
      pqTopK(c, probes(c), 5)
        .orderBy(col("query_id"), col("rank"))
    },
    "audit_pq_recall" -> { (s, dir) =>
      val c = corpus(s, dir)
      recallVsBruteForce(pqTopK(c, probes(c), 5),
        bruteForceTopK(c, probes(c), 5))
    },
    // codec quality: mean squared quantization error per dimension of
    // the PQ reconstruction — the per-round distortion number that
    // tells you whether the codebooks still fit the corpus
    "audit_pq_distortion" -> { (s, dir) =>
      val c = corpus(s, dir)
      val cb = pqTrain(c)
      val d = 64 / cb.length
      val recon = flatten(transform(col("codes"), (code, j) =>
        element_at(element_at(cbLiteral(cb), j + 1), code + 1)))
      c.select(col("v"), pqEncode(col("v"), cb).as("codes"))
        .withColumn("se", Vectors.l2sq(col("v"), recon))
        .agg(count(lit(1)).as("n_vecs"),
          round(davg(col("se")) / lit(d * cb.length), 6).as("mse_per_dim"))
    },
    // ANN via IVF-PQ (nprobe cluster pruning + residual-PQ ADC
    // shortlist + exact re-rank — the production composite; recall < 1
    // by design → rows-only, audited below; OpsSpec proves the
    // no-pruning configuration degenerates to exact brute force)
    "sim_topk_ivfpq" -> { (s, dir) =>
      val c = corpus(s, dir)
      ivfPqTopK(c, probes(c), 5)
        .orderBy(col("query_id"), col("rank"))
    },
    // recall on the PLANTED-CLUSTER fixture (r14): on the shipped
    // near-structureless embeddings this audit was bounded by the
    // nprobe/k scan fraction (0.58/0.66 frozen in AUDITS_r13) and
    // could not tell a working index from a broken one; on
    // clusteredCorpus a working IVF routes each probe to its planted
    // cluster and recall must clear the ≥ 0.9 floor (OpsSpec)
    "audit_ivfpq_recall" -> { (s, dir) =>
      val c = clusteredCorpus(s, dir)
      recallVsBruteForce(ivfPqTopK(c, probes(c), 5),
        bruteForceTopK(c, probes(c), 5))
    },
    // ANN via IVF (seeded k-means clusters + nprobe search; recall < 1
    // by design → rows-only check, subset property in OpsSpec)
    "sim_topk_ivf" -> { (s, dir) =>
      val c = corpus(s, dir)
      ivfTopK(c, probes(c), 5)
        .orderBy(col("query_id"), col("rank"))
    },
    // cluster-quality monitor for the IVF partition (rows-only — the
    // seeded k-means fit has no DuckDB twin; OpsSpec locks semantics
    // on planted blobs)
    "sim_silhouette_ivf" -> { (s, dir) =>
      silhouetteIvf(corpus(s, dir))
    },
    // the persisted-index lifecycle: build (fit + partitioned write)
    // then probe from disk — same params as sim_topk_ivf, so the
    // output is identical (OpsSpec-asserted); rows-only like it
    "sim_ivf_index_probe" -> { (s, dir) =>
      val c = corpus(s, dir)
      // per-run unique dir: a fixed path raced concurrent runs against
      // the same data dir (one run's overwrite deleting parquet files
      // mid-scan of the other) and never cleaned up; the temp dir is
      // deleted once the (50-row) probe result is materialized
      val path = java.nio.file.Files
        .createTempDirectory("graft_ivf").toString
      ivfIndexBuild(c, path)
      val out = ivfIndexProbe(s, path, probes(c), 5)
        .orderBy(col("query_id"), col("rank"))
        .localCheckpoint()
      graft.Util.rmrf(new java.io.File(path))
      out
    },
    // kNN label evaluation (the embeddings table carries a label):
    // 5-NN by cosine for every vector, majority vote (ties → smaller
    // label), confusion counts against the true label — the
    // embedding-quality eval step of a vector pipeline. This is the
    // EXACT anchor: all-pairs (broadcast every probe), small-scale only;
    // sim_knn_label_acc_ann below is the scale path.
    "sim_knn_label_acc" -> { (s, dir) =>
      val e = labeled(s, dir)
      val nn = bruteForceTopK(e.select(col("vec_id"), col("v")),
        e.select(col("vec_id").as("query_id"), col("v").as("qv")), 5)
      knnConfusion(e, nn)
    },
    // the 100 TB form of the same eval: candidates from the multiprobe
    // LSH band equi-join instead of an all-pairs broadcast, exact
    // cosine re-rank, same vote. Rows-only (ANN recall < 1 can flip a
    // vote); audit_knn_ann_agreement tracks per-probe agreement with
    // the exact anchor.
    "sim_knn_label_acc_ann" -> { (s, dir) =>
      val e = labeled(s, dir)
      val nn = lshTopK(e.select(col("vec_id"), col("v")),
        e.select(col("vec_id").as("query_id"), col("v").as("qv")), 5)
      knnConfusion(e, nn)
    },
    // fraction of probes whose ANN-kNN majority label equals the exact
    // anchor's (rows-only by design — this IS the measurement)
    "audit_knn_ann_agreement" -> { (s, dir) =>
      val e = labeled(s, dir)
      val c = e.select(col("vec_id"), col("v"))
      val p = e.select(col("vec_id").as("query_id"), col("v").as("qv"))
      val exact = knnPredictions(e, bruteForceTopK(c, p, 5))
        .withColumnRenamed("pred_label", "exact_label")
      val ann = knnPredictions(e, lshTopK(c, p, 5))
        .withColumnRenamed("pred_label", "ann_label")
      exact.join(ann, Seq("query_id"), "left")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("ann_label") === col("exact_label"), 1L)
            .otherwise(0L)).as("n_agree"))
        .select(col("n_queries"), col("n_agree"),
          round(col("n_agree").cast(DoubleType) / col("n_queries"), 4)
            .as("agreement"))
    },
    // recall audits (rows-only by design — recall < 1 is expected and
    // the point is to TRACK it): LSH and IVF top-k vs brute force
    "audit_sim_lsh_recall" -> { (s, dir) =>
      val c = corpus(s, dir)
      recallVsBruteForce(lshTopK(c, probes(c), 5),
        bruteForceTopK(c, probes(c), 5))
    },
    // planted-cluster fixture since r14 — see audit_ivfpq_recall
    "audit_sim_ivf_recall" -> { (s, dir) =>
      val c = clusteredCorpus(s, dir)
      recallVsBruteForce(ivfTopK(c, probes(c), 5),
        bruteForceTopK(c, probes(c), 5))
    },
    // the frozen recall-vs-nprobe curve on the SAME fixture: recall
    // must rise monotonically to 1.0 at nprobe = k (no pruning =
    // exact, OpsSpec), and the nprobe = 4 row is the floor-checked
    // operating point. Multi-row → recorded in AUDITS' full row set.
    "audit_ivf_nprobe_curve" -> { (s, dir) =>
      val c = clusteredCorpus(s, dir)
      val exact = bruteForceTopK(c, probes(c), 5)
      Seq(1, 2, 4, 8, 16).map { np =>
        recallVsBruteForce(ivfTopK(c, probes(c), 5, nprobe = np), exact)
          .select(lit(np).as("nprobe"), col("n_exact"), col("n_matched"),
            col("recall"))
      }.reduce(_ unionAll _).orderBy(col("nprobe"))
    },
    // radius (range) search: all corpus vectors within cosine ≥ τ of a
    // fixed probe — the probe is a broadcast scalar row, the corpus is
    // scanned once with a codegen'd dot product (oracle-checked)
    "sim_range_search" -> { (s, dir) =>
      val c = corpus(s, dir).withColumn("nrm", Vectors.norm(col("v")))
      val probe = broadcast(c.filter(col("vec_id") === 0)
        .select(col("v").as("pv"), col("nrm").as("pn")))
      c.crossJoin(probe)
        .filter(col("vec_id") =!= 0)
        .withColumn("cos",
          Vectors.dot(col("v"), col("pv")) / (col("nrm") * col("pn")))
        .filter(col("cos") >= 0.2)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
        .orderBy(col("vec_id"))
    },
    // embedding normalize + int8 quantize (the storage-shrink step of a
    // vector pipeline): per-vector scalar norm + element-wise transform,
    // surfaced as checkable aggregates (oracle-checked)
    "sim_quantize_int8" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
        .withColumn("nrm", Vectors.norm(col("v")))
      e.withColumn("qv", transform(col("v"),
          x => round(lit(127.0) * x / col("nrm"), 0).cast(IntegerType)))
        .select(col("vec_id"),
          round(col("nrm"), 6).as("l2_norm"),
          aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("qv")).as("q_min"),
          array_max(col("qv")).as("q_max"))
        .orderBy(col("vec_id"))
    },
    // random projection (Achlioptas sign matrix): 64-d → 16-d sketch
    // of every embedding, the Johnson–Lindenstrauss dimensionality
    // shrink before indexing/clustering. The projection matrix is not
    // materialized anywhere — entry (i, j) is the sign of a hash of
    // (i, j), recomputed identically on any executor, any engine, any
    // run; the inner products accumulate in DECIMAL(18,6) so the
    // output doubles are independent of evaluation order (same
    // contract as Q.dsum). Per-row codegen HOFs, zero shuffle, zero
    // broadcast — at 100 TB this is a pure map over the corpus.
    "sim_random_projection" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(expr(
          """transform(sequence(0, 15), j ->
            |  cast(aggregate(
            |    transform(embedding, (x, i) ->
            |      cast(cast(x as double) as decimal(18,6)) *
            |        (case when substr(md5(concat(i, ':', j)), 1, 1) < '8'
            |              then 1 else -1 end)),
            |    cast(0 as decimal(28,6)),
            |    (acc, t) -> cast(acc + t as decimal(28,6))) as double))"""
            .stripMargin)))
        .toDF("vec_id", "dim_j", "val")
        .orderBy(col("vec_id"), col("dim_j"))
    },
    // Gram-matrix probe, row 1 in exact micro-units (oracle-checked):
    // the distributed half of PCA — per-dim decimal means, centered
    // products, integer accumulation — proven cell-by-cell against
    // DuckDB so sim_pca_power's input matrix has exact evidence. Same
    // micro-unit determinism trick as sim_label_centroids.
    "sim_pca_gram_probe" -> { (s, dir) =>
      val c = centeredVecs(s, dir)
      c.select(element_at(col("c"), 1).as("c1"), posexplode(col("c")))
        .select(col("pos").cast(LongType).as("dim_j"),
          ((col("c1") * col("col")).cast(DecimalType(18, 6)) * 1000000)
            .cast(LongType).as("micro"))
        .groupBy(col("dim_j"))
        .agg(sum(col("micro")).as("gram_micro"))
        .orderBy(col("dim_j"))
    },

    // PCA top-2 components by power iteration (rows-only by design:
    // the eigensolve runs on the DRIVER over the d×d matrix — 32 KB,
    // not data — so no SQL oracle can mirror its float loop; the spec
    // locks residuals ‖Av−λv‖/λ ≤ 1e-9 and the gram probe above
    // anchors the matrix itself). Distributed cost: one pass for the
    // means + one single-pass GramAgg — nothing else touches the data,
    // and the d² blowup lives inside the aggregation buffer, not on
    // the wire. The classic 100 TB PCA shape (compute XᵀX, eigensolve
    // centrally); for d ≫ 10³ swap the driver solve for randomized
    // SVD, the data passes are unchanged.
    "sim_pca_power" -> { (s, dir) =>
      import org.apache.spark.sql.GraftBridge
      val c = centeredVecs(s, dir)
      val dim = 64
      val g = c.agg(GraftBridge.column(graft.functions.GramAgg(
          GraftBridge.expression(col("c")), dim).toAggregateExpression())
          .as("g"),
          count(lit(1)).as("n"))
        .head
      val n = g.getLong(1)
      val a = g.getSeq[Long](0).map(_ / 1e6).toArray
      def matVec(m: Array[Double], v: Array[Double]): Array[Double] = {
        val r = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var acc = 0.0; var j = 0
          while (j < dim) { acc += m(i * dim + j) * v(j); j += 1 }
          r(i) = acc; i += 1
        }
        r
      }
      def power(m: Array[Double]): (Double, Array[Double], Double) = {
        var v = Array.fill(dim)(1.0 / math.sqrt(dim))
        var lambda = 0.0
        // near-isotropic spectra (λ₂/λ₁ → 1, true of these synthetic
        // embeddings) converge slowly; 1000 iterations of a 64×64
        // mat-vec is ~4M flops — free next to one data pass. The
        // residual COLUMN records the achieved quality every round.
        for (_ <- 1 to 1000) {
          val w = matVec(m, v)
          lambda = math.sqrt(w.map(x => x * x).sum)
          v = w.map(_ / lambda)
        }
        val av = matVec(m, v)
        val res = math.sqrt(
          av.zip(v).map { case (x, y) => (x - lambda * y) * (x - lambda * y) }
            .sum) / lambda
        (lambda, v, res)
      }
      val trace = (0 until dim).map(i => a(i * dim + i)).sum
      val (l1, v1, r1) = power(a)
      // deflate: A' = A − λ₁·v₁v₁ᵀ, then the second component
      val a2 = a.clone()
      for (i <- 0 until dim; j <- 0 until dim)
        a2(i * dim + j) -= l1 * v1(i) * v1(j)
      val (l2, v2, r2) = power(a2)
      def top(v: Array[Double]): Int = v.map(math.abs).zipWithIndex.maxBy(_._1)._2
      import s.implicits._
      Seq((n, math.round(l1 / n * 1e6) / 1e6, math.round(l1 / trace * 1e6) / 1e6,
        math.round(l2 / n * 1e6) / 1e6, math.round(l2 / trace * 1e6) / 1e6,
        r1, r2, top(v1), top(v2)))
        .toDF("n_vecs", "var_pc1", "frac_pc1", "var_pc2", "frac_pc2",
          "residual_pc1", "residual_pc2", "top_dim_pc1", "top_dim_pc2")
    },

    // per-label centroids (class-mean vectors — the prototype step of
    // embedding evaluation / nearest-class-mean classification). One
    // posexplode + one partial/final agg on (label, dim): n×64 narrow
    // rows through a 64·|labels|-key aggregate — fully distributed, no
    // vector ever collected. Emitted flat (label, dim_idx, mean) so the
    // oracle compares element-wise.
    // the mean is rounded in INTEGER micro-units — round(sum/n, 6) on
    // doubles flips between engines when the mean in micro-units hits
    // an exact .5 tie (sum·10⁶ is an integer, so ties are common, and
    // each engine's round() breaks them on a different representation;
    // one such tie surfaced at sf0.1). (2m+n) div (2n) is half-up in
    // pure integer arithmetic, bit-identical everywhere.
    "sim_label_centroids" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(Vectors.toDouble(col("embedding"))))
        .groupBy(col("label"), col("pos"))
        .agg(sum((col("col").cast(DecimalType(18, 6)) * 1000000)
          .cast(LongType)).as("sm"),
          count(lit(1)).as("n_vecs"))
        .withColumn("mean_val", expr(
          """CAST(CASE WHEN sm >= 0 THEN (2*sm + n_vecs) DIV (2*n_vecs)
            |     ELSE -((2*(-sm) + n_vecs) DIV (2*n_vecs)) END AS DOUBLE)
            | / 1000000""".stripMargin))
        .select(col("label"), col("pos").cast(LongType).as("dim_idx"),
          col("mean_val"), col("n_vecs"))
        .orderBy(col("label"), col("dim_idx"))
    },
    // nearest-class-mean classification eval: assign every vector to
    // the label whose centroid is closest (L2), confusion counts vs the
    // true label. Centroids are a 64·|labels|-row aggregate broadcast
    // against one corpus scan — the classifier itself never shuffles
    // the corpus. Complements kNN eval (prototype- vs instance-based).
    "sim_ncm_label_acc" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Vectors.toDouble(col("embedding")).as("v"))
      // element means per label, reassembled into centroid vectors
      // davg, not avg: a partitioning-order ulp in a centroid component
      // could flip the argmin on a near-tie between two centroids
      val cents = e
        .select(col("label").as("clabel"), posexplode(col("v")))
        .groupBy(col("clabel"), col("pos"))
        .agg(davg(col("col")).as("m"))
        .groupBy(col("clabel"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("st"))
        .select(col("clabel"),
          transform(col("st"), s => s.getField("m")).as("centroid"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("clabel"))
      e.crossJoin(broadcast(cents))
        .withColumn("d2", Vectors.l2sq(col("v"), col("centroid")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .groupBy(col("label").as("true_label"),
          col("clabel").as("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_label"), col("pred_label"))
    },
    // pairwise L2 distance stats (oracle-checked, exercises l2sq)
    "sim_l2_stats" -> { (s, dir) =>
      val c = corpus(s, dir)
      val a = c.filter(col("vec_id") < 20)
        .select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = c.filter(col("vec_id") < 20)
        .select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("d2", Vectors.l2sq(col("va"), col("vb")))
        .agg(count(lit(1)).as("n_pairs"),
          round(min(col("d2")), 6).as("min_d2"),
          round(max(col("d2")), 6).as("max_d2"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "sim_pca_gram_probe" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |x AS (SELECT vec_id, unnest(v) AS val,
        |    unnest(range(1, len(v)+1)) AS i
        |  FROM e),
        |mn AS (SELECT i,
        |    CAST(sum(CAST(val AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS m
        |  FROM x GROUP BY i),
        |c AS (SELECT x.vec_id, x.i, x.val - mn.m AS c
        |  FROM x JOIN mn USING (i)),
        |c1 AS (SELECT vec_id, c AS c1 FROM c WHERE i = 1),
        |pr AS (SELECT c.i - 1 AS dim_j,
        |    CAST(CAST(c1.c1 * c.c AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        |      AS micro
        |  FROM c JOIN c1 USING (vec_id))
        |SELECT CAST(dim_j AS BIGINT) AS dim_j,
        |  CAST(sum(micro) AS BIGINT) AS gram_micro
        |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |s AS (
        |  SELECT query_id, vec_id,
        |    list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*v[i]), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_transform(range(1, len(v)+1), i -> v[i]*v[i]), (x,y) -> x+y))) AS cos
        |  FROM q JOIN e ON vec_id <> query_id)
        |SELECT query_id, vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
        |  round(cos, 6) AS cosine
        |FROM s
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "sim_matryoshka_eval" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |base AS (
        |  SELECT query_id, vec_id, qv, v,
        |    list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*v[i]), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_transform(range(1, len(v)+1), i -> v[i]*v[i]), (x,y) -> x+y))) AS cos_full
        |  FROM q JOIN e ON vec_id <> query_id),
        |ex AS (
        |  SELECT query_id, vec_id, cos_full, k,
        |    list_reduce(list_transform(range(1, k+1), i -> qv[i]*v[i]), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_transform(range(1, k+1), i -> qv[i]*qv[i]), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_transform(range(1, k+1), i -> v[i]*v[i]), (x,y) -> x+y))) AS cos_k
        |  FROM base CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS k)),
        |picks AS (
        |  SELECT query_id, k, vec_id AS pick_id, cos_full AS pick_cos_full
        |  FROM ex
        |  QUALIFY row_number() OVER (PARTITION BY query_id, k
        |    ORDER BY cos_k DESC, vec_id) = 1),
        |fullpick AS (SELECT query_id, pick_id AS full_pick FROM picks
        |  WHERE k = 64)
        |SELECT k, count(*) AS n_probes,
        |  round(CAST(sum(CASE WHEN pick_id = full_pick THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS top1_agreement,
        |  round(CAST(sum(CAST(pick_cos_full AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(pick_cos_full), 6) AS mean_full_cosine
        |FROM picks JOIN fullpick USING (query_id)
        |GROUP BY k ORDER BY k""".stripMargin,
    "sim_knn_label_acc" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nlabel,
        |    list_reduce(list_transform(range(1, len(q.v)+1), i -> q.v[i]*c.v[i]), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_transform(range(1, len(q.v)+1), i -> q.v[i]*q.v[i]), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_transform(range(1, len(c.v)+1), i -> c.v[i]*c.v[i]), (x,y) -> x+y))) AS cos
        |  FROM e q JOIN e c ON c.vec_id <> q.vec_id),
        |nn AS (
        |  SELECT query_id, neighbor_id, nlabel FROM s
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id) <= 5),
        |votes AS (
        |  SELECT query_id, nlabel, count(*) AS c
        |  FROM nn GROUP BY query_id, nlabel),
        |pred AS (
        |  SELECT query_id, nlabel AS pred_label FROM votes
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY c DESC, nlabel) = 1)
        |SELECT t.label AS true_label, p.pred_label, count(*) AS n
        |FROM pred p JOIN e t ON p.query_id = t.vec_id
        |GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin,
    "sim_range_search" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT b.vec_id,
        |    list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i]), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i]), (x,y) -> x+y))) AS cos
        |  FROM e a JOIN e b ON a.vec_id = 0 AND b.vec_id <> 0)
        |SELECT vec_id, round(cos, 6) AS cosine FROM p
        |WHERE cos >= 0.2 ORDER BY vec_id""".stripMargin,
    "sim_quantize_int8" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(range(1, len(v)+1),
        |      i -> v[i]*v[i]), (x,y) -> x+y)) AS nrm
        |  FROM e),
        |q AS (SELECT vec_id, nrm,
        |    list_transform(range(1, len(v)+1),
        |      i -> CAST(round(127.0 * v[i] / nrm, 0) AS INT)) AS qv
        |  FROM n)
        |SELECT vec_id, round(nrm, 6) AS l2_norm,
        |  CAST(list_reduce(qv, (a, b) -> a + b) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,
    // same hash-derived sign matrix, same DECIMAL accumulation; the
    // DuckDB lambda index i is 1-based where Spark's is 0-based
    "sim_random_projection" ->
      """SELECT vec_id, j AS dim_j,
        |  CAST(list_sum(list_transform(embedding,
        |    (x, i) -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) *
        |      (CASE WHEN substr(md5((i-1) || ':' || j), 1, 1) < '8'
        |            THEN 1 ELSE -1 END))) AS DOUBLE) AS val
        |FROM embeddings
        |CROSS JOIN (SELECT unnest(range(16)) AS j) dims
        |ORDER BY vec_id, dim_j""".stripMargin,
    "sim_label_centroids" ->
      """WITH e AS (SELECT label,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
        |    generate_subscripts(embedding, 1) AS idx
        |  FROM embeddings),
        |a AS (SELECT label, CAST(idx - 1 AS BIGINT) AS dim_idx,
        |    sum(CAST(CAST(v AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS sm,
        |    count(*) AS n_vecs
        |  FROM e GROUP BY 1, 2)
        |SELECT label, dim_idx,
        |  CAST(CASE WHEN sm >= 0 THEN (2*sm + n_vecs) // (2*n_vecs)
        |       ELSE -((2*(-sm) + n_vecs) // (2*n_vecs)) END AS DOUBLE)
        |    / 1000000 AS mean_val,
        |  n_vecs
        |FROM a ORDER BY label, dim_idx""".stripMargin,
    "sim_ncm_label_acc" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |x AS (SELECT label AS clabel, unnest(v) AS comp,
        |    generate_subscripts(v, 1) AS idx
        |  FROM e),
        |m AS (SELECT clabel, idx,
        |    CAST(sum(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS m
        |  FROM x GROUP BY 1, 2),
        |c AS (SELECT clabel, list(m ORDER BY idx) AS centroid
        |  FROM m GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label, c.clabel,
        |    list_reduce(list_transform(range(1, len(e.v)+1),
        |      i -> (e.v[i]-c.centroid[i])*(e.v[i]-c.centroid[i])),
        |      (a,b) -> a+b) AS d2
        |  FROM e CROSS JOIN c),
        |p AS (SELECT vec_id, label, clabel FROM d
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY d2, clabel) = 1)
        |SELECT label AS true_label, clabel AS pred_label, count(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin,
    "sim_l2_stats" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 20),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_transform(range(1, len(a.v)+1),
        |      i -> (a.v[i]-b.v[i])*(a.v[i]-b.v[i])), (x,y) -> x+y) AS d2
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT count(*) AS n_pairs, round(min(d2), 6) AS min_d2,
        |  round(max(d2), 6) AS max_d2
        |FROM p""".stripMargin
  )
}
