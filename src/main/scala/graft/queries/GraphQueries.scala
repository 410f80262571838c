package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Urls
import graft.operators.{Graphs, Mixture, Ranking, Sampling}

/** Wave 7 — graph and ordering operators for corpus assembly: link-graph
  * PageRank (fixed-point integers, bit-exact in any engine), the
  * shard-and-order training permutation, temperature mixture targets and
  * the domain blocklist filter.
  *
  * Same conventions as every wave: identical column aliases in Spark and
  * DuckDB, total ORDER BY, counts CAST to BIGINT in the oracle, floats
  * produced by identical IEEE operation chains (here: sqrt only, which is
  * correctly rounded) and rounded to 6 before comparison.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q107 fixture: a deterministic 101-node link graph over `documents` —
    * src = doc_id mod 101, dst = (7·doc_id + 3) mod 101. The affine map is
    * a bijection mod 101 (gcd(7,101)=1) so in/out degrees vary only via
    * the doc_id distribution; self-loops are dropped and a few residues
    * appear only as targets at small SF, exercising the dangling-node
    * semantics. */
  private def linkFixture(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 7 + 3) % 101).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  private val linkFixtureSql =
    """SELECT DISTINCT (doc_id % 101) AS src, ((doc_id * 7 + 3) % 101) AS dst
      |FROM documents WHERE (doc_id % 101) <> ((doc_id * 7 + 3) % 101)"""
      .stripMargin

  /** q107 oracle: the same fixed-point iteration unrolled — every step is
    * integer floor division (`//`) and integer sums, so the oracle agrees
    * with Spark bit-for-bit regardless of join order or parallelism.
    * base = 1000000·15//100 = 150000. */
  private val pageRankSql: String = {
    val iterCte = (k: Int) => {
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT n.node,
         |    CAST(150000 + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.pr // o.od) AS c
         |    FROM edges e JOIN $prev r ON r.node = e.src
         |                 JOIN outdeg o ON o.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)"""
    }
    s"""WITH edges AS ($linkFixtureSql),
       |nodes AS (SELECT src AS node FROM edges
       |          UNION SELECT dst FROM edges),
       |outdeg AS (SELECT src AS node, count(*) AS od FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |${(1 to 5).map(iterCte).mkString(",\n")}
       |SELECT node, pr AS rank_fp FROM r5 ORDER BY node""".stripMargin
  }

  /** q121 oracle: the q107 recurrence with the teleport term restricted
    * to the seed set — r0 and base are CASE-on-seed, everything else
    * identical integer arithmetic. */
  private val pprSql: String = {
    val seedList = "(1, 2, 3, 5, 7)"
    val iterCte = (k: Int) => {
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT n.node,
         |    CAST(CASE WHEN n.node IN $seedList THEN 150000 ELSE 0 END
         |         + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.pr // o.od) AS c
         |    FROM edges e JOIN $prev r ON r.node = e.src
         |                 JOIN outdeg o ON o.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)"""
    }
    s"""WITH edges AS ($linkFixtureSql),
       |nodes AS (SELECT src AS node FROM edges
       |          UNION SELECT dst FROM edges),
       |outdeg AS (SELECT src AS node, count(*) AS od FROM edges GROUP BY src),
       |r0 AS (SELECT node,
       |         CAST(CASE WHEN node IN $seedList THEN 1000000 ELSE 0 END
       |              AS BIGINT) AS pr
       |       FROM nodes),
       |${(1 to 5).map(iterCte).mkString(",\n")}
       |SELECT node, pr AS rank_fp FROM r5 ORDER BY node""".stripMargin
  }

  /** q111 fixture: URLs whose registered domain cycles through 7 values so
    * a 2-entry blocklist drops a deterministic ~2/7 of the corpus. */
  private def urlFixture(docId: org.apache.spark.sql.Column) = concat(
    lit("https://www.Sub"), (docId % 5).cast("string"),
    lit(".Example"), (docId % 7).cast("string"), lit(".com/p"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Link-graph PageRank, 5 damped iterations at scale 10^6. Fixed-point
    // longs: sums are associative, so the rank of every node is identical
    // in any engine at any parallelism — no float tolerance needed.
    "q107_pagerank" -> ((s, dir) =>
      Graphs.pageRankFixedPoint(linkFixture(s, dir), iters = 5)
        .orderBy(col("node"))),

    // Per-node triangle counts over the undirected link skeleton — the
    // local-density signal behind link-ring detection. Ordered-wedge
    // join; every triangle generated exactly once. Denser 3-generator
    // fixture: the single affine map of q107 is a permutation graph
    // (out-degree 1; 3 does not divide ord(7 mod 101)) and has NO
    // triangles — three generators give 19 of them over 46 nodes.
    "q120_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select((col("doc_id") % 101).as("r"))
      val gen = Seq((7, 3), (13, 5), (29, 11)).map { case (m, c) =>
        docs.select(col("r").as("src"), ((col("r") * m + c) % 101).as("dst"))
      }.reduce(_ unionAll _).filter(col("src") =!= col("dst")).distinct()
      Graphs.triangleCounts(gen).orderBy(col("node"))
    }),

    // Personalized PageRank from a 5-node seed set: proximity-to-seeds
    // along links (allowlist extension). Same fixed-point integer
    // contract as q107; unreachable nodes stay at 0.
    "q121_ppr" -> ((s, dir) =>
      Graphs.personalizedPageRank(linkFixture(s, dir),
        seeds = Seq(1L, 2L, 3L, 5L, 7L), iters = 5)
        .orderBy(col("node"))),

    // Bounded-horizon BFS: distinct nodes reachable within ≤3 directed
    // hops per source — frontier expansion with a DISTINCT per round
    // (pairs, never paths), vs the oracle's unrolled UNION chain.
    "q128_khop_reach" -> ((s, dir) =>
      Graphs.kHopCounts(linkFixture(s, dir), k = 3)
        .orderBy(col("src"))),

    // Deterministic training permutation: md5-shard + in-shard sequence.
    // The global order is (shard, seq) round-robin; no single-partition
    // window anywhere.
    "q109_shard_order" -> ((s, dir) =>
      Sampling.shardAndOrder(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id").cast("string"), shards = 8, tiebreak = col("doc_id"))
        .orderBy(col("doc_id"))),

    // Temperature-scaled (α=0.5) mixture targets over the source column —
    // the rebalancing weights fed to resampleToMixture.
    "q110_temperature_mix" -> ((s, dir) =>
      Mixture.temperatureTargets(
        t(s, dir, "documents").select(col("source")), "source")
        .orderBy(col("source"))),

    // Exact global rank + equal-frequency decile bins with NO
    // single-partition window over the data: range-repartition,
    // per-partition row_number, broadcast partition offsets. Bins are
    // the floor form floor((rank-1)k/N) — balanced ±1 with the larger
    // buckets spread across the range (not ntile's front-loading).
    "q119_equal_freq_bins" -> ((s, dir) =>
      Ranking.equalFreqBins(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars"), col("doc_id")), k = 10, parts = 32)
        .orderBy(col("doc_id"))),

    // Domain blocklist: registered-domain extraction + broadcast hash
    // anti-join (never an endsWith scan). Survivors keep their domain.
    "q111_host_block" -> ((s, dir) => {
      val withUrl = t(s, dir, "documents")
        .select(col("doc_id"), urlFixture(col("doc_id")).as("url"))
      Urls.domainBlockFilter(withUrl, col("url"),
        Seq("example0.com", "example3.com"))
        .select(col("doc_id"), Urls.registeredDomain(col("url")).as("domain"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q107_pagerank" -> pageRankSql,
    "q121_ppr" -> pprSql,

    "q128_khop_reach" ->
      s"""WITH edges AS ($linkFixtureSql),
         |r2 AS (SELECT src, dst FROM edges
         |       UNION
         |       SELECT r.src, e.dst FROM edges r JOIN edges e
         |         ON r.dst = e.src),
         |r3 AS (SELECT src, dst FROM r2
         |       UNION
         |       SELECT r.src, e.dst FROM r2 r JOIN edges e ON r.dst = e.src)
         |SELECT src, CAST(count(*) AS BIGINT) AS n_reach
         |FROM r3 GROUP BY src ORDER BY src""".stripMargin,

    "q120_triangles" ->
      s"""WITH res AS (SELECT doc_id % 101 AS r FROM documents),
         |edges AS (
         |  SELECT r AS src, (r * 7 + 3) % 101 AS dst FROM res
         |  UNION ALL SELECT r, (r * 13 + 5) % 101 FROM res
         |  UNION ALL SELECT r, (r * 29 + 11) % 101 FROM res),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM edges WHERE src <> dst),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM und e1 JOIN und e2 ON e2.a = e1.b
         |              JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
         |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
         |GROUP BY node ORDER BY node""".stripMargin,

    "q109_shard_order" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM documents)
        |SELECT doc_id, source, CAST(hv % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
        |    AS BIGINT) AS seq
        |FROM h ORDER BY doc_id""".stripMargin,

    "q110_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_docs
        |           FROM documents GROUP BY source)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  round(n_docs::DOUBLE / (sum(n_docs) OVER ())::DOUBLE, 6)
        |    AS share_raw,
        |  round(sqrt(n_docs::DOUBLE) / sum(sqrt(n_docs::DOUBLE)) OVER (), 6)
        |    AS share_t
        |FROM c ORDER BY source""".stripMargin,

    "q119_equal_freq_bins" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS "rank",
        |    count(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id, n_chars, CAST("rank" AS BIGINT) AS "rank",
        |  CAST((("rank" - 1) * 10) // n AS BIGINT) AS bin
        |FROM r ORDER BY doc_id""".stripMargin,

    "q111_host_block" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.Sub' || (doc_id % 5)::VARCHAR ||
        |    '.Example' || (doc_id % 7)::VARCHAR || '.com/p' AS url
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    array_to_string(
        |      string_split(regexp_replace(lower(regexp_extract(url,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
        |        ':[0-9]+$', ''), '.')[-2:], '.') AS domain
        |  FROM u)
        |SELECT doc_id, domain FROM d
        |WHERE domain NOT IN ('example0.com', 'example3.com')
        |ORDER BY doc_id""".stripMargin
  )
}
