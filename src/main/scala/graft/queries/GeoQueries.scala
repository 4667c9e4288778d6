package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Spatial analytics over gridded 2-D points — the geo suite every
  * location-bearing corpus needs (radius self-join, kNN, hotspot
  * detection, tile pyramids), built on the same bucket-equi-join
  * discipline as the dedup/ANN pillars: a GRID CELL is the spatial
  * twin of an LSH band, and every candidate set is cell-bounded,
  * never quadratic. Points derive deterministically from the
  * embeddings table's first two dimensions snapped to an integer
  * milli-grid (float→double is exact, ·1000.0 one IEEE multiply,
  * floor exact — identical in both engines), then shifted
  * non-negative so truncating integer division IS floor division on
  * both sides. Every distance is INTEGER squared-Euclidean — no sqrt
  * crosses an engine boundary.
  *
  * 100 TB posture: all candidate generation is (cell_x, cell_y)
  * equi-joins whose fan-out is bounded by cell occupancy (a skewed
  * cell caps exactly the way a hot LSH bucket does — the
  * [[graft.ext.DedupOps.capBuckets]] guard applies unchanged); the
  * tile pyramid is one scan with a fixed 4-level explode and
  * map-side combine. The naive quadratic spellings exist only on the
  * DuckDB oracle side — which is exactly what proves the grid plans
  * exact.
  */
object GeoQueries {

  /** (vec_id, px, py) on the non-negative integer milli-grid. */
  private def points(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings").select(col("vec_id"),
      (expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 1000.0) AS BIGINT)")
        + lit(2000L)).as("px"),
      (expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 1000.0) AS BIGINT)")
        + lit(2000L)).as("py"))

  /** 9-cell probe ring: each row of `df` replicated for the 3×3
    * neighborhood of its (px div cell, py div cell) cell. */
  private def probeRing(df: DataFrame, cell: Long, idAs: String): DataFrame = {
    val offs = Seq(-1L, 0L, 1L)
    df.select(col("vec_id").as(idAs), col("px").as("ax"), col("py").as("ay"),
        explode(array((for { dx <- offs; dy <- offs } yield
          struct((expr(s"px div $cell") + lit(dx)).as("gx"),
            (expr(s"py div $cell") + lit(dy)).as("gy"))): _*)).as("g"))
      .select(col(idAs), col("ax"), col("ay"),
        col("g.gx").as("gx"), col("g.gy").as("gy"))
  }

  /** All point pairs within Euclidean distance 20 — the spatial radius
    * self-join done the scale way: cell width = radius, so a
    * qualifying pair ALWAYS has the second point inside the first's
    * 3×3 probe ring; side A explodes to 9 probe cells (the
    * events_dbscan offset idiom), the join is a (gx, gy) equi-join
    * against B's single home cell, and each unordered pair meets
    * EXACTLY once (B's home cell is fixed; id_a < id_b orients). The
    * oracle spells the naive quadratic distance join — identical
    * semantics, so the green row pins the grid rewrite's 100% recall.
    * Candidate volume is Σ(ring occupancy) — linear in points for any
    * bounded-density corpus. */
  def geoRadiusJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val home = p.select(col("vec_id"), col("px"), col("py"),
      expr("px div 20").as("gx"), expr("py div 20").as("gy"))
    probeRing(p, 20L, "id_a")
      .join(home, Seq("gx", "gy"))
      .filter(col("id_a") < col("vec_id") &&
        (col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py")) <= lit(400L))
      .select(col("id_a"), col("vec_id").as("id_b"),
        ((col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py"))).as("d2"))
  }

  /** [[geoRadiusJoin]] with the HOT-CELL guard engaged — the spatial
    * spelling of the skew cap every other candidate family carries
    * (MinHash/SimHash/SRP/prefix all have oracle-verified caps): home
    * cells holding more than 3 points are excluded from the build side
    * BEFORE pairing, so one dense downtown block can never bucket
    * occupancy² candidates. The recall trade is VISIBLE and
    * hash-checked (pairs whose home-side cell is hot fall away; the
    * oracle spells the identical HAVING-bounded cell set). Production
    * sizing reads [[geoHotspot]] first — the cap threshold is the
    * occupancy histogram's tail knee. */
  def geoRadiusJoinCapped(spark: SparkSession, sfDir: String): DataFrame = {
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val home = graft.core.QueryCaches.track(
      p.select(col("vec_id"), col("px"), col("py"),
        expr("px div 20").as("gx"), expr("py div 20").as("gy")))
    val ok = home.groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= 3L).select(col("gx"), col("gy"))
    val cool = home.join(ok, Seq("gx", "gy"), "left_semi")
    probeRing(p, 20L, "id_a")
      .join(cool, Seq("gx", "gy"))
      .filter(col("id_a") < col("vec_id") &&
        (col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py")) <= lit(400L))
      .select(col("id_a"), col("vec_id").as("id_b"),
        ((col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py"))).as("d2"))
  }

  /** Radius-bounded 3-nearest-neighbors — the grid kNN: candidates
    * come from the same 9-cell ring (cell = radius = 50), each
    * DIRECTED pair meets once (A probes B's home cell), and the
    * per-point top-3 by (d², id) filters the UNCAST row_number so the
    * rank plans as a partial WindowGroupLimit — map tasks pre-trim to
    * 3 before the exchange. Points with no neighbor within 50 are
    * absent by contract (the radius bound is what keeps candidates
    * cell-bounded at any density; an unbounded exact kNN is
    * [[graft.ext.SimOps.knnGraph]]'s job). */
  def geoKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val home = p.select(col("vec_id"), col("px"), col("py"),
      expr("px div 50").as("gx"), expr("py div 50").as("gy"))
    probeRing(p, 50L, "id_a")
      .join(home, Seq("gx", "gy"))
      .filter(col("id_a") =!= col("vec_id") &&
        (col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py")) <= lit(2500L))
      .select(col("id_a"), col("vec_id").as("id_b"),
        ((col("ax") - col("px")) * (col("ax") - col("px")) +
          (col("ay") - col("py")) * (col("ay") - col("py"))).as("d2"))
      .withColumn("rk0", row_number().over(Window.partitionBy(col("id_a"))
        .orderBy(col("d2"), col("id_b"))))
      .filter(col("rk0") <= 3)
      .select(col("id_a"), col("rk0").cast("bigint").as("rk"),
        col("id_b"), col("d2"))
  }

  /** Reverse kNN influence — for each point, how many OTHER points
    * count it among their 3 nearest within the radius (the
    * facility-placement / cannibalization readout: a high-RkNN point
    * serves many neighborhoods). Rides [[geoKnn]]'s candidate
    * machinery exactly — one more domain-bounded aggregate over the
    * ranked relation (each point contributes ≤3 votes, so the vote
    * table is 3n rows max) plus a global top-10 by influence that
    * filters the UNCAST rank (partial top-k). */
  def geoRknn(spark: SparkSession, sfDir: String): DataFrame =
    geoKnn(spark, sfDir)
      .groupBy(col("id_b").as("vec_id"))
      .agg(count(lit(1)).as("rknn"), min(col("d2")).as("closest_d2"))
      .withColumn("rk0", row_number().over(
        Window.orderBy(col("rknn").desc, col("vec_id"))))
      .filter(col("rk0") <= 10)
      .select(col("rk0").cast("bigint").as("rk"), col("vec_id"),
        col("rknn"), col("closest_d2"))

  /** Spatial choropleth — per 100-cell the point count, the DOMINANT
    * label, its vote count, and an all-integer purity (1000·votes div
    * n): the map-layer every labeled-corpus release ships, and the
    * spatial twin of the label-quality audits (a low-purity cell is a
    * label-noise or boundary region). The argmax is a map-side
    * max_by over (votes, −label) — one row per cell crosses the
    * exchange; ties break to the SMALLEST label, spelled identically
    * in the oracle's rank-1 window. */
  def geoChoropleth(spark: SparkSession, sfDir: String): DataFrame = {
    val votes = load(spark, sfDir, "embeddings").select(
        expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 1000.0) AS BIGINT)" +
          " + 2000").as("px"),
        expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 1000.0) AS BIGINT)" +
          " + 2000").as("py"),
        col("label").cast("long").as("label"))
      .select(expr("px div 100").as("cell_x"), expr("py div 100").as("cell_y"),
        col("label"))
      .groupBy(col("cell_x"), col("cell_y"), col("label"))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy(col("cell_x"), col("cell_y"))
      .agg(sum(col("votes")).as("n"),
        max_by(col("label"), struct(col("votes"), -col("label"))).as("top_label"),
        max(struct(col("votes"), -col("label"))).getField("votes").as("top_votes"))
      .select(col("cell_x"), col("cell_y"), col("n"), col("top_label"),
        col("top_votes"), expr("(1000 * top_votes) div n").as("purity_milli"))
  }

  /** Grid hotspot detection (Getis-Ord-lite): per occupied 100-cell
    * the point count, its 3×3 neighborhood mass, and an ALL-INTEGER
    * hot flag — n_cells·n_nbhd > 27·n_total ⇔ the neighborhood holds
    * more than 3× the average 9-cell mass. The neighborhood fold is
    * the probe-ring equi-join over the CELL relation (domain-bounded:
    * cells, not points, cross the exchange); totals are a 1-row
    * broadcast. The oracle spells the naive BETWEEN range join the
    * engine plan avoids. */
  def geoHotspot(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = graft.core.QueryCaches.track(
      points(spark, sfDir)
        .select(expr("px div 100").as("cx"), expr("py div 100").as("cy"))
        .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n")))
    val tot = cells.agg(sum(col("n")).as("n_total"),
      count(lit(1)).as("n_cells"))
    val offs = Seq(-1L, 0L, 1L)
    val ring = cells.select(col("cx").as("hx"), col("cy").as("hy"),
        col("n").as("hn"),
        explode(array((for { dx <- offs; dy <- offs } yield
          struct((col("cx") + lit(dx)).as("gx"),
            (col("cy") + lit(dy)).as("gy"))): _*)).as("g"))
      .select(col("hx"), col("hy"), col("hn"),
        col("g.gx").as("cx"), col("g.gy").as("cy"))
    ring.join(cells.select(col("cx"), col("cy"), col("n")), Seq("cx", "cy"))
      .groupBy(col("hx").as("cell_x"), col("hy").as("cell_y"))
      .agg(max(col("hn")).as("n"), sum(col("n")).as("n_nbhd"))
      .crossJoin(broadcast(tot))
      .select(col("cell_x"), col("cell_y"), col("n"), col("n_nbhd"),
        (col("n_cells") * col("n_nbhd") > lit(27L) * col("n_total")).as("hot"))
  }

  /** Tile-pyramid rollup — the multi-zoom density index a map service
    * materializes: zoom z ∈ {0..3} tiles of side 2000 div 2^z, per
    * (z, tx, ty) the point count. ONE scan: the fixed 4-level zoom
    * explode runs in the projection and the (z, tx, ty) aggregate
    * combines map-side — adding a zoom level adds a literal, not a
    * pass. The oracle spells the UNION-of-GROUP-BYs equivalent via
    * unnest. */
  def geoPyramid(spark: SparkSession, sfDir: String): DataFrame =
    points(spark, sfDir)
      .select(col("px"), col("py"),
        explode(expr("array(0L, 1L, 2L, 3L)")).as("z"))
      .select(col("z"),
        expr("px div (2000 div shiftleft(1L, CAST(z AS INT)))").as("tx"),
        expr("py div (2000 div shiftleft(1L, CAST(z AS INT)))").as("ty"))
      .groupBy(col("z"), col("tx"), col("ty"))
      .agg(count(lit(1)).as("n_points"))

  /** Convex-hull boundary points — the spatial extent/outlier readout
    * (which documents sit on the corpus's geographic frontier), done
    * the two-phase scale way instead of a driver-side hull:
    *
    * Phase 1, the Akl–Toussaint prune: ONE distributed pass computes
    * four directional extremes as packed BIGINT keys (px·2²²+py for
    * W/E, py·2²²+px for S/N — lexicographic min/max, so ties resolve
    * identically in both engines without an argmin), and a second
    * map-only pass keeps exactly the points NOT strictly inside the
    * CCW quadrilateral W→S→E→N (four integer cross-product sign
    * tests against a 1-row broadcast). Every hull-boundary point
    * survives for ANY quad-corner tie choice — strictly-inside-quad ⇒
    * strictly-inside-hull — so the prune is conservative by
    * construction; empirically it keeps tens of points per thousands.
    *
    * Phase 2, exact on the pruned set: p lies ON the hull boundary
    * iff some directed line p→q (q a survivor) has EVERY survivor
    * weakly left (cross ≥ 0). This is the collinearity-ROBUST
    * definition — edge-interior collinear points (present in this
    * snapped-grid corpus) are boundary points with a well-defined
    * witness, where a strict-corner test would be tie-fragile. The
    * O(m²) supporting-line candidates anti-join the O(m) witness
    * relation (both sides broadcast — survivor cardinality is
    * frontier-scale, not corpus-scale), so the cubic work never
    * touches the full relation. The oracle spells the identical
    * NOT-EXISTS over the identically-pruned set; validated externally
    * against an Andrew-monotone-chain hull at sf0.001 (exact vertex
    * set match). At 100 TB the prune stays one scan + one broadcast
    * stitch; if the frontier itself grew pathological, per-partition
    * partial hulls (mergeable, associative) are the next lever —
    * documented, not needed at any tested density. */
  def geoConvexHull(spark: SparkSession, sfDir: String): DataFrame = {
    val K = 4194304L // 2^22 > any shifted milli-grid coordinate
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val ext = p.agg(
        min(col("px") * K + col("py")).as("kw"),
        max(col("px") * K + col("py")).as("ke"),
        min(col("py") * K + col("px")).as("ks"),
        max(col("py") * K + col("px")).as("kn"))
      .select(
        expr(s"kw div $K").as("wx"), expr(s"kw % $K").as("wy"),
        expr(s"ke div $K").as("ex"), expr(s"ke % $K").as("ey"),
        expr(s"ks % $K").as("sx"), expr(s"ks div $K").as("sy"),
        expr(s"kn % $K").as("nx"), expr(s"kn div $K").as("ny"))
    def leftOf(x1: Column, y1: Column, x2: Column, y2: Column) =
      (x2 - x1) * (col("py") - y1) - (y2 - y1) * (col("px") - x1) > 0
    val surv = graft.core.QueryCaches.track(
      p.crossJoin(broadcast(ext))
        .filter(!(leftOf(col("wx"), col("wy"), col("sx"), col("sy")) &&
          leftOf(col("sx"), col("sy"), col("ex"), col("ey")) &&
          leftOf(col("ex"), col("ey"), col("nx"), col("ny")) &&
          leftOf(col("nx"), col("ny"), col("wx"), col("wy"))))
        .select(col("vec_id"), col("px"), col("py")))
    val pairs = surv.select(col("vec_id").as("ia"), col("px").as("ax"),
        col("py").as("ay"))
      .join(broadcast(surv.select(col("vec_id").as("ib"), col("px").as("bx"),
        col("py").as("by"))), col("ia") =!= col("ib"))
    val supporting = pairs.join(
      broadcast(surv.select(col("vec_id").as("ir"), col("px").as("rx"),
        col("py").as("ry"))),
      col("ir") =!= col("ia") && col("ir") =!= col("ib") &&
        (col("bx") - col("ax")) * (col("ry") - col("ay")) -
          (col("by") - col("ay")) * (col("rx") - col("ax")) < 0,
      "left_anti")
    surv.join(broadcast(supporting.select(col("ia")).distinct()),
        col("vec_id") === col("ia"), "left_semi")
      .select(col("vec_id"), col("px"), col("py"))
  }

  /** The facility catalog for [[geoVoronoi]]: six literal service
    * points spread over the occupied milli-grid — small by contract
    * (a facility catalog is always broadcastable), overlapping
    * coverage on purpose. */
  private val facilities: Seq[(Long, Long, Long)] = Seq(
    (1L, 1600L, 1700L), (2L, 1800L, 2200L), (3L, 2000L, 1900L),
    (4L, 2200L, 1600L), (5L, 2300L, 2300L), (6L, 1500L, 2000L))

  /** Voronoi / nearest-facility assignment — every point assigned to
    * its closest catalog facility, with per-facility load, mean and
    * max squared distance (the coverage radius), and assigned-mass
    * centroid. The 100 TB plan is the pillar's best case: the argmin
    * is a PROJECTION — `least` over six (d², facility_id) structs
    * compiled from the literal catalog, lexicographic struct order =
    * deterministic (distance, id) tie-break — so the point relation
    * never joins and never shuffles; only six partial-aggregate rows
    * per map task cross the exchange. The oracle spells the quadratic
    * cross-join + rank-1 argmin the projection avoids. All integer
    * (sums, truncating divisions) — nothing crosses an engine
    * boundary as a float. */
  def geoVoronoi(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = points(spark, sfDir).select(
      col("px"), col("py"),
      least(facilities.map { case (fid, fx, fy) =>
        struct(((col("px") - fx) * (col("px") - fx) +
          (col("py") - fy) * (col("py") - fy)).as("d2"),
          lit(fid).as("fid"))
      }: _*).as("m"))
    assigned.groupBy(col("m.fid").as("facility_id"))
      .agg(count(lit(1)).as("n_points"),
        expr("sum(m.d2) div count(*)").as("mean_d2"),
        max(col("m.d2")).as("max_d2"),
        expr("(1000 * sum(px)) div count(*)").as("cx_milli"),
        expr("(1000 * sum(py)) div count(*)").as("cy_milli"))
  }

  /** The region catalog for [[geoRegionJoin]]: four CONVEX CCW
    * polygons (triangle, quad, hexagon, square) on the milli-grid,
    * overlapping on purpose (a point can belong to several regions —
    * the multi-membership case a containment join must get right).
    * Convex + CCW makes containment an exact INTEGER sign test: p is
    * inside iff every edge cross product (x2−x1)(py−y1) − (y2−y1)(px−x1)
    * is ≥ 0 (boundary inclusive) — no floats, no ray-cast edge cases,
    * bit-identical in both engines. */
  private val regions: Seq[(Long, Seq[(Long, Long)])] = Seq(
    1L -> Seq((1600L, 1600L), (2100L, 1650L), (1800L, 2100L)),
    2L -> Seq((1950L, 1700L), (2350L, 1750L), (2300L, 2200L), (1900L, 2150L)),
    3L -> Seq((2250L, 1950L), (2125L, 2167L), (1875L, 2167L),
      (1750L, 1950L), (1875L, 1733L), (2125L, 1733L)),
    4L -> Seq((2150L, 1550L), (2300L, 1550L), (2300L, 1700L), (2150L, 1700L)))

  private def regionEdges(vs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] =
    vs.indices.map { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.size)
      (x1, y1, x2, y2)
    }

  /** Point-in-region containment join — the geo twin of the lexicon
    * blocklist broadcast: a SMALL region catalog (polygons) against
    * the full point corpus, answered without evaluating every polygon
    * for every point. The scale plan is the pillar's cell discipline
    * applied to COVERS: each region is expanded driver-side into the
    * grid cells its bounding box touches (a conservative cover — the
    * region is a subset of its bbox, so no containment can escape it),
    * the (cell → region) cover and the (region → edge array) catalog
    * are BROADCAST, points equi-join the cover on their single home
    * cell, and only cover-candidates pay the exact winding test — a
    * `forall` over the region's edge array of the integer cross-product
    * sign. Readout: per region the membership count and centroid in
    * milli-of-grid units, plus the region −1 row counting points in NO
    * region. The oracle spells the QUADRATIC winding test (every point
    * × every edge, bool_and per (point, region)) — the green hash pins
    * the cell cover's 100% recall. At 100 TB the pattern holds: covers
    * grow with region count (broadcastable for any real catalog), the
    * point side never shuffles before the aggregate. */
  /** Region-membership candidates → exact containment for ANY
    * (vec_id, px, py) relation — batch or STREAMING (pure projections
    * plus stream-static broadcast equi-joins, both streaming-legal):
    * home-cell equi-join against the broadcast bbox cell cover, then
    * the exact integer winding test over the broadcast edge catalog.
    * Shared by [[geoRegionJoin]] and the streaming twin
    * [[graft.streaming.GraftStream.regionMembers]] — ONE containment
    * definition, two execution modes, parity-tested. */
  def regionMembership(pts: DataFrame, cell: Long): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val coverRows = for {
      (rid, vs) <- regions
      gx <- (vs.map(_._1).min / cell) to (vs.map(_._1).max / cell)
      gy <- (vs.map(_._2).min / cell) to (vs.map(_._2).max / cell)
    } yield (gx, gy, rid)
    val cover = coverRows.toDF("gx", "gy", "region_id")
    val edgeCat = regions.map { case (rid, vs) => (rid, regionEdges(vs)) }
      .toDF("region_id", "edges")
    pts.select(col("vec_id"), col("px"), col("py"),
        expr(s"px div $cell").as("gx"), expr(s"py div $cell").as("gy"))
      .join(broadcast(cover), Seq("gx", "gy"))
      .join(broadcast(edgeCat), Seq("region_id"))
      .filter(forall(col("edges"), e =>
        (e.getField("_3") - e.getField("_1")) * (col("py") - e.getField("_2")) -
          (e.getField("_4") - e.getField("_2")) * (col("px") - e.getField("_1")) >= 0))
      .select(col("region_id"), col("vec_id"), col("px"), col("py"))
  }

  def geoRegionJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val inside = graft.core.QueryCaches.track(regionMembership(p, 200L))
    regionRollup(p, inside)
  }

  /** [[geoRegionJoin]] for region catalogs TOO LARGE TO BROADCAST —
    * the shuffle-side plan a continent-scale polygon catalog (admin
    * boundaries, geofences by the million) forces: the cell cover is
    * a plain DataFrame whose rows CARRY their region's edge array
    * (cover cells × regions rows, each self-contained), points meet
    * it in a (gx, gy)-keyed SortMergeJoin — both sides shuffle on the
    * cell key, nothing is broadcast, no BroadcastNestedLoopJoin can
    * appear (PlanSpec-pinned) — and the exact integer winding test
    * runs in-row on the joined edge array, so there is no second
    * (region-keyed) join at all. Same 4-region catalog, same rollup,
    * same quadratic oracle as the broadcast row: the green hash pins
    * plan-shape equivalence. At 100 TB the trade is explicit: the
    * broadcast row wins while the cover fits an executor; this row is
    * the fallback whose cost is one co-partitioned shuffle of points
    * + cover, with per-cell fan-out bounded by cover overlap. */
  def geoRegionJoinLarge(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val cell = 200L
    val coverRows = for {
      (rid, vs) <- regions
      gx <- (vs.map(_._1).min / cell) to (vs.map(_._1).max / cell)
      gy <- (vs.map(_._2).min / cell) to (vs.map(_._2).max / cell)
    } yield (gx, gy, rid, regionEdges(vs))
    val cover = coverRows.toDF("gx", "gy", "region_id", "edges")
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val inside = graft.core.QueryCaches.track(
      p.select(col("vec_id"), col("px"), col("py"),
          expr(s"px div $cell").as("gx"), expr(s"py div $cell").as("gy"))
        .join(cover.hint("merge"), Seq("gx", "gy"))
        .filter(forall(col("edges"), e =>
          (e.getField("_3") - e.getField("_1")) * (col("py") - e.getField("_2")) -
            (e.getField("_4") - e.getField("_2")) * (col("px") - e.getField("_1")) >= 0))
        .select(col("region_id"), col("vec_id"), col("px"), col("py")))
    regionRollup(p, inside)
  }

  /** Shared membership → (region_id, n_points, centroid) readout of
    * the two region-join rows, including the region −1 not-in-any row. */
  private def regionRollup(p: DataFrame, inside: DataFrame): DataFrame = {
    val perRegion = inside.groupBy(col("region_id"))
      .agg(count(lit(1)).as("n_points"),
        expr("(1000 * sum(px)) div count(*)").as("cx_milli"),
        expr("(1000 * sum(py)) div count(*)").as("cy_milli"))
    val outside = p
      .join(inside.select(col("vec_id").as("i_id")),
        col("vec_id") === col("i_id"), "left_anti")
      .agg(count(lit(1)).as("n_points"),
        expr("(1000 * sum(px)) div count(*)").as("cx_milli"),
        expr("(1000 * sum(py)) div count(*)").as("cy_milli"))
      .select(lit(-1L).as("region_id"), col("n_points"),
        col("cx_milli"), col("cy_milli"))
    perRegion.unionAll(outside)
  }

  /** Global closest pairs — the top-5 tightest point pairs by squared
    * distance, found WITHOUT a global all-pairs pass: candidates are
    * [[geoRadiusJoin]]'s cell-bounded relation (any pair closer than
    * the 20-unit horizon is inside one 3×3 probe ring by
    * construction), and the global top-5 filters the UNCAST
    * row_number so the rank plans as a partial WindowGroupLimit —
    * every map task pre-trims to 5 rows before the single-partition
    * stitch, so the exchange carries 5·tasks rows, never the
    * candidate relation. Contract: pairs beyond the horizon are out
    * of scope (at any real density the closest pairs are far inside
    * it; a corpus sparse enough to violate that reads [[geoHotspot]]
    * first and widens the cell). Ties break (d2, id_a, id_b) —
    * deterministic in both engines. */
  def geoClosestPair(spark: SparkSession, sfDir: String): DataFrame =
    geoRadiusJoin(spark, sfDir)
      .withColumn("rk0", row_number().over(
        Window.orderBy(col("d2"), col("id_a"), col("id_b"))))
      .filter(col("rk0") <= 5)
      .select(col("rk0").cast("bigint").as("rk"),
        col("id_a"), col("id_b"), col("d2"))

  /** Discrete kernel density — the smoothed heat-map layer: each
    * occupied 100-cell spreads its point mass over its 3×3
    * neighborhood with integer kernel weights (center 4, edge 2,
    * corner 1 — a binomial-ish 2-D kernel with Σw = 16), and the
    * top-20 densest cells report. The smear runs over the CELL
    * relation (domain-bounded, like [[geoHotspot]]'s ring), never the
    * points — a point contributes to its cell's count map-side and
    * the 9-way explode touches occupied cells only; the top-20
    * filters the uncast rank (partial WindowGroupLimit). All integer;
    * the oracle spells the offsets as a VALUES cross join. */
  def geoKde(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = points(spark, sfDir)
      .select(expr("px div 100").as("cx"), expr("py div 100").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
    val offs = Seq(-1L, 0L, 1L)
    cells.select(col("n"),
        explode(array((for { dx <- offs; dy <- offs } yield
          struct((col("cx") + lit(dx)).as("gx"), (col("cy") + lit(dy)).as("gy"),
            lit(if (dx == 0 && dy == 0) 4L
                else if (dx == 0 || dy == 0) 2L else 1L).as("w"))): _*)).as("g"))
      .groupBy(col("g.gx").as("cell_x"), col("g.gy").as("cell_y"))
      .agg(sum(col("n") * col("g.w")).as("density"))
      .withColumn("rk0", row_number().over(
        Window.orderBy(col("density").desc, col("cell_x"), col("cell_y"))))
      .filter(col("rk0") <= 20)
      .select(col("rk0").cast("bigint").as("rk"),
        col("cell_x"), col("cell_y"), col("density"))
  }

  /** Zonal label statistics — [[geoChoropleth]]'s dominant-label
    * readout computed per REGION instead of per cell: for each catalog
    * polygon the contained-point count, the dominant label, its votes,
    * and the integer purity. Containment rides [[regionMembership]]
    * (broadcast cell cover + exact winding test — candidates never
    * leave the point's home cell), labels arrive by one vec_id
    * equi-join, and the argmax is the same map-side max_by over
    * (votes, −label) — one row per (region, label) crosses the
    * exchange, ties to the smallest label. The oracle spells the
    * quadratic winding test + rank-1 window. */
  def geoZonalStats(spark: SparkSession, sfDir: String): DataFrame = {
    val p = graft.core.QueryCaches.track(points(spark, sfDir))
    val lab = load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = regionMembership(p, 200L)
      .join(lab, "vec_id")
      .groupBy(col("region_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy(col("region_id"))
      .agg(sum(col("votes")).as("n"),
        max_by(col("label"), struct(col("votes"), -col("label"))).as("top_label"),
        max(struct(col("votes"), -col("label"))).getField("votes").as("top_votes"))
      .select(col("region_id"), col("n"), col("top_label"), col("top_votes"),
        expr("(1000 * top_votes) div n").as("purity_milli"))
  }

  /** Local Outlier Factor — density-based anomaly scoring done the
    * radius-bounded way: neighborhoods are [[geoKnn]]'s top-≤3 within
    * the 50-unit ring (k-distance is DEFINED for every point that
    * appears — an id_b row proves at least one in-radius neighbor),
    * reachability is max(d², kdist(b)), local reachability density is
    * the exact integer lrd_micro = n_nbrs·10⁶ div Σreach, and the LOF
    * ratio is Σ lrd(b)·1000 div (n_nbrs · lrd(a)) — > 1000 means the
    * point is in a sparser neighborhood than its neighbors, the
    * classic outlier signal. The Σreach = 0 degenerate (a fully
    * coincident neighborhood) floors to 1 micro-unit via GREATEST —
    * spelled identically in both engines, so no division ever NULLs.
    * Everything is candidate-bounded (≤3 rows per point after the
    * partial-top-k trim) and the top-20 readout filters the uncast
    * rank. The oracle spells the quadratic kNN + identical integer
    * algebra. */
  def geoLof(spark: SparkSession, sfDir: String): DataFrame =
    lofScores(graft.core.QueryCaches.track(geoKnn(spark, sfDir)))
      .withColumn("rk0", row_number().over(
        Window.orderBy(col("lof_milli").desc, col("vec_id"))))
      .filter(col("rk0") <= 20)
      .select(col("rk0").cast("bigint").as("rk"), col("vec_id"),
        col("n_nbrs"), col("lrd_micro"), col("lof_milli"))

  /** The LOF integer algebra over ANY ranked (id_a, rk, id_b, d2)
    * neighbor relation (shared by the gated [[geoLof]] row and the
    * 1M-point scale smoke): kdist/count per point, reachability
    * max(d², kdist(b)), lrd_micro, and the lof_milli ratio — all
    * candidate-bounded equi-joins, nothing quadratic. lrd_micro floors
    * to 0 whenever average reachability exceeds 10⁶ (micro-scale
    * densities), so the lof_milli denominator carries the same
    * GREATEST(…, 1) guard as lrd itself — a floored neighborhood reads
    * as "infinitely sparse" (huge lof_milli) instead of dividing by
    * zero; callers on such scales should re-scale d² first. */
  def lofScores(knn: DataFrame): DataFrame = {
    val kd = graft.core.QueryCaches.track(
      knn.groupBy(col("id_a")).agg(
        count(lit(1)).as("n_nbrs"), max(col("d2")).as("kdist")))
    val reach = knn
      .join(kd.select(col("id_a").as("id_b"), col("kdist").as("kdist_b")), "id_b")
      .groupBy(col("id_a"))
      .agg(sum(greatest(col("d2"), col("kdist_b"))).as("sum_reach"))
    val lrd = graft.core.QueryCaches.track(
      kd.join(reach, "id_a")
        .select(col("id_a"), col("n_nbrs"),
          expr("(n_nbrs * 1000000) div greatest(sum_reach, CAST(1 AS BIGINT))")
            .as("lrd_micro")))
    knn.select(col("id_a"), col("id_b"))
      .join(lrd.select(col("id_a").as("id_b"), col("lrd_micro").as("lrd_b")), "id_b")
      .groupBy(col("id_a"))
      .agg(sum(col("lrd_b")).as("sum_lrd_b"))
      .join(lrd, "id_a")
      .select(col("id_a").as("vec_id"), col("n_nbrs"), col("lrd_micro"),
        expr("(sum_lrd_b * 1000) div greatest(n_nbrs * lrd_micro, CAST(1 AS BIGINT))")
          .as("lof_milli"))
  }

  // ── Trajectory analytics ───────────────────────────────────────────
  // The suite above treats points as a static cloud; a location-bearing
  // event log is a set of TRAJECTORIES — per-entity time-ordered paths —
  // and the ops a mobility corpus needs (dwell detection, OD flows,
  // co-traveler discovery) are sequence ops, not cloud ops. Positions
  // derive deterministically from the events table: each event carries
  // an integer step dx,dy ∈ [-10,10]² mixed from its event_id (Knuth
  // multiplicative hash, all-positive BIGINT arithmetic — identical in
  // both engines), and the position is the per-user running sum in
  // (ts, event_id) order. Every per-user window is PARTITIONED (the
  // user axis is the parallelism axis at 100 TB — a billion users
  // hash-spread across executors; no single-partition window anywhere).
  //
  // Sign discipline: a user with ≳10⁴ events CAN drift x or y below
  // zero (the 1000 offset is a convenience, not a bound). Every zone /
  // cell snap downstream therefore uses TRUNCATING integer division,
  // which all three surfaces agree on for any sign — Spark `div`,
  // DuckDB `//`, and Scala `Long./` all round toward zero — so engine
  // parity and the stream==batch twins hold on negative coordinates
  // too (StreamingSpec's reference rollups use plain `/` for the same
  // reason). Truncation does merge cells ±0 across the origin (cell 0
  // spans (-cell, cell)); the snap is a bucketing, not a geodesic, so
  // the only contract that matters is that every engine buckets
  // identically — which truncation gives and floor (floorDiv vs `div`)
  // would not.

  /** (user_id, event_id, tus, dx, dy, x, y): the deterministic
    * random-walk trajectory relation shared by the three rows below.
    * µs basis like every events query (`ts div 1000` matches DuckDB's
    * epoch_us). One sort-shuffle by user establishes the walk; every
    * consumer reuses it. */
  private def traj(spark: SparkSession, sfDir: String): DataFrame =
    trajOf(loadEvents(spark, sfDir))

  /** The walk over ANY events relation carrying (user_id, event_id,
    * ts-nanos) — the library surface the scale smokes drive with the
    * `graft-events` generator at 10M+ rows.
    *
    * The Knuth mix reduces BOTH factors mod 2¬³¹−1 BEFORE multiplying:
    * 2654435761 ≡ 506952114 (mod 2147483647), so h is bit-identical to
    * the naive (event_id · 2654435761) % p for every event_id — but the
    * product now peaks at (p−1)·506952114 ≈ 1.09e18 < 2⁶³, so the walk
    * is overflow-free for any NON-NEGATIVE int64 event_id — the
    * generator contract; a negative event_id would make both engines'
    * `%` return a negative remainder (engine parity still holds, but h
    * < 0 pushes dx/dy outside [−10,10], silently changing the walk
    * semantics), so negative ids are out of contract, not merely
    * unexercised. (The naive unreduced spelling wraps negative past
    * event_id ≈ 3.47e9 — exactly the billion-event scale this suite
    * targets — where Spark would silently produce negative remainders
    * and DuckDB would raise.) */
  def trajOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"),
        (((col("event_id") % lit(2147483647L)) * lit(506952114L))
          % lit(2147483647L)).as("h"))
      .select(col("user_id"), col("event_id"), col("tus"),
        (col("h") % lit(21L) - lit(10L)).as("dx"),
        (expr("h div 21") % lit(21L) - lit(10L)).as("dy"))
      .withColumn("x", lit(1000L) + sum(col("dx")).over(w))
      .withColumn("y", lit(1000L) + sum(col("dy")).over(w))
  }

  /** Stay-point (dwell) detection — the trajectory op that turns a raw
    * GPS log into semantic places (Li et al.-style, integer-exact):
    * a stay is a maximal run of consecutive small steps (|dx|,|dy| ≤ 3
    * — the walker is lingering) plus its anchor point, reported when it
    * spans ≥ 3 events, with duration and the integer centroid. Classic
    * gaps-and-islands: the run id is a running sum of break flags over
    * the SAME per-user window the walk itself used, so the whole query
    * is ONE sort-shuffle by user + one hash aggregate — no joins, no
    * second exchange, and per-user state never materializes beyond the
    * window frame. The oracle spells the identical flag/cumsum algebra. */
  def geoStayPoints(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    traj(spark, sfDir)
      .withColumn("brk",
        when(abs(col("dx")) <= 3 && abs(col("dy")) <= 3, 0L).otherwise(1L))
      .withColumn("rn", row_number().over(w))
      .withColumn("run_id", sum(when(col("rn") === 1, 1L).otherwise(col("brk")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(count(lit(1)).as("n_events"), min(col("tus")).as("start_us"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"),
        expr("(1000 * sum(x)) div count(1)").as("cx_milli"),
        expr("(1000 * sum(y)) div count(1)").as("cy_milli"))
      .filter(col("n_events") >= 3L)
  }

  /** Origin–destination matrix — daily flows between zones (cell = 50):
    * per (user, day) the first and last trajectory position, rolled up
    * to (origin zone → destination zone) trip counts and distinct
    * movers. The endpoints come from ONE hash aggregate via orderable
    * struct min/max on the unique (tus, event_id) key — no window, no
    * sort: at 100 TB this is a map-side-combinable aggregate by
    * (user, day) followed by a zone-pair rollup, two exchanges total.
    * The oracle spells the window spelling (row_number asc/desc = 1)
    * over the same walk — hash equality pins argmin-by-struct ==
    * rank-1-by-window. */
  def geoOdMatrix(spark: SparkSession, sfDir: String): DataFrame =
    traj(spark, sfDir)
      .withColumn("day", expr("tus div 86400000000"))
      .groupBy(col("user_id"), col("day"))
      .agg(min(struct(col("tus"), col("event_id"), col("x"), col("y"))).as("o"),
        max(struct(col("tus"), col("event_id"), col("x"), col("y"))).as("d"))
      .select(col("user_id"),
        expr("o.x div 50").as("o_zx"), expr("o.y div 50").as("o_zy"),
        expr("d.x div 50").as("d_zx"), expr("d.y div 50").as("d_zy"))
      .groupBy(col("o_zx"), col("o_zy"), col("d_zx"), col("d_zy"))
      .agg(count(lit(1)).as("n_trips"),
        countDistinct(col("user_id")).as("n_users"))

  /** Co-traveler discovery — pairs of users whose trajectories share ≥ 2
    * distinct (hour, cell) space-time buckets (cell = 25). The spatial
    * twin of MinHash banding with TIME as an extra band coordinate:
    * distinct user/bucket visits pair in a (hb, cx, cy) equi-join, so
    * candidate volume is Σ occupancy², never users². The hot-bucket cap
    * (> 8 distinct users ⇒ bucket excluded — a stadium hour says
    * nothing about co-travel anyway) is the same oracle-verified skew
    * guard every candidate family carries — and it genuinely bites here
    * (at sf0.1, 2151 of 25891 buckets are hot and fall away; the oracle
    * spells the identical HAVING so the recall trade is hash-checked,
    * not assumed). Distinct-first matters: a
    * user lingering in one cell for an hour contributes ONE visit, so
    * n_shared counts shared PLACES-hours, not event coincidences. */
  def geoCotravel(spark: SparkSession, sfDir: String): DataFrame =
    cotravelPairs(traj(spark, sfDir))

  /** The co-travel pairing over ANY trajectory relation carrying
    * (user_id, tus, x, y) — cap and support are parameters so the
    * scale smoke can drive the same code the gated row runs. At 1M-user
    * urban density the cap is not a refinement, it is what makes the
    * query runnable at all: the origin-crowd buckets hold hundreds of
    * users each and would pair occupancy² (billions of candidates)
    * without it. */
  def cotravelPairs(t: DataFrame, cap: Long = 8L, minShared: Long = 2L): DataFrame =
    cotravelPairsOf(cotravelCool(t, cap), minShared)

  /** The capped distinct-visit relation (user_id, hb, cx, cy) the
    * co-travel family shares — ONE definition of the (hour, cell)
    * banding and the hot-bucket cap, so [[geoCotravel]]'s raw counts
    * and [[geoCotravelLift]]'s scoring can never desynchronize on a
    * cap/cell change. Tracked: both the pairing and the per-user /
    * universe stitches re-read it. */
  def cotravelCool(t: DataFrame, cap: Long = 8L): DataFrame = {
    val uk = graft.core.QueryCaches.track(
      t.select(col("user_id"), expr("tus div 3600000000").as("hb"),
          expr("x div 25").as("cx"), expr("y div 25").as("cy"))
        .distinct())
    val ok = uk.groupBy(col("hb"), col("cx"), col("cy"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= cap)
      .select(col("hb"), col("cx"), col("cy"))
    uk.join(ok, Seq("hb", "cx", "cy"), "left_semi")
  }

  /** The bucket-keyed pairing over an already-capped visit relation. */
  def cotravelPairsOf(cool: DataFrame, minShared: Long = 2L): DataFrame =
    cool.select(col("hb"), col("cx"), col("cy"), col("user_id").as("user_a"))
      .join(cool.select(col("hb"), col("cx"), col("cy"), col("user_id").as("user_b")),
        Seq("hb", "cx", "cy"))
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Zone-transition matrix — the mobility Markov chain (the input to
    * next-location prediction and zone-flow modeling): consecutive
    * trajectory steps per user, snapped to zones (cell = 50), rolled
    * up to (from → to) transition counts with self-loops excluded
    * (staying put is [[geoStayPoints]]'s signal, not a transition).
    * The lag rides the SAME per-user (tus, tie) window the walk paid
    * for — no new sort — and the rollup relation is zone-pair-domain
    * bounded, so the top-20 readout's rank costs nothing at any corpus
    * scale (rank filter on the uncast row_number → partial
    * WindowGroupLimit). */
  def geoZoneTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val z = traj(spark, sfDir)
      .select(col("user_id"), col("tus"), col("event_id"),
        expr("x div 50").as("zx"), expr("y div 50").as("zy"))
      .withColumn("pzx", lag(col("zx"), 1).over(w))
      .withColumn("pzy", lag(col("zy"), 1).over(w))
      .filter(col("pzx").isNotNull &&
        (col("pzx") =!= col("zx") || col("pzy") =!= col("zy")))
      .groupBy(col("pzx").as("from_zx"), col("pzy").as("from_zy"),
        col("zx").as("to_zx"), col("zy").as("to_zy"))
      .agg(count(lit(1)).as("n_trans"),
        countDistinct(col("user_id")).as("n_users"))
    z.withColumn("rk0", row_number().over(Window.orderBy(col("n_trans").desc,
        col("from_zx"), col("from_zy"), col("to_zx"), col("to_zy"))))
      .filter(col("rk0") <= 20)
      .select(col("rk0").cast("bigint").as("rk"), col("from_zx"), col("from_zy"),
        col("to_zx"), col("to_zy"), col("n_trans"), col("n_users"))
  }

  /** Jump-length distribution — the Lévy-flight diagnostic (González
    * et al. 2008 fit truncated power laws to exactly this histogram):
    * per step the squared displacement d² bins by its integer binade
    * (floor-log2 via length(bin(d2)) — the engine-neutral idiom),
    * zero-length steps in their own bucket. One window pass the walk
    * already pays + one domain-bounded aggregate (≤ 64 buckets
    * forever). ppm shares ride a 1-row total broadcast, never a global
    * window. */
  def geoJumpLengths(spark: SparkSession, sfDir: String): DataFrame = {
    val d = traj(spark, sfDir)
      .select((col("dx") * col("dx") + col("dy") * col("dy")).as("d2"))
    val b = d.select(when(col("d2") === 0L, -1L)
        .otherwise(length(bin(col("d2"))).cast("bigint") - 1L).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_steps"))
    val tot = b.agg(sum(col("n_steps")).as("n_total"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_steps"),
        expr("(1000000 * n_steps) div n_total").as("share_ppm"))
  }

  /** Co-travel SIGNIFICANCE — the statistical refinement
    * [[geoCotravel]]'s raw counts need before anyone acts on them: two
    * heavy travelers share buckets by chance, so each surviving pair
    * is scored against independence — lift_ppm = 10⁶ · n_shared · N
    * div (n_a · n_b), where n_a/n_b are the users' cool-bucket visit
    * counts and N the cool-bucket universe (PMI's ratio over the
    * space-time bucket domain, integer-exact). lift ≫ 10⁶ means the
    * pair co-occurs far above chance — the actual co-traveler signal;
    * a pair of mall-rats at 10⁶ is noise. Per-user counts are one
    * reuse of the distinct-visit relation and the universe is a 1-row
    * broadcast, so the scoring adds two cheap stitches to the pairing
    * plan. */
  def geoCotravelLift(spark: SparkSession, sfDir: String): DataFrame = {
    val cool = graft.core.QueryCaches.track(cotravelCool(traj(spark, sfDir)))
    val pairs = cotravelPairsOf(cool)
    val per = cool.groupBy(col("user_id")).agg(count(lit(1)).as("nv"))
    val universe = cool.select(col("hb"), col("cx"), col("cy")).distinct()
      .agg(count(lit(1)).as("n_buckets"))
    pairs
      .join(per.select(col("user_id").as("user_a"), col("nv").as("n_a")), "user_a")
      .join(per.select(col("user_id").as("user_b"), col("nv").as("n_b")), "user_b")
      .crossJoin(broadcast(universe))
      .select(col("user_a"), col("user_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("(1000000 * n_shared * n_buckets) div (n_a * n_b)").as("lift_ppm"))
  }

  /** The anchor-point catalog for [[geoMapMatch]]: an 11×11 grid of
    * literal infrastructure points (cell towers / road nodes / POIs)
    * spaced 40 apart over the walk's home range — broadcastable by
    * contract, like every facility catalog. Snap radius 25 < the 40
    * spacing, so genuinely OFF-NETWORK positions exist (the points a
    * matcher must NOT force onto an anchor). */
  private val anchors: Seq[(Long, Long, Long)] =
    for { i <- 0L to 10L; j <- 0L to 10L }
      yield (i * 11L + j + 1L, 800L + 40L * i, 800L + 40L * j)

  /** Map-matching / anchor-sequence extraction — the mobility pillar's
    * join-to-infrastructure shape (snap a raw trajectory onto a known
    * catalog, then read the path as anchor visits): each walk position
    * snaps to its nearest catalog anchor within radius 25 (ties to the
    * smallest anchor id — deterministic, where a naive matcher is
    * first-come), off-network positions snap to −1, and maximal runs
    * of consecutive same-anchor positions roll up into VISITS — per
    * (user, run) the anchor, dwell length, entry time, and duration.
    * An off-network excursion BREAKS the run (A → gap → A is two
    * visits, the map-matching convention), then drops from the
    * readout.
    *
    * 100 TB plan — the [[geoRadiusJoin]] cell discipline fused with
    * [[geoVoronoi]]'s projection argmin: the catalog expands
    * driver-side into (cell → in-ring anchor array) cover rows (cell
    * width = radius, so any in-radius anchor is in the position's home
    * cell's 3×3 ring — the cover is LOSSLESS), the cover BROADCASTS,
    * each position left-joins its single home cell, and the
    * nearest-anchor argmin is an IN-ROW array_min over (d², aid)
    * structs — no per-point aggregate, no second exchange. The visit
    * rollup rides the SAME per-user (tus, tie) window the walk paid
    * for, and the final groupBy(user, run) is satisfied by the
    * window's user partitioning (the geoStayPoints shape). The walk
    * relation is scanned ONCE end to end (PlanSpec pins: one events
    * scan, anchors broadcast, no shuffle join). The oracle spells the
    * quadratic CROSS JOIN + rank-1 argmin + identical islands fold. */
  /** The stateless anchor SNAP for ANY (user_id, tus, event_id, x, y)
    * relation — batch or STREAMING (a broadcast equi-join + in-row
    * argmin projection, both streaming-legal; the [[regionMembership]]
    * posture): nearest catalog anchor within radius 25 via the
    * lossless cell cover, −1 when off-network. Shared by
    * [[geoMapMatch]] and the streaming twin
    * [[graft.streaming.GraftStream.anchorVisitUpdates]]'s test feed —
    * ONE snap definition, two execution modes. */
  def anchorSnap(t: DataFrame): DataFrame = {
    val spark2 = t.sparkSession
    import spark2.implicits._
    val R = 25L
    val cover = anchors.flatMap { case (aid, ax, ay) =>
      for { dx <- -1L to 1L; dy <- -1L to 1L }
        yield ((ax / R + dx, ay / R + dy), (aid, ax, ay))
    }.groupBy(_._1).toSeq
      .map { case ((gx, gy), as) => (gx, gy, as.map(_._2).sortBy(_._1)) }
      .toDF("gx", "gy", "cands")
    t.withColumn("gx", expr(s"x div $R")).withColumn("gy", expr(s"y div $R"))
      .join(broadcast(cover), Seq("gx", "gy"), "left")
      .withColumn("aid", coalesce(
        array_min(filter(
          transform(col("cands"), a =>
            struct(((col("x") - a.getField("_2")) * (col("x") - a.getField("_2")) +
              (col("y") - a.getField("_3")) * (col("y") - a.getField("_3"))).as("d2"),
              a.getField("_1").as("aid"))),
          s => s.getField("d2") <= lit(R * R))).getField("aid"),
        lit(-1L)))
      .select(col("user_id"), col("tus"), col("event_id"), col("aid"))
  }

  /** The snap + islands rollup over ANY trajectory relation — the
    * library surface the 10M-event scale smoke drives with the same
    * code the gated row runs. */
  def anchorVisits(t: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    anchorSnap(t)
      .withColumn("rn", row_number().over(w))
      .withColumn("brk", when(col("rn") === 1 ||
        lag(col("aid"), 1).over(w) =!= col("aid"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("aid") >= 0L)
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("aid")).as("anchor_id"), count(lit(1)).as("n_points"),
        min(col("tus")).as("enter_us"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
  }

  def geoMapMatch(spark: SparkSession, sfDir: String): DataFrame =
    anchorVisits(traj(spark, sfDir))

  /** Co-location EPISODES — the temporal refinement [[geoCotravel]]'s
    * flat bucket counts and [[geoCotravelLift]]'s significance scores
    * both lack: HOW a pair's shared hours arrange. Two users sharing 6
    * scattered lunch hours and two users sharing one continuous 6-hour
    * block have the same n_shared but mean completely different things
    * (routine overlap vs an actual joint trip) — the episode structure
    * is the readout an analyst acts on. Pairs come from the SAME
    * capped cool-bucket equi-join as the co-travel family
    * ([[cotravelCool]] — one definition of the banding and the skew
    * cap), the (pair, hour) relation is distinct (a pair sharing 3
    * cells in one hour has ONE co-located hour), and maximal runs of
    * CONSECUTIVE shared hours roll up via gaps-and-islands (hb −
    * row_number over the pair-partitioned window — partitioned on the
    * pair axis, never global). Per surviving pair: episode count,
    * longest episode, total co-located hours, first hour. Plan: all
    * candidate volume is bucket-bounded (the cap), the islands window
    * partitions by pair, and the rollups are map-side combinable. */
  def geoEncounters(spark: SparkSession, sfDir: String): DataFrame = {
    val cool = graft.core.QueryCaches.track(cotravelCool(traj(spark, sfDir)))
    val ph = cool.select(col("hb"), col("cx"), col("cy"), col("user_id").as("user_a"))
      .join(cool.select(col("hb"), col("cx"), col("cy"), col("user_id").as("user_b")),
        Seq("hb", "cx", "cy"))
      .filter(col("user_a") < col("user_b"))
      .select(col("user_a"), col("user_b"), col("hb"))
      .distinct()
    val w = Window.partitionBy(col("user_a"), col("user_b")).orderBy(col("hb"))
    ph.withColumn("isl", col("hb") - row_number().over(w))
      .groupBy(col("user_a"), col("user_b"), col("isl"))
      .agg(count(lit(1)).as("n_hours"), min(col("hb")).as("start_hb"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_episodes"), max(col("n_hours")).as("max_hours"),
        sum(col("n_hours")).as("tot_hours"), min(col("start_hb")).as("first_hb"))
      .filter(col("tot_hours") >= 2L)
  }

  /** Home/work anchor detection — the Song/González-school mobility
    * profile every location corpus gets mined for: per user, the
    * dominant cell by visit count during WORK hours (8–17 local,
    * hour-of-day = hb mod 24) and during the complementary HOME
    * period, with the period's total visits and an integer focus share
    * (how concentrated the period is on its top cell — a 1000‰ work
    * focus is a fixed desk; 100‰ is a field job). The argmax is the
    * [[geoChoropleth]] map-side max_by over a unique ordering struct
    * (count, −cx, −cy) — ties break to the smallest cell,
    * deterministic in both engines, one row per (user, period) crosses
    * the final exchange. Two stacked map-side-combinable aggregates;
    * the user axis parallelizes everything. */
  def geoHomeWork(spark: SparkSession, sfDir: String): DataFrame = {
    val v = traj(spark, sfDir)
      .select(col("user_id"),
        when(expr("(tus div 3600000000) % 24").between(8, 17), lit("work"))
          .otherwise(lit("home")).as("period"),
        expr("x div 25").as("cx"), expr("y div 25").as("cy"))
      .groupBy(col("user_id"), col("period"), col("cx"), col("cy"))
      .agg(count(lit(1)).as("c"))
    v.groupBy(col("user_id"), col("period"))
      .agg(sum(col("c")).as("n_visits"),
        max_by(struct(col("cx"), col("cy")),
          struct(col("c"), -col("cx"), -col("cy"))).as("top"),
        max(struct(col("c"), -col("cx"), -col("cy"))).getField("c").as("top_visits"))
      .select(col("user_id"), col("period"), col("n_visits"),
        col("top.cx").as("cell_x"), col("top.cy").as("cell_y"),
        col("top_visits"),
        expr("(1000 * top_visits) div n_visits").as("focus_milli"))
  }

  /** Radius of gyration per user — the mobility-scale statistic
    * (González et al. 2008): rg² = mean squared distance from the
    * trajectory centroid, integer-exact via the sum-of-squares
    * identity n²·rg² = n·Σ(x²+y²) − (Σx)² − (Σy)², so ONE map-side-
    * combinable hash aggregate per user computes it — four integer
    * sums, no centroid pre-pass, no window beyond the walk itself.
    * Domain bound: n·Σ(x²+y²) must stay in int64 — fine to ~10⁵
    * points/user at this coordinate scale; a corpus with heavier
    * users rescales coordinates or lifts the sums to DECIMAL first
    * (the dsum posture). The per-user relation IS the readout — the
    * home-ranger vs roamer split a mobility corpus is mined for. */
  def geoGyration(spark: SparkSession, sfDir: String): DataFrame =
    traj(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x") + col("y") * col("y")).as("sq"))
      .select(col("user_id"), col("n_points"),
        expr("(n_points * sq - sx * sx - sy * sy) div (n_points * n_points)")
          .as("rg2"))

  /** Per-user location entropy in exact millibits (Song et al. 2010's
    * predictability input): H = log₂n − (Σ c·log₂c)/n over the user's
    * cell-visit histogram (cell = 25), computed on the shared integer
    * fast-log ([[graft.functions.HashKernels.log2Millis]] — binade
    * floor-log2 + piecewise-linear fraction, bit-identical to the
    * oracle's length(bin(q))−1 spelling, no libm ULP ever crosses the
    * hash gate). Two stacked hash aggregates — (user, cell) counts,
    * then the per-user fold — both map-side combinable; at 100 TB the
    * user axis is the hash-partition axis and nothing else shuffles.
    * n_cells beside h_milli gives the naive diversity baseline the
    * entropy refines (a user with 20 cells visited 95% from one of
    * them reads high-diversity but low-entropy). */
  def geoLocEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.HashExprs.log2Millis
    traj(spark, sfDir)
      .select(col("user_id"), expr("x div 25").as("cx"), expr("y div 25").as("cy"))
      .groupBy(col("user_id"), col("cx"), col("cy"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_points"), count(lit(1)).as("n_cells"),
        sum(col("c") * log2Millis(col("c"))).as("swl"))
      .select(col("user_id"), col("n_points"), col("n_cells"),
        (log2Millis(col("n_points")) - expr("swl div n_points")).as("h_milli"))
  }

  private def regionEdgeValues: String =
    regions.flatMap { case (rid, vs) =>
      regionEdges(vs).map { case (x1, y1, x2, y2) =>
        s"($rid, $x1, $y1, $x2, $y2)" }
    }.mkString(", ")

  private val pSql: String =
    """p AS MATERIALIZED (SELECT vec_id,
      |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT) + 2000 AS px,
      |  CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT) + 2000 AS py
      |FROM embeddings)""".stripMargin

  /** One quadratic winding-test spelling shared by geo_region_join
    * (broadcast cover) and geo_region_join_large (shuffle-side cover)
    * — the two rows differ only in Spark plan shape. */
  private lazy val regionJoinOracleSql: String =
    s"""WITH $pSql,
       |e(region_id, x1, y1, x2, y2) AS (VALUES $regionEdgeValues),
       |s AS (SELECT p.vec_id, p.px, p.py, e.region_id,
       |    (e.x2 - e.x1) * (p.py - e.y1) -
       |    (e.y2 - e.y1) * (p.px - e.x1) >= 0 AS inside_e
       |  FROM p CROSS JOIN e),
       |m AS (SELECT region_id, vec_id, px, py FROM s
       |  GROUP BY 1, 2, 3, 4 HAVING bool_and(inside_e)),
       |per_r AS (SELECT CAST(region_id AS BIGINT) AS region_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_points,
       |    (1000 * CAST(SUM(px) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
       |      AS cx_milli,
       |    (1000 * CAST(SUM(py) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
       |      AS cy_milli
       |  FROM m GROUP BY 1),
       |outs AS (SELECT CAST(-1 AS BIGINT) AS region_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_points,
       |    (1000 * CAST(SUM(px) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
       |      AS cx_milli,
       |    (1000 * CAST(SUM(py) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
       |      AS cy_milli
       |  FROM p WHERE vec_id NOT IN (SELECT vec_id FROM m))
       |SELECT * FROM per_r UNION ALL SELECT * FROM outs""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_radius_join" -> (geoRadiusJoin _),
    "geo_radius_join_capped" -> (geoRadiusJoinCapped _),
    "geo_rknn" -> (geoRknn _),
    "geo_choropleth" -> (geoChoropleth _),
    "geo_knn" -> (geoKnn _),
    "geo_hotspot" -> (geoHotspot _),
    "geo_pyramid" -> (geoPyramid _),
    "geo_region_join" -> (geoRegionJoin _),
    "geo_region_join_large" -> (geoRegionJoinLarge _),
    "geo_convex_hull" -> (geoConvexHull _),
    "geo_voronoi" -> (geoVoronoi _),
    "geo_closest_pair" -> (geoClosestPair _),
    "geo_kde" -> (geoKde _),
    "geo_zonal_stats" -> (geoZonalStats _),
    "geo_lof" -> (geoLof _),
    "geo_stay_points" -> (geoStayPoints _),
    "geo_od_matrix" -> (geoOdMatrix _),
    "geo_cotravel" -> (geoCotravel _),
    "geo_gyration" -> (geoGyration _),
    "geo_loc_entropy" -> (geoLocEntropy _),
    "geo_zone_transitions" -> (geoZoneTransitions _),
    "geo_jump_lengths" -> (geoJumpLengths _),
    "geo_cotravel_lift" -> (geoCotravelLift _),
    "geo_map_match" -> (geoMapMatch _),
    "geo_encounters" -> (geoEncounters _),
    "geo_home_work" -> (geoHomeWork _))

  /** The walk CTE shared by the trajectory oracles — byte-for-byte the
    * algebra [[traj]] computes (Knuth mix, [-10,10]² steps, per-user
    * running sum in (tus, event_id) order, all positive BIGINT). */
  private val trajSql: String =
    """g AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
      |        ((event_id % 2147483647) * 506952114) % 2147483647 AS h
      |      FROM events),
      |st AS (SELECT user_id, event_id, tus,
      |        (h % 21) - 10 AS dx, ((h // 21) % 21) - 10 AS dy FROM g),
      |traj AS (SELECT user_id, event_id, tus, dx, dy,
      |    1000 + CAST(SUM(dx) OVER (PARTITION BY user_id
      |      ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS x,
      |    1000 + CAST(SUM(dy) OVER (PARTITION BY user_id
      |      ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS y
      |  FROM st)""".stripMargin

  /** DuckDB spelling of the millibit fast-log (binade + linear
    * fraction) — the standard oracle idiom, see TextQueries. */
  private def mbSql(q: String): String =
    s"(CAST((length(bin($q)) - 1) * 1000 AS BIGINT) + " +
      s"(($q - (CAST(1 AS BIGINT) << (length(bin($q)) - 1))) * 1000) // " +
      s"(CAST(1 AS BIGINT) << (length(bin($q)) - 1)))"

  val oracleSql: Map[String, String] = Map(
    "geo_encounters" ->
      s"""WITH $trajSql,
         |uk AS MATERIALIZED (SELECT DISTINCT user_id, tus // 3600000000 AS hb,
         |    x // 25 AS cx, y // 25 AS cy FROM traj),
         |ok AS (SELECT hb, cx, cy FROM uk GROUP BY 1, 2, 3
         |  HAVING COUNT(*) <= 8),
         |cool AS MATERIALIZED (SELECT uk.* FROM uk JOIN ok USING (hb, cx, cy)),
         |ph AS (SELECT DISTINCT a.user_id AS user_a, b.user_id AS user_b, a.hb
         |  FROM cool a JOIN cool b
         |    ON a.hb = b.hb AND a.cx = b.cx AND a.cy = b.cy
         |   AND a.user_id < b.user_id),
         |r AS (SELECT user_a, user_b, hb,
         |    hb - row_number() OVER (PARTITION BY user_a, user_b
         |      ORDER BY hb) AS isl
         |  FROM ph),
         |e AS (SELECT user_a, user_b, isl, CAST(COUNT(*) AS BIGINT) AS n_hours,
         |    MIN(hb) AS start_hb
         |  FROM r GROUP BY 1, 2, 3)
         |SELECT user_a, user_b, CAST(COUNT(*) AS BIGINT) AS n_episodes,
         |  CAST(MAX(n_hours) AS BIGINT) AS max_hours,
         |  CAST(SUM(n_hours) AS BIGINT) AS tot_hours,
         |  MIN(start_hb) AS first_hb
         |FROM e GROUP BY 1, 2 HAVING SUM(n_hours) >= 2""".stripMargin,
    "geo_home_work" ->
      s"""WITH $trajSql,
         |v AS (SELECT user_id,
         |    CASE WHEN (tus // 3600000000) % 24 BETWEEN 8 AND 17
         |      THEN 'work' ELSE 'home' END AS period,
         |    x // 25 AS cx, y // 25 AS cy, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM traj GROUP BY 1, 2, 3, 4),
         |t AS (SELECT user_id, period, cx, cy, c,
         |    row_number() OVER (PARTITION BY user_id, period
         |      ORDER BY c DESC, cx, cy) AS rk,
         |    CAST(SUM(c) OVER (PARTITION BY user_id, period) AS BIGINT)
         |      AS n_visits
         |  FROM v)
         |SELECT user_id, period, n_visits, cx AS cell_x, cy AS cell_y,
         |  c AS top_visits, (1000 * c) // n_visits AS focus_milli
         |FROM t WHERE rk = 1""".stripMargin,
    "geo_map_match" -> {
      val anchorValues = anchors.map { case (aid, ax, ay) =>
        s"($aid, $ax, $ay)" }.mkString(", ")
      s"""WITH $trajSql,
         |a(aid, ax, ay) AS (VALUES $anchorValues),
         |cand AS (SELECT t.user_id, t.tus, t.event_id, a.aid,
         |    (t.x - a.ax) * (t.x - a.ax) + (t.y - a.ay) * (t.y - a.ay) AS d2
         |  FROM traj t CROSS JOIN a
         |  WHERE (t.x - a.ax) * (t.x - a.ax) +
         |        (t.y - a.ay) * (t.y - a.ay) <= 625),
         |best AS (SELECT user_id, tus, event_id, CAST(aid AS BIGINT) AS aid
         |  FROM (SELECT user_id, tus, event_id, aid, row_number() OVER (
         |      PARTITION BY user_id, tus, event_id ORDER BY d2, aid) AS rk
         |    FROM cand) WHERE rk = 1),
         |m AS (SELECT t.user_id, t.tus, t.event_id,
         |    COALESCE(b.aid, -1) AS aid
         |  FROM traj t LEFT JOIN best b ON t.user_id = b.user_id
         |    AND t.tus = b.tus AND t.event_id = b.event_id),
         |f AS (SELECT user_id, tus, event_id, aid,
         |    CASE WHEN row_number() OVER w = 1
         |           OR lag(aid) OVER w <> aid THEN 1 ELSE 0 END AS brk
         |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |r AS (SELECT user_id, tus, aid,
         |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
         |  FROM f)
         |SELECT user_id, run_id, MIN(aid) AS anchor_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_points,
         |  MIN(tus) AS enter_us, MAX(tus) - MIN(tus) AS dur_us
         |FROM r WHERE aid >= 0 GROUP BY 1, 2""".stripMargin
    },
    "geo_gyration" ->
      s"""WITH $trajSql,
         |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x + y * y) AS BIGINT) AS sq
         |  FROM traj GROUP BY 1)
         |SELECT user_id, n_points,
         |  (n_points * sq - sx * sx - sy * sy) // (n_points * n_points) AS rg2
         |FROM a""".stripMargin,
    "geo_loc_entropy" ->
      s"""WITH $trajSql,
         |v AS (SELECT user_id, x // 25 AS cx, y // 25 AS cy,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM traj GROUP BY 1, 2, 3),
         |a AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_points,
         |    CAST(COUNT(*) AS BIGINT) AS n_cells,
         |    CAST(SUM(c * ${mbSql("c")}) AS BIGINT) AS swl
         |  FROM v GROUP BY 1)
         |SELECT user_id, n_points, n_cells,
         |  ${mbSql("n_points")} - swl // n_points AS h_milli
         |FROM a""".stripMargin,
    "geo_zone_transitions" ->
      s"""WITH $trajSql,
         |z AS (SELECT user_id, tus, event_id, x // 50 AS zx, y // 50 AS zy,
         |    lag(x // 50) OVER (PARTITION BY user_id
         |      ORDER BY tus, event_id) AS pzx,
         |    lag(y // 50) OVER (PARTITION BY user_id
         |      ORDER BY tus, event_id) AS pzy
         |  FROM traj),
         |tr AS (SELECT pzx AS from_zx, pzy AS from_zy, zx AS to_zx, zy AS to_zy,
         |    CAST(COUNT(*) AS BIGINT) AS n_trans,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |  FROM z WHERE pzx IS NOT NULL AND (pzx <> zx OR pzy <> zy)
         |  GROUP BY 1, 2, 3, 4)
         |SELECT rk, from_zx, from_zy, to_zx, to_zy, n_trans, n_users FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY n_trans DESC,
         |    from_zx, from_zy, to_zx, to_zy) AS BIGINT) AS rk
         |  FROM tr) WHERE rk <= 20""".stripMargin,
    "geo_jump_lengths" ->
      s"""WITH $trajSql,
         |d AS (SELECT dx * dx + dy * dy AS d2 FROM traj),
         |b AS (SELECT CASE WHEN d2 = 0 THEN CAST(-1 AS BIGINT)
         |    ELSE CAST(length(bin(d2)) - 1 AS BIGINT) END AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS n_steps
         |  FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_steps) AS BIGINT) AS n_total FROM b)
         |SELECT bucket, n_steps, (1000000 * n_steps) // n_total AS share_ppm
         |FROM b CROSS JOIN t""".stripMargin,
    "geo_cotravel_lift" ->
      s"""WITH $trajSql,
         |uk AS MATERIALIZED (SELECT DISTINCT user_id, tus // 3600000000 AS hb,
         |    x // 25 AS cx, y // 25 AS cy FROM traj),
         |ok AS (SELECT hb, cx, cy FROM uk GROUP BY 1, 2, 3
         |  HAVING COUNT(*) <= 8),
         |cool AS MATERIALIZED (SELECT uk.* FROM uk JOIN ok USING (hb, cx, cy)),
         |pairs AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM cool a JOIN cool b
         |    ON a.hb = b.hb AND a.cx = b.cx AND a.cy = b.cy
         |   AND a.user_id < b.user_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM cool GROUP BY 1),
         |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets
         |  FROM (SELECT DISTINCT hb, cx, cy FROM cool))
         |SELECT p.user_a, p.user_b, p.n_shared,
         |  pa.nv AS n_a, pb.nv AS n_b,
         |  (1000000 * p.n_shared * u.n_buckets) // (pa.nv * pb.nv) AS lift_ppm
         |FROM pairs p
         |JOIN per pa ON p.user_a = pa.user_id
         |JOIN per pb ON p.user_b = pb.user_id
         |CROSS JOIN u""".stripMargin,
    "geo_stay_points" ->
      s"""WITH $trajSql,
         |f AS (SELECT user_id, event_id, tus, x, y,
         |    CASE WHEN abs(dx) <= 3 AND abs(dy) <= 3 THEN 0 ELSE 1 END AS brk,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY tus, event_id) AS rn
         |  FROM traj),
         |r AS (SELECT user_id, tus, x, y,
         |    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE brk END)
         |      OVER (PARTITION BY user_id ORDER BY tus, event_id
         |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
         |  FROM f)
         |SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  MIN(tus) AS start_us, MAX(tus) - MIN(tus) AS dur_us,
         |  (1000 * CAST(SUM(x) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS cx_milli,
         |  (1000 * CAST(SUM(y) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS cy_milli
         |FROM r GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,
    "geo_od_matrix" ->
      s"""WITH $trajSql,
         |rk AS (SELECT user_id, tus // 86400000000 AS day, x, y,
         |    row_number() OVER (PARTITION BY user_id, tus // 86400000000
         |      ORDER BY tus, event_id) AS a,
         |    row_number() OVER (PARTITION BY user_id, tus // 86400000000
         |      ORDER BY tus DESC, event_id DESC) AS z
         |  FROM traj),
         |o AS (SELECT user_id, day, x // 50 AS o_zx, y // 50 AS o_zy
         |  FROM rk WHERE a = 1),
         |d AS (SELECT user_id, day, x // 50 AS d_zx, y // 50 AS d_zy
         |  FROM rk WHERE z = 1)
         |SELECT o.o_zx, o.o_zy, d.d_zx, d.d_zy,
         |  CAST(COUNT(*) AS BIGINT) AS n_trips,
         |  CAST(COUNT(DISTINCT o.user_id) AS BIGINT) AS n_users
         |FROM o JOIN d ON o.user_id = d.user_id AND o.day = d.day
         |GROUP BY 1, 2, 3, 4""".stripMargin,
    "geo_cotravel" ->
      s"""WITH $trajSql,
         |uk AS MATERIALIZED (SELECT DISTINCT user_id, tus // 3600000000 AS hb,
         |    x // 25 AS cx, y // 25 AS cy FROM traj),
         |ok AS (SELECT hb, cx, cy FROM uk GROUP BY 1, 2, 3
         |  HAVING COUNT(*) <= 8),
         |cool AS (SELECT uk.* FROM uk JOIN ok USING (hb, cx, cy))
         |SELECT a.user_id AS user_a, b.user_id AS user_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM cool a JOIN cool b
         |  ON a.hb = b.hb AND a.cx = b.cx AND a.cy = b.cy
         | AND a.user_id < b.user_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,
    "geo_closest_pair" ->
      s"""WITH $pSql,
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
         |  FROM p a JOIN p b ON a.vec_id < b.vec_id
         |  WHERE (a.px - b.px) * (a.px - b.px) +
         |        (a.py - b.py) * (a.py - b.py) <= 400)
         |SELECT rk, id_a, id_b, d2 FROM (
         |  SELECT id_a, id_b, d2, CAST(row_number() OVER (
         |    ORDER BY d2, id_a, id_b) AS BIGINT) AS rk
         |  FROM cand) WHERE rk <= 5""".stripMargin,
    "geo_kde" ->
      s"""WITH $pSql,
         |cells AS (SELECT px // 100 AS cx, py // 100 AS cy,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2),
         |o(dx, dy, w) AS (VALUES (-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
         |  (0, -1, 2), (0, 0, 4), (0, 1, 2), (1, -1, 1), (1, 0, 2), (1, 1, 1)),
         |d AS (SELECT cx + dx AS cell_x, cy + dy AS cell_y,
         |    CAST(SUM(n * w) AS BIGINT) AS density
         |  FROM cells CROSS JOIN o GROUP BY 1, 2)
         |SELECT rk, cell_x, cell_y, density FROM (
         |  SELECT cell_x, cell_y, density, CAST(row_number() OVER (
         |    ORDER BY density DESC, cell_x, cell_y) AS BIGINT) AS rk
         |  FROM d) WHERE rk <= 20""".stripMargin,
    "geo_zonal_stats" ->
      s"""WITH $pSql,
         |e(region_id, x1, y1, x2, y2) AS (VALUES $regionEdgeValues),
         |s AS (SELECT p.vec_id, e.region_id,
         |    (e.x2 - e.x1) * (p.py - e.y1) -
         |    (e.y2 - e.y1) * (p.px - e.x1) >= 0 AS inside_e
         |  FROM p CROSS JOIN e),
         |m AS (SELECT CAST(region_id AS BIGINT) AS region_id, vec_id FROM s
         |  GROUP BY 1, 2 HAVING bool_and(inside_e)),
         |v AS (SELECT m.region_id, CAST(emb.label AS BIGINT) AS label,
         |    CAST(COUNT(*) AS BIGINT) AS votes
         |  FROM m JOIN embeddings emb ON m.vec_id = emb.vec_id
         |  GROUP BY 1, 2),
         |t AS (SELECT region_id, label, votes,
         |    row_number() OVER (PARTITION BY region_id
         |      ORDER BY votes DESC, label) AS rk,
         |    CAST(SUM(votes) OVER (PARTITION BY region_id) AS BIGINT) AS n
         |  FROM v)
         |SELECT region_id, n, label AS top_label, votes AS top_votes,
         |  (1000 * votes) // n AS purity_milli
         |FROM t WHERE rk = 1""".stripMargin,
    "geo_lof" ->
      s"""WITH $pSql,
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
         |  FROM p a JOIN p b ON a.vec_id <> b.vec_id
         |  WHERE (a.px - b.px) * (a.px - b.px) +
         |        (a.py - b.py) * (a.py - b.py) <= 2500),
         |knn AS MATERIALIZED (SELECT id_a, id_b, d2 FROM (
         |  SELECT id_a, id_b, d2, row_number() OVER (
         |    PARTITION BY id_a ORDER BY d2, id_b) AS rk
         |  FROM cand) WHERE rk <= 3),
         |kd AS MATERIALIZED (SELECT id_a, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
         |    CAST(MAX(d2) AS BIGINT) AS kdist
         |  FROM knn GROUP BY 1),
         |reach AS (SELECT knn.id_a,
         |    CAST(SUM(GREATEST(knn.d2, b.kdist)) AS BIGINT) AS sum_reach
         |  FROM knn JOIN kd b ON knn.id_b = b.id_a GROUP BY 1),
         |lrd AS MATERIALIZED (SELECT kd.id_a, kd.n_nbrs,
         |    (kd.n_nbrs * 1000000) // GREATEST(reach.sum_reach, 1) AS lrd_micro
         |  FROM kd JOIN reach ON kd.id_a = reach.id_a),
         |agg AS (SELECT knn.id_a, CAST(SUM(b.lrd_micro) AS BIGINT) AS sum_lrd_b
         |  FROM knn JOIN lrd b ON knn.id_b = b.id_a GROUP BY 1),
         |lof AS (SELECT agg.id_a AS vec_id, lrd.n_nbrs, lrd.lrd_micro,
         |    (agg.sum_lrd_b * 1000) // GREATEST(lrd.n_nbrs * lrd.lrd_micro, 1) AS lof_milli
         |  FROM agg JOIN lrd ON agg.id_a = lrd.id_a)
         |SELECT rk, vec_id, n_nbrs, lrd_micro, lof_milli FROM (
         |  SELECT vec_id, n_nbrs, lrd_micro, lof_milli, CAST(row_number() OVER (
         |    ORDER BY lof_milli DESC, vec_id) AS BIGINT) AS rk
         |  FROM lof) WHERE rk <= 20""".stripMargin,
    "geo_radius_join" ->
      s"""WITH $pSql
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
         |FROM p a JOIN p b ON a.vec_id < b.vec_id
         |WHERE (a.px - b.px) * (a.px - b.px) +
         |      (a.py - b.py) * (a.py - b.py) <= 400""".stripMargin,
    "geo_radius_join_capped" ->
      s"""WITH $pSql,
         |h AS MATERIALIZED (SELECT vec_id, px, py,
         |    px // 20 AS gx, py // 20 AS gy FROM p),
         |ok AS (SELECT gx, gy FROM h GROUP BY 1, 2 HAVING COUNT(*) <= 3),
         |cool AS (SELECT h.* FROM h JOIN ok USING (gx, gy))
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
         |FROM p a JOIN cool b ON a.vec_id < b.vec_id
         |WHERE (a.px - b.px) * (a.px - b.px) +
         |      (a.py - b.py) * (a.py - b.py) <= 400""".stripMargin,
    "geo_knn" ->
      s"""WITH $pSql,
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
         |  FROM p a JOIN p b ON a.vec_id <> b.vec_id
         |  WHERE (a.px - b.px) * (a.px - b.px) +
         |        (a.py - b.py) * (a.py - b.py) <= 2500)
         |SELECT id_a, rk, id_b, d2 FROM (
         |  SELECT id_a, id_b, d2, CAST(row_number() OVER (
         |    PARTITION BY id_a ORDER BY d2, id_b) AS BIGINT) AS rk
         |  FROM cand) WHERE rk <= 3""".stripMargin,
    "geo_rknn" ->
      s"""WITH $pSql,
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
         |  FROM p a JOIN p b ON a.vec_id <> b.vec_id
         |  WHERE (a.px - b.px) * (a.px - b.px) +
         |        (a.py - b.py) * (a.py - b.py) <= 2500),
         |knn AS (SELECT id_a, id_b, d2 FROM (
         |  SELECT id_a, id_b, d2, row_number() OVER (
         |    PARTITION BY id_a ORDER BY d2, id_b) AS rk
         |  FROM cand) WHERE rk <= 3),
         |r AS (SELECT id_b AS vec_id, CAST(COUNT(*) AS BIGINT) AS rknn,
         |        MIN(d2) AS closest_d2
         |      FROM knn GROUP BY 1)
         |SELECT rk, vec_id, rknn, closest_d2 FROM (
         |  SELECT vec_id, rknn, closest_d2, CAST(row_number() OVER (
         |    ORDER BY rknn DESC, vec_id) AS BIGINT) AS rk
         |  FROM r) WHERE rk <= 10""".stripMargin,
    "geo_choropleth" ->
      """WITH pl AS (SELECT
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT) + 2000 AS px,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT) + 2000 AS py,
        |    CAST(label AS BIGINT) AS label
        |  FROM embeddings),
        |v AS (SELECT px // 100 AS cell_x, py // 100 AS cell_y, label,
        |    CAST(COUNT(*) AS BIGINT) AS votes
        |  FROM pl GROUP BY 1, 2, 3),
        |t AS (SELECT cell_x, cell_y, votes, label,
        |    row_number() OVER (PARTITION BY cell_x, cell_y
        |      ORDER BY votes DESC, label) AS rk,
        |    CAST(SUM(votes) OVER (PARTITION BY cell_x, cell_y) AS BIGINT) AS n
        |  FROM v)
        |SELECT cell_x, cell_y, n, label AS top_label, votes AS top_votes,
        |  (1000 * votes) // n AS purity_milli
        |FROM t WHERE rk = 1""".stripMargin,
    "geo_hotspot" ->
      s"""WITH $pSql,
         |cells AS MATERIALIZED (SELECT px // 100 AS cx, py // 100 AS cy,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         |    CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
         |nb AS (SELECT c.cx AS cell_x, c.cy AS cell_y, c.n AS n,
         |    CAST(SUM(o.n) AS BIGINT) AS n_nbhd
         |  FROM cells c JOIN cells o
         |    ON o.cx BETWEEN c.cx - 1 AND c.cx + 1
         |   AND o.cy BETWEEN c.cy - 1 AND c.cy + 1
         |  GROUP BY 1, 2, 3)
         |SELECT cell_x, cell_y, n, n_nbhd,
         |  n_cells * n_nbhd > 27 * n_total AS hot
         |FROM nb CROSS JOIN tot""".stripMargin,
    "geo_pyramid" ->
      s"""WITH $pSql,
         |z AS (SELECT unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS z)
         |SELECT z.z,
         |  px // (2000 // (CAST(1 AS BIGINT) << z.z)) AS tx,
         |  py // (2000 // (CAST(1 AS BIGINT) << z.z)) AS ty,
         |  CAST(COUNT(*) AS BIGINT) AS n_points
         |FROM p CROSS JOIN z GROUP BY 1, 2, 3""".stripMargin,
    "geo_region_join" -> regionJoinOracleSql,
    // geo_region_join_large: identical semantics and readout — the
    // Spark side differs only in PLAN (shuffle-side cover join, no
    // broadcast); one oracle spelling pins both.
    "geo_region_join_large" -> regionJoinOracleSql,
    "geo_convex_hull" ->
      s"""WITH $pSql,
         |ext AS (SELECT
         |    min(px * 4194304 + py) AS kw, max(px * 4194304 + py) AS ke,
         |    min(py * 4194304 + px) AS ks, max(py * 4194304 + px) AS kn
         |  FROM p),
         |e2 AS (SELECT kw // 4194304 AS wx, kw % 4194304 AS wy,
         |    ke // 4194304 AS ex, ke % 4194304 AS ey,
         |    ks % 4194304 AS sx, ks // 4194304 AS sy,
         |    kn % 4194304 AS nx, kn // 4194304 AS ny FROM ext),
         |surv AS MATERIALIZED (SELECT p.* FROM p, e2
         |  WHERE NOT (
         |    (sx - wx) * (py - wy) - (sy - wy) * (px - wx) > 0 AND
         |    (ex - sx) * (py - sy) - (ey - sy) * (px - sx) > 0 AND
         |    (nx - ex) * (py - ey) - (ny - ey) * (px - ex) > 0 AND
         |    (wx - nx) * (py - ny) - (wy - ny) * (px - nx) > 0)),
         |good AS (SELECT DISTINCT a.vec_id
         |  FROM surv a JOIN surv b ON a.vec_id <> b.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM surv r
         |    WHERE r.vec_id <> a.vec_id AND r.vec_id <> b.vec_id
         |      AND (b.px - a.px) * (r.py - a.py) -
         |          (b.py - a.py) * (r.px - a.px) < 0))
         |SELECT s.vec_id, s.px, s.py
         |FROM surv s JOIN good g ON s.vec_id = g.vec_id""".stripMargin,
    "geo_voronoi" -> {
      val facValues = facilities.map { case (fid, fx, fy) =>
        s"($fid, $fx, $fy)" }.mkString(", ")
      s"""WITH $pSql,
         |f(fid, fx, fy) AS (VALUES $facValues),
         |a AS (SELECT vec_id, px, py, fid,
         |    (px - fx) * (px - fx) + (py - fy) * (py - fy) AS d2,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY (px - fx) * (px - fx) + (py - fy) * (py - fy), fid)
         |      AS rk
         |  FROM p CROSS JOIN f)
         |SELECT CAST(fid AS BIGINT) AS facility_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_points,
         |  CAST(SUM(d2) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_d2,
         |  CAST(MAX(d2) AS BIGINT) AS max_d2,
         |  (1000 * CAST(SUM(px) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         |    AS cx_milli,
         |  (1000 * CAST(SUM(py) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         |    AS cy_milli
         |FROM a WHERE rk = 1 GROUP BY 1""".stripMargin
    })
}
