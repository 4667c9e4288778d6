package graft

import graft.core.{Element, GraftStage}
import graft.core.GraftImplicits._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Composition matrix (mirrors tests/test_mixtures.py:17-206: every
  * operator pair chained, then `ordered`, asserting round-trip identity
  * with the Seq oracle) plus index-ordering law tests — including the
  * critical one: Spark's array<bigint> sort order must equal Python
  * tuple ordering (prefix rule) or `ordered` after `flatMap` is wrong.
  */
class PipelineMatrixSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val xs: Seq[Int] = (0 until 120).toList

  // Operator menu: (name, stage transform, Seq oracle transform).
  private val ops: Seq[(String, GraftStage[Int] => GraftStage[Int], Seq[Int] => Seq[Int])] = Seq(
    ("map", _.map(_ + 7), _.map(_ + 7)),
    ("filter", _.filter(_ % 3 != 1), _.filter(_ % 3 != 1)),
    ("flatMap", _.flatMap(x => Seq(x, -x)), _.flatMap(x => Seq(x, -x))),
    ("mapEx", _.mapEx[Null, Int]((x, _) => x * 2, workers = 3), _.map(_ * 2)),
    ("each", _.each(_ => ()), identity))

  for ((n1, f1, o1) <- ops; (n2, f2, o2) <- ops) {
    test(s"matrix: $n1 |> $n2 |> ordered == Seq oracle") {
      val got = f2(f1(xs.toStage)).ordered.collectValues()
      assert(got == o2(o1(xs)))
    }
  }

  test("matrix: deep chain of all five ops then ordered") {
    val st = ops.foldLeft(xs.toStage) { case (s, (_, f, _)) => f(s) }.ordered
    val oracle = ops.foldLeft(xs) { case (s, (_, _, o)) => o(s) }
    assert(st.collectValues() == oracle)
  }

  test("indexOrdering: lexicographic with prefix rule, matches tuple compare") {
    val rnd = new Random(42)
    val paths = Seq(Seq(1L), Seq(1L, 0L), Seq(0L, 5L), Seq.empty[Long], Seq(2L)) ++
      (0 until 200).map(_ => Seq.fill(rnd.nextInt(4))(rnd.nextInt(5).toLong))
    // Reference implementation of Python tuple compare.
    def pyCompare(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).collectFirst { case (x, y) if x != y => java.lang.Long.compare(x, y) }
        .getOrElse(Integer.compare(a.length, b.length))
    for (a <- paths.take(40); b <- paths.take(40))
      assert(math.signum(Element.indexOrdering.compare(a, b)) == math.signum(pyCompare(a, b)))
  }

  test("Spark array sort order equals indexOrdering (prefix rule holds in-engine)") {
    val paths = Seq(Seq(1L), Seq(1L, 0L), Seq(0L, 5L), Seq(0L), Seq(2L, 9L), Seq(0L, 0L, 0L), Seq(2L))
    val ds = spark.createDataset(paths.map(p => Element(p, p.mkString("/"))))
    val sparkOrder = ds.orderBy(col("index")).collect().map(_.index).toSeq
    assert(sparkOrder == paths.sorted(Element.indexOrdering))
  }

  test("ordered after flatMap: children interleave by prefix rule exactly as Seq.flatMap") {
    val got = (0 until 30).toSeq.toStage
      .flatMap(x => Seq.fill(x % 4)(x))
      .ordered.collectValues()
    assert(got == (0 until 30).flatMap(x => Seq.fill(x % 4)(x)))
  }

  test("plan: filterCol predicate is pushed to the parquet scan") {
    val df = queries.ParityOps.opFilter(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity,45.0)"),
      s"expected pushed filter in plan:\n$plan")
  }

  test("plan: plain map/filter chain runs no indexing job (no zipWithIndex RDD scan)") {
    val ds = spark.createDataset((0 until 10).toSeq)
    val st = GraftStage.fromDataset(ds).map(_ + 1).filter(_ > 3)
    // Forcing the plain plan must not build the indexed one.
    assert(st.collectValues().sorted == (4 to 10).toSeq)
    assert(!st.plain.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"))
  }

  test("oracle alignment: ordered query output equals window row_number oracle shape") {
    val df = queries.ParityOps.opOrdered(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == rows.indices.map(_.toLong))
  }
}
