package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native graft_dot / graft_idot must be bit-identical to the
  * aggregate(zip_with(...)) HOF fold they replaced in the ANN hot paths
  * (assignment dots, cosine refines, integer Lloyd arithmetic) — same
  * left-to-right accumulation order, same NaN/Inf propagation, same
  * empty-array result. */
class DotProductSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("graft_dot equals the aggregate(zip_with) fold bitwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val n = if (i == 0) 0 else 64
      // mix magnitudes so the fold order matters: equal-magnitude sums are
      // order-insensitive and would not catch an accumulation-order bug
      (Array.fill(n)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(7) - 3)),
       Array.fill(n)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(7) - 3)))
    } :+ ((Array(1.0, Double.NaN, 3.0), Array(2.0, 1.0, 1.0))) :+
      ((Array(Double.MaxValue, Double.MaxValue), Array(2.0, 2.0))) // -> Inf
    val df = rows.toDF("a", "b")
    val reference = aggregate(zip_with($"a", $"b", (x, y) => x * y),
                              lit(0.0), (acc, x) => acc + x)
    val native = graft.functions.GraftFunctions.dot_d($"a", $"b")
    df.select(reference.as("ref"), native.as("got")).collect().foreach { r =>
      val ref = r.getDouble(0); val got = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(ref) ==
             java.lang.Double.doubleToRawLongBits(got), s"ref=$ref got=$got")
    }
  }

  test("graft_idot equals the long aggregate(zip_with) fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      val n = if (i == 0) 0 else 64
      // the call sites' documented bound: |a_i| <= ~3e6 quantized values
      (Array.fill(n)(rnd.nextLong() % 3000000L), Array.fill(n)(rnd.nextLong() % 3000000L))
    }
    val df = rows.toDF("a", "b")
    val reference = aggregate(zip_with($"a", $"b", (x, y) => x * y),
                              lit(0L), (acc, x) => acc + x)
    val native = graft.functions.GraftFunctions.dot_l($"a", $"b")
    df.select(reference.as("ref"), native.as("got")).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"ref=${r.getLong(0)} got=${r.getLong(1)}")
    }
  }

  test("null input propagates null; SQL registration works") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]),
                 (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0)))).toDF("a", "b")
    val got = df.select(graft.functions.GraftFunctions.dot_d($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 11.0)
    val viaSql = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)), " +
                           "graft_idot(array(1L, 2L), array(3L, 4L))").collect().head
    assert(viaSql.getDouble(0) == 11.0 && viaSql.getLong(1) == 11L)
  }
}
