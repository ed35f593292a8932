package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CellIdExpr, ColumnShim, CountEqExpr, CountInExpr, DotDoubleExpr, DotLongExpr, HyperplaneBucketExpr, JaccardSortedExpr, LangidScoreExpr, MaxCharLenExpr, MinhashBandSigExpr, MinhashSigs4Expr, RepetitionStatsExpr, ShingleMinMd5Expr, Simhash16Expr, WindingContainsExpr}

/**
 * Public Column/SQL facade over graft's native Catalyst expressions
 * (which live under org.apache.spark.sql.graft — see expressions.scala).
 */
object GraftFunctions {

  def cell_id(lon: Column, lat: Column, level: Column): Column =
    ColumnShim.column(CellIdExpr(
      ColumnShim.expression(lon), ColumnShim.expression(lat), ColumnShim.expression(level)))

  def winding_contains(ring: Column, x: Column, y: Column): Column =
    ColumnShim.column(WindingContainsExpr(
      ColumnShim.expression(ring), ColumnShim.expression(x), ColumnShim.expression(y)))

  def jaccard_sorted(a: Column, b: Column): Column =
    ColumnShim.column(JaccardSortedExpr(ColumnShim.expression(a), ColumnShim.expression(b)))

  def shingle_min_md5(toks: Column, k: Column): Column =
    ColumnShim.column(ShingleMinMd5Expr(ColumnShim.expression(toks), ColumnShim.expression(k)))

  def hyperplane_bucket(v: Column, table: Column, planes: Column): Column =
    ColumnShim.column(HyperplaneBucketExpr(
      ColumnShim.expression(v), ColumnShim.expression(table), ColumnShim.expression(planes)))

  def minhash_band_sig(tset: Column, band: Column): Column =
    ColumnShim.column(MinhashBandSigExpr(ColumnShim.expression(tset), ColumnShim.expression(band)))

  def simhash16(toks: Column): Column =
    ColumnShim.column(Simhash16Expr(ColumnShim.expression(toks)))

  def dot_d(a: Column, b: Column): Column =
    ColumnShim.column(DotDoubleExpr(ColumnShim.expression(a), ColumnShim.expression(b)))

  def dot_l(a: Column, b: Column): Column =
    ColumnShim.column(DotLongExpr(ColumnShim.expression(a), ColumnShim.expression(b)))

  def count_eq(toks: Column, needle: Column): Column =
    ColumnShim.column(CountEqExpr(ColumnShim.expression(toks), ColumnShim.expression(needle)))

  def count_in(toks: Column, set: Column): Column =
    ColumnShim.column(CountInExpr(ColumnShim.expression(toks), ColumnShim.expression(set)))

  def langid_score(toks: Column, prefix: Column): Column =
    ColumnShim.column(LangidScoreExpr(ColumnShim.expression(toks), ColumnShim.expression(prefix)))

  def max_char_len(toks: Column): Column =
    ColumnShim.column(MaxCharLenExpr(ColumnShim.expression(toks)))

  def repetition_stats(toks: Column): Column =
    ColumnShim.column(RepetitionStatsExpr(ColumnShim.expression(toks)))

  def minhash_sigs4(tset: Column): Column =
    ColumnShim.column(MinhashSigs4Expr(ColumnShim.expression(tset)))

  /** Cell cover of a WKB geometry (generator shape: explode the result).
    * JTS parse + cover runs once per geometry row, not per joined row. */
  val cover_wkb: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (wkb: Array[Byte], level: Int) =>
      val geom = new org.locationtech.jts.io.WKBReader().read(wkb)
      graft.index.CellIndex.coverGeometry(geom, level)
    }

  /** The SQL function surface as (identifier, info, builder) triples —
    * shared by per-session [[register]] and the spark-submit-time
    * [[graft.GraftExtensions]] injection. */
  private[graft] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
                                        Seq[Expression] => Expression)] = {
    def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
             (exprs: Seq[Expression]): Expression = {
      require(exprs.length == n,
        s"$name requires $n arguments, got ${exprs.length}")
      build(exprs)
    }
    Seq(
      (FunctionIdentifier("graft_cell_id"),
       new ExpressionInfo(classOf[CellIdExpr].getName, "graft_cell_id"),
       arity("graft_cell_id", 3)(e => CellIdExpr(e(0), e(1), e(2))) _),
      (FunctionIdentifier("graft_contains"),
       new ExpressionInfo(classOf[WindingContainsExpr].getName, "graft_contains"),
       arity("graft_contains", 3)(e => WindingContainsExpr(e(0), e(1), e(2))) _),
      (FunctionIdentifier("graft_jaccard"),
       new ExpressionInfo(classOf[JaccardSortedExpr].getName, "graft_jaccard"),
       arity("graft_jaccard", 2)(e => JaccardSortedExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_shingle_min_md5"),
       new ExpressionInfo(classOf[ShingleMinMd5Expr].getName, "graft_shingle_min_md5"),
       arity("graft_shingle_min_md5", 2)(e => ShingleMinMd5Expr(e(0), e(1))) _),
      (FunctionIdentifier("graft_hyperplane_bucket"),
       new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "graft_hyperplane_bucket"),
       arity("graft_hyperplane_bucket", 3)(e => HyperplaneBucketExpr(e(0), e(1), e(2))) _),
      (FunctionIdentifier("graft_minhash_band_sig"),
       new ExpressionInfo(classOf[MinhashBandSigExpr].getName, "graft_minhash_band_sig"),
       arity("graft_minhash_band_sig", 2)(e => MinhashBandSigExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_simhash16"),
       new ExpressionInfo(classOf[Simhash16Expr].getName, "graft_simhash16"),
       arity("graft_simhash16", 1)(e => Simhash16Expr(e(0))) _),
      (FunctionIdentifier("graft_dot"),
       new ExpressionInfo(classOf[DotDoubleExpr].getName, "graft_dot"),
       arity("graft_dot", 2)(e => DotDoubleExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_idot"),
       new ExpressionInfo(classOf[DotLongExpr].getName, "graft_idot"),
       arity("graft_idot", 2)(e => DotLongExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_count_eq"),
       new ExpressionInfo(classOf[CountEqExpr].getName, "graft_count_eq"),
       arity("graft_count_eq", 2)(e => CountEqExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_count_in"),
       new ExpressionInfo(classOf[CountInExpr].getName, "graft_count_in"),
       arity("graft_count_in", 2)(e => CountInExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_langid_score"),
       new ExpressionInfo(classOf[LangidScoreExpr].getName, "graft_langid_score"),
       arity("graft_langid_score", 2)(e => LangidScoreExpr(e(0), e(1))) _),
      (FunctionIdentifier("graft_max_char_len"),
       new ExpressionInfo(classOf[MaxCharLenExpr].getName, "graft_max_char_len"),
       arity("graft_max_char_len", 1)(e => MaxCharLenExpr(e(0))) _),
      (FunctionIdentifier("graft_repetition"),
       new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "graft_repetition"),
       arity("graft_repetition", 1)(e => RepetitionStatsExpr(e(0))) _),
      (FunctionIdentifier("graft_minhash_sigs4"),
       new ExpressionInfo(classOf[MinhashSigs4Expr].getName, "graft_minhash_sigs4"),
       arity("graft_minhash_sigs4", 1)(e => MinhashSigs4Expr(e(0))) _))
  }

  /** Register SQL names so `spark.sql("SELECT graft_cell_id(...)")` works. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
