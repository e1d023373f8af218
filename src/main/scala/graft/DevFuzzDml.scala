package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only randomized DIFFERENTIAL DML fuzzer: builds a fresh catalog
  * table from nation, applies a seeded-random sequence of UPDATE / DELETE
  * statements through the engine's SQL-DML path (copy-on-write rewrite
  * commits), and dumps the final table state next to a DuckDB oracle that
  * replays the same sequence RELATIONALLY — each UPDATE as a CASE
  * projection over the prior state, each DELETE as `NOT coalesce(pred,
  * FALSE)` (SQL 3VL: only TRUE deletes) — as a nested CTE chain.
  * tools/selfcheck.py then does the exact compare. Exercises the
  * assignment-cast, simultaneous-assignment, and NULL-predicate corners
  * (nullif assignments deliberately INJECT NULLs that later predicates
  * must 3VL-handle) across randomized op orders no hand-written spec
  * enumerates. Usage: runMain graft.DevFuzzDml <sfDir> <outDir> [n] [seed]
  */
object DevFuzzDml {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(20)
    val seed = args.lift(3).map(_.toLong).getOrElse(7L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val rnd = new scala.util.Random(seed)
    def pick[T](xs: IndexedSeq[T]): T = xs(rnd.nextInt(xs.length))

    // predicate atoms in the Spark∩DuckDB common subset; nullif-injected
    // NULL regionkeys make 3VL live on every later predicate
    def atom(): String = rnd.nextInt(5) match {
      case 0 => s"n_regionkey = ${rnd.nextInt(5)}"
      case 1 => s"n_nationkey % ${rnd.nextInt(5) + 2} = ${rnd.nextInt(2)}"
      case 2 => s"n_name LIKE '${('A' + rnd.nextInt(26)).toChar}%'"
      case 3 => s"nullif(n_regionkey, ${rnd.nextInt(5)}) = ${rnd.nextInt(5)}"
      case 4 => s"n_nationkey >= ${rnd.nextInt(25)}"
    }
    def pred(): String = rnd.nextInt(3) match {
      case 0 => atom()
      case 1 => s"(${atom()} AND ${atom()})"
      case 2 => s"(${atom()} OR ${atom()})"
    }
    // assignment expressions; all keep n_name non-NULL (concat NULL
    // handling differs across engines — DuckDB skips, Spark propagates —
    // so the generator never feeds concat a nullable argument)
    def nameExpr(): String = rnd.nextInt(3) match {
      case 0 => s"concat(n_name, '_${('a' + rnd.nextInt(26)).toChar}')"
      case 1 => "upper(n_name)"
      case 2 => s"substr(n_name, 1, ${rnd.nextInt(6) + 3})"
    }
    def rkExpr(): String = rnd.nextInt(4) match {
      case 0 => "n_regionkey + 1"
      case 1 => s"nullif(n_regionkey, ${rnd.nextInt(5)})" // inject NULLs
      case 2 => s"${rnd.nextInt(4) + 4} - n_regionkey"
      case 3 => "n_regionkey * 2"
    }

    sealed trait Op
    final case class Upd(sets: Seq[(String, String)], where: String) extends Op
    final case class Del(where: String) extends Op
    def genOps(): Seq[Op] = (0 until rnd.nextInt(4) + 3).map { _ =>
      if (rnd.nextInt(3) == 0) Del(pred())
      else {
        val sets = rnd.nextInt(3) match {
          case 0 => Seq("n_name" -> nameExpr())
          case 1 => Seq("n_regionkey" -> rkExpr())
          case 2 => Seq("n_name" -> nameExpr(), "n_regionkey" -> rkExpr())
        }
        Upd(sets, pred())
      }
    }

    val cols = Seq("n_nationkey", "n_name", "n_regionkey")
    /** DuckDB replay: state k+1 as a projection/filter over state k. */
    def replayCte(op: Op, prev: String): String = op match {
      case Upd(sets, where) =>
        val proj = cols.map { c =>
          sets.find(_._1 == c) match {
            case Some((_, e)) => s"CASE WHEN $where THEN $e ELSE $c END AS $c"
            case None => c
          }
        }.mkString(", ")
        s"SELECT $proj FROM $prev"
      case Del(where) =>
        s"SELECT * FROM $prev WHERE NOT coalesce($where, FALSE)"
    }

    val results = (0 until n).map { i =>
      val name = f"dml_$i%03d"
      val wh = s"$outDir/wh_$i"
      val engine = new GraftEngine(spark, wh)
      engine.catalog.createSchema("fz")
      val nation = Tables.nation(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("n_nationkey"),
          org.apache.spark.sql.functions.col("n_name"),
          org.apache.spark.sql.functions.col("n_regionkey"))
      engine.catalog.createTable("fz", "t", nation.schema)
      engine.catalog.insert("fz", "t", nation)
      val ops = genOps()
      ops.foreach {
        case Upd(sets, where) => engine.executeNonQuery(params.SqlStatement(
          s"UPDATE fz.t SET ${sets.map { case (c, e) => s"$c = $e" }.mkString(", ")} WHERE $where"))
        case Del(where) => engine.executeNonQuery(params.SqlStatement(
          s"DELETE FROM fz.t WHERE $where"))
      }
      engine.query(params.SqlStatement(
        "SELECT n_nationkey, n_name, n_regionkey FROM fz.t ORDER BY n_nationkey"))
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      val ctes = ops.zipWithIndex.map { case (op, k) =>
        s"s${k + 1} AS (${replayCte(op, s"s$k")})"
      }
      val oracleSql =
        (s"WITH s0 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)" +:
          ctes).mkString(", ") +
          s" SELECT * FROM s${ops.length} ORDER BY n_nationkey"
      name -> oracleSql
    }
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      results.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
        .mkString("{", ",", "}"))
    println(s"[fuzzdml] $n DML sequences dumped to $outDir (seed=$seed)")
    spark.stop()
  }
}
