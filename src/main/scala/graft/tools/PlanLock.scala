package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-shape lockfile: records, for EVERY declared query, the pre-AQE
  * physical-plan fingerprint that matters at 100 TB — shuffle exchanges,
  * broadcast exchanges, and the join strategy mix — and fails when a code
  * change silently makes any query's plan more expensive (a broadcast
  * join decaying to sort-merge, an extra shuffle sneaking in, a cartesian
  * appearing). PlanScan catches point red flags; PlanLock pins the whole
  * shape so improvements are deliberate and regressions are loud.
  *
  * Usage:
  *   runMain graft.tools.PlanLock          # compare against plans.lock.tsv
  *   runMain graft.tools.PlanLock --write  # regenerate the lockfile
  *
  * The fingerprint is the STATIC plan at sf0.001 (deterministic for fixed
  * code + schema; AQE may still improve shapes at runtime — the lock is a
  * ceiling, not a prediction). A fingerprint with strictly fewer exchanges
  * or cartesians than the lock is reported as an improvement and the tool
  * asks for a re-lock; any increase exits 1.
  */
object PlanLock {

  final case class Fp(shuffle: Int, broadcast: Int, smj: Int, bhj: Int,
                      shj: Int, bnlj: Int, cartesian: Int) {
    def tsv: String = s"$shuffle\t$broadcast\t$smj\t$bhj\t$shj\t$bnlj\t$cartesian"
    /** Strictly-worse check: more shuffles / cartesians / nested loops, or
      * a broadcast join lost to SMJ (smj up while bhj down). */
    def regressedFrom(lock: Fp): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (shuffle > lock.shuffle) out += s"shuffles ${lock.shuffle}->$shuffle"
      if (cartesian > lock.cartesian) out += s"cartesian ${lock.cartesian}->$cartesian"
      if (bnlj > lock.bnlj) out += s"bc-nested-loop ${lock.bnlj}->$bnlj"
      if (smj > lock.smj && bhj < lock.bhj)
        out += s"broadcast join decayed to sort-merge (smj ${lock.smj}->$smj, bhj ${lock.bhj}->$bhj)"
      out.toSeq
    }
    def improvedOver(lock: Fp): Boolean =
      shuffle < lock.shuffle || cartesian < lock.cartesian ||
        (bhj > lock.bhj && smj < lock.smj)
  }

  val lockPath = "plans.lock.tsv"

  def fingerprint(p: org.apache.spark.sql.execution.SparkPlan): Fp = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins._
    var sh = 0; var bx = 0; var smj = 0; var bhj = 0; var shj = 0; var bnlj = 0; var cp = 0
    p.foreach {
      case _: ShuffleExchangeExec => sh += 1
      case _: BroadcastExchangeExec => bx += 1
      case _: SortMergeJoinExec => smj += 1
      case _: BroadcastHashJoinExec => bhj += 1
      case _: ShuffledHashJoinExec => shj += 1
      case _: BroadcastNestedLoopJoinExec => bnlj += 1
      case _: CartesianProductExec => cp += 1
      case _ =>
    }
    Fp(sh, bx, smj, bhj, shj, bnlj, cp)
  }

  def readLock(): Map[String, Fp] = {
    val f = new java.io.File(lockPath)
    if (!f.exists()) Map.empty
    else scala.io.Source.fromFile(f).getLines()
      .filterNot(l => l.startsWith("#") || l.isBlank)
      .map { l =>
        val c = l.split("\t")
        c(0) -> Fp(c(1).toInt, c(2).toInt, c(3).toInt, c(4).toInt,
          c(5).toInt, c(6).toInt, c(7).toInt)
      }.toMap
  }

  def main(args: Array[String]): Unit = {
    val write = args.contains("--write")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static plans: with AQE on, executedPlan is an opaque adaptive root
      // and exchanges re-plan at runtime; the lock pins the compile-time
      // shape, so plan with AQE off (runtime AQE can only improve on it)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fps = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try Some(name -> fingerprint(
        fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan))
      catch { case e: Throwable =>
        println(s"[planlock] $name failed to plan: ${e.getMessage}"); None
      }
    }

    if (write) {
      val out = new java.io.PrintWriter(lockPath)
      out.println("# plan-shape lock (static pre-AQE fingerprints at sf0.001; " +
        "regenerate with PlanLock --write): query\tshuffle\tbroadcast\tsmj\tbhj\tshj\tbnlj\tcartesian")
      fps.foreach { case (n, fp) => out.println(s"$n\t${fp.tsv}") }
      out.close()
      println(s"[planlock] wrote ${fps.size} fingerprints to $lockPath")
    } else {
      val lock = readLock()
      var bad = 0; var better = 0
      fps.foreach { case (n, fp) =>
        lock.get(n) match {
          case None =>
            bad += 1; println(s"[planlock] UNLOCKED query $n — run PlanLock --write")
          case Some(l) =>
            val reg = fp.regressedFrom(l)
            if (reg.nonEmpty) { bad += 1
              println(s"[planlock] REGRESSION in $n: ${reg.mkString("; ")}")
            } else if (fp.improvedOver(l)) { better += 1
              println(s"[planlock] note: $n improved (${l.tsv} -> ${fp.tsv}) — re-lock to pin")
            }
        }
      }
      lock.keys.filterNot(fps.map(_._1).toSet).toSeq.sorted.foreach { gone =>
        println(s"[planlock] note: locked query $gone no longer declared")
      }
      println(s"[planlock] done: ${fps.size} checked, $bad regressions, $better improvements")
      spark.stop()
      if (bad > 0) sys.exit(1)
      return
    }
    spark.stop()
  }
}
