package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Driver-side recomputes for the TpchOps suite (Q2/Q6-Q12/Q14/Q15) —
  * each query's core invariant re-derived with plain Scala over the
  * collected sf0.001 tables, independent of any SQL engine (the
  * DuckDB hash gate is the driver's; these prove the semantics).
  */
class TpchOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Session TZ is UTC, so cutoff literals must be epoch'd in UTC too
    * (java.sql.Timestamp.valueOf would use the JVM default zone).
    */
  private def utcEpoch(iso: String): Long =
    java.time.LocalDateTime.parse(iso).toEpochSecond(java.time.ZoneOffset.UTC)

  private lazy val li = Tables
    .lineitem(spark, Sf0001)
    .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), unix_timestamp(col("l_shipdate")).as("ship_s"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getLong(6)))

  test("q6: revenue equals a sequential fold over the filtered lines") {
    val row = TpchOps.forecastRevenue(spark, Sf0001).collect()(0)
    val lo = utcEpoch("1996-01-01T00:00:00")
    val hi = utcEpoch("1997-01-01T00:00:00")
    val kept = li.filter { case (_, _, _, qty, _, disc, ship) =>
      ship >= lo && ship < hi && disc >= 0.02 && disc <= 0.04 && qty < 24.0
    }
    // decimal-exact sum: accumulate in BigDecimal like the query does
    val rev = kept.map { case (_, _, _, _, price, disc, _) =>
      BigDecimal(price * disc).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(row.getLong(1) === kept.length.toLong)
    assert(math.abs(row.getDouble(0) - rev.toDouble) < 1e-6)
  }

  test("q11: exactly the parts above 1.4x the mean per-part value are reported") {
    val perPart = li
      .groupBy(_._2)
      .view
      .mapValues(_.map { case (_, _, _, _, price, disc, _) =>
        BigDecimal(price * (1.0 - disc)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum)
      .toMap
    val total = perPart.values.sum.toDouble
    val n = perPart.size
    val expected = perPart.collect {
      case (pk, v) if v.toDouble * n > total * 1.4 => pk
    }.toSet
    val got = TpchOps.importantParts(spark, Sf0001).collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty, "threshold must stay non-vacuous at sf0.001")
  }

  test("q15: the reported supplier(s) hold the maximum quarterly revenue") {
    val lo = utcEpoch("1996-01-01T00:00:00")
    val hi = utcEpoch("1996-04-01T00:00:00")
    val perSupp = li
      .filter { case (_, _, _, _, _, _, ship) => ship >= lo && ship < hi }
      .groupBy(_._3)
      .view
      .mapValues(_.map { case (_, _, _, _, price, disc, _) =>
        BigDecimal(price * (1.0 - disc)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble)
      .toMap
    val mx = perSupp.values.max
    val winners = perSupp.collect { case (sk, v) if v == mx => sk }.toSet
    val rows = TpchOps.topSupplier(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSet === winners)
    rows.foreach(r => assert(math.abs(r.getDouble(3) - mx) < 1e-6))
  }

  test("q2: reported supplier has the part's global minimum unit price") {
    val partFilter = Tables
      .part(spark, Sf0001)
      .filter(col("p_size").between(10, 30) && col("p_type") === "SMALL")
      .select("p_partkey")
      .collect()
      .map(_.getLong(0))
      .toSet
    val best = li
      .filter(t => partFilter.contains(t._2))
      .groupBy(_._2)
      .view
      .mapValues { rows =>
        val bySupp = rows
          .groupBy(_._3)
          .view
          .mapValues(_.map(t => t._5 / t._4).min)
        val mn = bySupp.values.min
        // the query tiebreaks equal min prices on the lowest suppkey
        (bySupp.collect { case (sk, v) if v == mn => sk }.min, mn)
      }
      .toMap
    val rows = TpchOps.minCostSupplier(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSet === best.keySet)
    rows.foreach { r =>
      val (supp, mn) = best(r.getLong(0))
      assert(r.getLong(2) === supp)
      assert(math.abs(r.getDouble(4) - mn) < 1e-12)
    }
  }

  test("q12: late+ontime line counts conserve the joined row total") {
    val rows = TpchOps.shippingPriority(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === Set("late", "ontime"))
    val totalCounted = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(totalCounted === li.length.toLong,
      "every lineitem joins exactly one order and lands in exactly one class")
  }

  test("kmeans: every vector is assigned to its true nearest seed; seeds self-assign at 0") {
    val vecs = Tables
      .embeddings(spark, Sf0001)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val seeds = vecs.filter(_._1 < SimilarityOps.KmeansK).sortBy(_._1)
    def distSq(a: Array[Float], b: Array[Float]): Double = {
      // same derivation as the query: ||a||^2 + ||b||^2 - 2 a.b, each a
      // sequential fold
      def n2(x: Array[Float]) = x.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble)
      val d = a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      n2(a) + n2(b) - 2.0 * d
    }
    val expected = vecs.map { case (id, v) =>
      val (bestSeed, bestD) = seeds
        .map { case (sid, sv) => (sid, distSq(v, sv)) }
        .minBy { case (sid, d) => (d, sid) }
      id -> ((bestSeed, bestD))
    }.toMap
    val rows = SimilarityOps.kmeansAssign(spark, Sf0001).collect()
    assert(rows.length === vecs.length)
    rows.foreach { r =>
      val (sid, d) = expected(r.getLong(0))
      assert(r.getLong(1) === sid, s"vec ${r.getLong(0)} wrong cell")
      assert(math.abs(r.getDouble(2) - d) < 1e-9)
    }
    // a seed's nearest centroid is itself, at distance exactly 0
    rows.filter(_.getLong(0) < SimilarityOps.KmeansK).foreach { r =>
      assert(r.getLong(1) === r.getLong(0))
      assert(r.getDouble(2) === 0.0)
    }
  }

  test("semantic dedup reports exactly the within-cell pairs above threshold") {
    val asg = SimilarityOps.kmeansAssign(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def n2(x: Array[Float]) = x.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble)
      val d = a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      d / (math.sqrt(n2(a)) * math.sqrt(n2(b)))
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j && asg(i) == asg(j)
      s = cos(vecs(i), vecs(j)) if s >= SimilarityOps.SemDedupThreshold
    } yield (i, j)).toSet
    val got = SimilarityOps.semanticDedup(spark, Sf0001).collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSet === expected)
    assert(got.nonEmpty, "threshold must stay non-vacuous at sf0.001")
    got.foreach(r => assert(asg(r.getLong(1)) === r.getLong(0) && asg(r.getLong(2)) === r.getLong(0)))
  }

  test("kmeans M-step: centroids match a driver recompute; cells cover the corpus") {
    val asg = SimilarityOps.kmeansAssign(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val rows = SimilarityOps.kmeansStep(spark, Sf0001).collect()
    assert(rows.map(_.getLong(1)).sum === vecs.length.toLong, "cells partition the corpus")
    val byCell = vecs.groupBy { case (id, _) => asg(id) }
    rows.foreach { r =>
      val cell = byCell(r.getLong(0))
      assert(r.getLong(1) === cell.length.toLong)
      // quantized-integer mean per dim, then ascending-dim norm fold —
      // the query's own arithmetic, re-derived sequentially
      val mean = Array.tabulate(64) { d =>
        cell.map { case (_, v) => math.round(v(d).toDouble * 1e6) }.sum.toDouble / 1e6 / cell.length
      }
      val seed = vecs.toMap.apply(r.getLong(0))
      val norm = math.sqrt(mean.foldLeft(0.0)((a, x) => a + x * x))
      val shift = math.sqrt(mean.zip(seed).foldLeft(0.0) { case (a, (m, s)) =>
        a + (m - s.toDouble) * (m - s.toDouble)
      })
      assert(math.abs(r.getDouble(2) - norm) < 1e-9)
      assert(math.abs(r.getDouble(3) - shift) < 1e-9)
    }
  }

  test("q8: market share is within [0,1] and volumes are consistent") {
    val rows = TpchOps.marketShare(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0.0 && nat <= tot)
      assert(math.abs(share - nat / tot) < 1e-15)
    }
  }

  test("ship-lag SLA: percentiles match a sequential sort-and-interpolate recompute") {
    val orders = Tables.orders(spark, Sf0001)
      .selectExpr("o_orderkey", "o_orderpriority", "unix_timestamp(o_orderdate) AS os")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val lags = li.map { case (ok, _, _, _, _, _, ship) =>
      val (prio, os) = orders(ok); (prio, ship - os)
    }
    def pct(sorted: Array[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo).toDouble
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val rows = TpchOps.shipLagSla(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === lags.map(_._1).toSet)
    rows.foreach { r =>
      val mine = lags.filter(_._1 == r.getString(0)).map(_._2).sorted
      assert(r.getLong(1) === mine.length.toLong)
      // relative tolerance: the recompute's interpolation term order
      // differs from the engines' shared formula by float rounding
      def close(a: Double, b: Double): Boolean = math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b))
      assert(close(r.getDouble(2), pct(mine, 0.5)), s"p50 ${r.getDouble(2)} vs ${pct(mine, 0.5)}")
      assert(close(r.getDouble(3), pct(mine, 0.9)), s"p90 ${r.getDouble(3)} vs ${pct(mine, 0.9)}")
      assert(close(r.getDouble(4), pct(mine, 0.99)), s"p99 ${r.getDouble(4)} vs ${pct(mine, 0.99)}")
      assert(r.getLong(5) === mine.max)
      assert(r.getLong(6) === mine.count(_ <= 2592000L).toLong)
      assert(r.getLong(7) === r.getLong(6) * 1000000L / r.getLong(1))
    }
  }

  test("q17: sum/7 over exactly the lines under one-fifth of their part's mean quantity") {
    val parts = Tables.part(spark, Sf0001)
      .filter(col("p_brand") === "Brand#4" && col("p_size") < 25)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val sel = li.filter { case (_, pk, _, _, _, _, _) => parts.contains(pk) }
    // exact-rational threshold: qty < sum/(5n) ⇔ 5·qty·n < sum, in
    // BigDecimal — the same cross-multiplied compare both engines run
    val stats = sel.groupBy(_._2).view.mapValues { ls =>
      (ls.map(l => BigDecimal(l._4)).sum, ls.length)
    }.toMap
    val kept = sel.filter { case (_, pk, _, qty, _, _, _) =>
      val (s, n) = stats(pk)
      BigDecimal(qty) * 5 * n < s
    }
    val expected = kept.map(l => BigDecimal(l._5).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    val row = TpchOps.smallQtyRevenue(spark, Sf0001).collect()(0)
    assert(row.getLong(1) === kept.length.toLong)
    assert(kept.nonEmpty, "filter must stay non-vacuous at sf0.001")
    assert(math.abs(row.getDouble(0) - expected.toDouble / 7.0) < 1e-6)
  }
}
