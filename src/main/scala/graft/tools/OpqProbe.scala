package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.Tables

object OpqProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Similarity.prepare(Tables.embeddings(spark, d))
      .filter(col("vec_id") =!= 0L).localCheckpoint()
    val m = 8; val subDim = 8; val ksub = 256
    val cov = Similarity.covarianceMatrix(e, 64)
    // eigenvalue spread
    val es = breeze.linalg.eigSym(new breeze.linalg.DenseMatrix(64, 64, cov))
    val ev = es.eigenvalues.toArray.sorted.reverse
    println(s"eigenvalues top5=${ev.take(5).mkString(",")} bottom5=${ev.takeRight(5).mkString(",")}")
    val rot = Similarity.opqRotation(cov, 64, m)
    val er = Similarity.rotated(e, rot, 64).localCheckpoint()
    val cbP = Similarity.pqCodebook(e, m, ksub, subDim, iters = 3)
    val cbO = Similarity.pqCodebook(er, m, ksub, subDim, iters = 3)
    val msePq = Similarity.pqReconstructionMse(e, cbP, m, subDim)
    val mseOpq = Similarity.pqReconstructionMse(er, cbO, m, subDim)
    println(s"msePq=$msePq mseOpq=$mseOpq")

    // multi-query recall@shortlist: is the single-query gap noise?
    val vecs = e.select("vec_id", "ce").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cbMap(cb: org.apache.spark.sql.DataFrame) =
      cb.select("m", "c_id", "centroid").collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          r.getSeq[Double](2).toArray).toMap
    val cpM = cbMap(cbP); val coM = cbMap(cbO)
    def encode(v: Array[Double], cb: Map[(Int, Int), Array[Double]])
        : Array[Int] =
      Array.tabulate(m) { mm =>
        val sv = v.slice(mm * subDim, (mm + 1) * subDim)
        cb.keys.filter(_._1 == mm).map { k =>
          val c = cb(k)
          var d2 = 0.0; var i = 0
          while (i < subDim) { val t = sv(i) - c(i); d2 += t * t; i += 1 }
          (d2, k._2)
        }.minBy(identity)._2
      }
    val rotate: Array[Double] => Array[Double] = v =>
      Array.tabulate(64) { i =>
        var acc = 0.0; var j = 0
        while (j < 64) { acc += rot(i * 64 + j) * v(j); j += 1 }
        acc
      }
    val codesP = vecs.map { case (id, v) => id -> encode(v, cpM) }
    val codesO = vecs.map { case (id, v) => id -> encode(rotate(v), coM) }
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val shortlist = 50
    var rp = 0.0; var ro = 0.0; val qids = vecs.keys.toSeq.sorted.take(16)
    for (qid <- qids) {
      val q = vecs(qid); val qr = rotate(q)
      val truth = vecs.toSeq.filter(_._1 != qid).map { case (id, v) =>
        val s = (q, v).zipped.map(_ * _).sum / (norm(q) * norm(v))
        (id, s)
      }.sortBy(x => (-x._2, x._1)).take(10).map(_._1).toSet
      def adcTop(codes: Map[Long, Array[Int]], qv: Array[Double],
          cb: Map[(Int, Int), Array[Double]]): Set[Long] =
        codes.toSeq.filter(_._1 != qid).map { case (id, cs) =>
          var ip = 0.0
          for (mm <- 0 until m) {
            val c = cb((mm, cs(mm)))
            var i = 0
            while (i < subDim) { ip += qv(mm * subDim + i) * c(i); i += 1 }
          }
          (id, ip / norm(vecs(id)))
        }.sortBy(x => (-x._2, x._1)).take(shortlist).map(_._1).toSet
      val sp = adcTop(codesP, q, cpM)
      val so = adcTop(codesO, qr, coM)
      rp += truth.intersect(sp).size / 10.0
      ro += truth.intersect(so).size / 10.0
    }
    println(s"avg recall@50 over ${qids.size} queries: " +
      s"pq=${rp / qids.size} opq=${ro / qids.size}")
    spark.stop()
  }
}
