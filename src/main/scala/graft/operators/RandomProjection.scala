package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection of an embedding column — the
  * standard compression step before large-scale similarity work (a 64→16
  * projection cuts every downstream ANN scan and shuffle 4×, at a bounded
  * distance distortion given by the JL lemma).
  *
  * The projection matrix is Achlioptas-style dense ±1 signs (no Gaussians
  * needed — same JL guarantee), derived DETERMINISTICALLY: sign(j, i) is
  * the parity of the first hex digit of md5("rp:j:i"). The matrix is a
  * k×d constant computed once on the driver and inlined into the plan as
  * literal arrays, so the projection is pure scan-side codegen arithmetic
  * (k native `vec_dot`s per row — zero shuffles, zero joins), and any
  * engine can reproduce it bit-for-bit from the same md5 recipe (the
  * DuckDB oracle embeds the same literals).
  *
  * Reference scope: beyond-reference LLM-pipeline layer, upstream of the
  * [[Similarity]] ANN family.
  */
object RandomProjection {

  /** The deterministic ±1 sign matrix: k rows × d columns. */
  def signMatrix(k: Int, d: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k, d) { (j, i) =>
      md.reset()
      val h = md.digest(s"rp:$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Project `vecCol` (array<float|double>, `d` dims) to `k` rounded
    * double columns `p0..p{k-1}`: p_j = <v, S_j> / √k. */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              k: Int, d: Int): DataFrame = {
    require(k >= 1 && d >= 1)
    val s = signMatrix(k, d)
    val v = col(vecCol).cast("array<double>")
    val scale = math.sqrt(k.toDouble)
    emb.select(col(idCol) +: (0 until k).map { j =>
      round(graft.expressions.VecFns.dot(v, typedLit(s(j).toSeq)) / scale, 6)
        .as(s"p$j")
    }: _*)
  }
}
