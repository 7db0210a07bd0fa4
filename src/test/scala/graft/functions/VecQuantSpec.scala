package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The scalar-quantization expressions must be BIT-IDENTICAL to the
  * interpreted HOF/UDF originals they replaced — the SQ/int8 stores'
  * DuckDB oracles hash the packed bytes and the rescored doubles.
  * Checked over both the codegen and interpreted eval paths.
  */
class VecQuantSpec extends SparkSpec {
  import spark.implicits._

  // NOTE: no null-ELEMENT case in the parity set — the legacy
  // `Seq[Double]` UDF cannot even evaluate one under Spark 4's encoder
  // (NOT_NULL_ASSERT_VIOLATION), so real vectors never carried them;
  // the expressions' defined behavior for them is asserted standalone.
  private val vecs: Seq[Option[Seq[Option[Double]]]] = {
    def s(xs: Double*): Option[Seq[Option[Double]]] = Some(xs.map(Option(_)))
    Seq(
      s(1.0, -2.5, 3.25),
      s(0.0, 0.0),
      s(),                                  // empty -> scale 0.0
      s(-1e300, 1e-300, 127.5, -127.49),
      None,                                  // null array -> null
      s(Double.NaN, 2.0),                    // NaN greatest in Spark ordering
      s(1e16, -1.0, 1e16))
  }

  private def df = vecs.toDF("v")

  private def legacyMaxAbs = aggregate(col("v"), lit(0.0),
    (a, x) => greatest(a, abs(x)))

  private val legacyPackUdf = udf { (q: Seq[Double]) =>
    q.map(_.toInt.toByte).toArray
  }
  private def legacyPack = legacyPackUdf(transform(col("v"),
    x => floor(x * lit(127.0) / col("ss") + lit(0.5)).cast("double")))

  private def assertParity(codegenEnabled: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, codegenEnabled.toString)
    try {
      val scales = df
        .select(legacyMaxAbs.as("o"), VecQuant.maxAbs(col("v")).as("n"))
        .collect()
      scales.zipWithIndex.foreach { case (Row(o, n), i) =>
        // Objects.equals: boxed-Double equality makes NaN == NaN (scala ==
        // unboxes and IEEE-fails the NaN case the parity set includes)
        assert(java.util.Objects.equals(o, n),
          s"maxAbs case $i (codegen=$codegenEnabled): got $n want $o")
      }
      // pack parity over non-null arrays only: the legacy UDF NPEs on a
      // null input Seq (i.e. it was undefined there; the operators never
      // fed it one — packBytes always followed normed())
      val got = df.where(col("v").isNotNull)
        .withColumn("scale_old", legacyMaxAbs)
        .withColumn("ss",
          when(col("scale_old") === 0d, lit(1.0)).otherwise(col("scale_old")))
        .select(legacyPack.as("qb_old"),
          VecQuant.sqPack(col("v"), col("ss")).as("qb_new"))
        .collect()
      got.zipWithIndex.foreach {
        case (Row(qOld, qNew), i) =>
          assert(java.util.Arrays.equals(
              qOld.asInstanceOf[Array[Byte]], qNew.asInstanceOf[Array[Byte]]),
            s"sqPack case $i (codegen=$codegenEnabled)")
      }
      // the expression's null-array behavior: plain null out
      val nr = df.where(col("v").isNull)
        .select(VecQuant.sqPack(col("v"), lit(1.0))).head()
      assert(nr.isNullAt(0))
    } finally spark.conf.set(key, old)
  }

  test("maxAbs/sqPack match the HOF+UDF originals bit-for-bit (codegen)") {
    assertParity(codegenEnabled = true)
  }

  test("maxAbs/sqPack match the HOF+UDF originals bit-for-bit (interpreted)") {
    assertParity(codegenEnabled = false)
  }

  test("byteDot/unpack match the UDF originals") {
    val legacyDot = udf { (a: Array[Byte], b: Array[Byte]) =>
      var s = 0L
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toLong * b(i).toLong; i += 1 }
      s.toDouble
    }
    val legacyUnpack = udf { (b: Array[Byte]) => b.map(_.toDouble) }
    val rows = Seq(
      (Array[Byte](1, -2, 127), Array[Byte](-128, 5, 3)),
      (Array[Byte](), Array[Byte](7)),        // length mismatch: min-length
      (Array[Byte](-1, -1), Array[Byte](-1, -1)))
      .toDF("a", "b")
    val got = rows.select(
      VecQuant.byteDot(col("a"), col("b")).as("d_new"),
      legacyDot(col("a"), col("b")).as("d_old"),
      VecQuant.unpack(col("a")).as("u_new"),
      legacyUnpack(col("a")).as("u_old")).collect()
    got.zipWithIndex.foreach { case (Row(dNew, dOld, uNew, uOld), i) =>
      assert(dNew == dOld, s"byteDot case $i")
      assert(uNew.asInstanceOf[scala.collection.Seq[Double]].toSeq ==
        uOld.asInstanceOf[scala.collection.Seq[Double]].toSeq,
        s"unpack case $i")
    }
    // null propagation
    val nulls = Seq((Option.empty[Array[Byte]], Some(Array[Byte](1))))
      .toDF("a", "b")
      .select(VecQuant.byteDot(col("a"), col("b")).as("d"),
        VecQuant.unpack(col("a")).as("u")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("null ELEMENTS have the documented defined behavior") {
    // (the legacy UDFs could not evaluate these at all — see the note on
    // the parity set)
    val df = Seq(1).toDF("i").select(
      array(lit(1.0), lit(null).cast("double"), lit(-3.0)).as("v"))
    val r = df.select(
      VecQuant.maxAbs(col("v")).as("s"),            // null skipped by greatest
      VecQuant.sqPack(col("v"), lit(3.0)).as("qb"), // null packs to byte 0
      VecQuant.sqQuant(col("v"), lit(3.0)).as("q"), // null element stays null
      VecQuant.sqQuantLongs(col("v"), lit(3.0)).as("ql")).head()
    assert(r.getDouble(0) == 3.0)
    assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](42, 0, -127))
    assert(r.getSeq[Any](2) == Seq(42.0, null, -127.0))
    assert(r.getSeq[Any](3) == Seq(42L, null, -127L))
  }
}
