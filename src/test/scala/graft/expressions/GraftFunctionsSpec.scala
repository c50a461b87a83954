package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraftFunctionsSpec extends AnyFunSuite with SparkSpec {

  GraftFunctions.register(spark)

  test("native functions are callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  size(minhash_signature(array('a','b','c'), 8)) AS sig_len,
        |  simhash64(array('x','y')) AS sh,
        |  token_shingles(array('a','b','c','b','c'), 2, true) AS shingles
        |""".stripMargin).collect().head
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Int]("sig_len") == 8)
    assert(row.getSeq[String](row.fieldIndex("shingles")).toList ==
      List("a b", "b c", "c b"))
  }

  test("SQL results match the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox the quick")).toDF("id", "text")
    df.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS h FROM gf_docs").collect().head.getLong(0)
    val viaCol = df.select(graft.dedup.Dedup.simHash64(col("text")).as("h"))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
  }
}
