package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-registry surface of the hex-WKB codecs ([[GraftExtensions]]):
  * `wkb_parse(hex, kind)`, `wkb_point(lon, lat[, srid])`,
  * `wkb_coords(points, kind[, srid])`.
  */
class WkbSqlSpec extends SparkSpec {
  import spark.implicits._

  test("wkb_point / wkb_parse round-trip through SQL, and run inside codegen") {
    GraftExtensions.register(spark)
    val canonical = "0101000020E6100000000000000000F03F0000000000000040"
    val out = Seq((1.0, 2.0)).toDF("lon", "lat")
      .selectExpr("wkb_point(lon, lat) AS hex")
      .selectExpr("hex", "wkb_parse(hex, 'point') AS pt")
      .first()
    assert(out.getString(0) == canonical)
    assert(out.getSeq[Double](1) == Seq(1.0, 2.0))
    // non-foldable input so the projection can't constant-fold: the
    // expression must survive inside a WholeStageCodegen stage
    val df = spark.range(1).selectExpr("wkb_point(1.0d + cast(id as double), 2.0d) AS hex")
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.first().getString(0) == canonical)
  }

  test("wkb_coords formats linestring/polygon/multipoint; bad kind rejects") {
    GraftExtensions.register(spark)
    val df = Seq(Seq((1.0, 2.0), (3.0, 4.0))).toDF("pts")
      .withColumn("pts", transform(col("pts"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    val hex = df.selectExpr(
      "wkb_coords(pts, 'linestring') AS l",
      "wkb_coords(pts, 'multipoint', 0) AS m").first()
    assert(hex.getString(0).startsWith("0102000020E610000002000000"))
    assert(hex.getString(1).startsWith("010400000002000000"))
    // parse back through the SQL surface
    val back = Seq(hex.getString(0)).toDF("g")
      .selectExpr("wkb_parse(g, 'linestring') AS pts").first()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(back.map(r => (r.getDouble(0), r.getDouble(1))) == Seq((1.0, 2.0), (3.0, 4.0)))
    val err = intercept[Exception] {
      df.selectExpr("wkb_coords(pts, 'triangle')").collect()
    }
    assert(err.getMessage.contains("triangle") || err.getMessage.contains("wkb"))
  }
}
