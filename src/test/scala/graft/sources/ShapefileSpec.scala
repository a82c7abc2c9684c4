package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Shapefile reader against a byte-exact fixture built from the public
  * ESRI spec (July 1998 technical description): two PolyLine records +
  * one Point record, with a dBase III attribute table (HHNR, ETNR, NAME).
  */
class ShapefileSpec extends SparkSpec {
  import spark.implicits._

  private val lines: Seq[(Long, Long, String, Seq[(Double, Double)])] = Seq(
    (1L, 1L, "a", Seq((8.5, 47.3), (8.6, 47.4))),
    (1L, 2L, "b", Seq((8.6, 47.4), (8.7, 47.5), (8.8, 47.6))),
    (2L, 1L, "c", Seq((9.0, 46.0)))) // written as a Point record

  private def polylineContent(pts: Seq[(Double, Double)]): Array[Byte] = {
    val n = pts.length
    val bb = ByteBuffer.allocate(44 + 4 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 3) // PolyLine
    bb.putDouble(4, pts.map(_._1).min); bb.putDouble(12, pts.map(_._2).min)
    bb.putDouble(20, pts.map(_._1).max); bb.putDouble(28, pts.map(_._2).max)
    bb.putInt(36, 1); bb.putInt(40, n)
    bb.putInt(44, 0)
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      bb.putDouble(48 + i * 16, x); bb.putDouble(48 + i * 16 + 8, y)
    }
    bb.array()
  }

  private def pointContent(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 1); bb.putDouble(4, x); bb.putDouble(12, y)
    bb.array()
  }

  private def mainHeader(totalBytes: Int, shapeType: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(100)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, totalBytes / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000)
    bb.putInt(32, shapeType)
    bb.array()
  }

  /** (.shp bytes, .shx bytes) for the record contents. */
  private def buildShp(contents: Seq[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val shpBody = new ByteArrayOutputStream()
    val entries = Seq.newBuilder[(Int, Int)]
    var off = 100
    contents.zipWithIndex.foreach { case (c, i) =>
      val rh = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      rh.putInt(0, i + 1); rh.putInt(4, c.length / 2)
      entries += ((off / 2, c.length / 2))
      shpBody.write(rh.array()); shpBody.write(c)
      off += 8 + c.length
    }
    val body = shpBody.toByteArray
    val shp = mainHeader(100 + body.length, 3) ++ body
    val shxEntries = entries.result()
    val shxBody = ByteBuffer.allocate(8 * shxEntries.length).order(ByteOrder.BIG_ENDIAN)
    shxEntries.zipWithIndex.foreach { case ((o, l), i) =>
      shxBody.putInt(i * 8, o); shxBody.putInt(i * 8 + 4, l)
    }
    val shx = mainHeader(100 + 8 * shxEntries.length, 3) ++ shxBody.array()
    (shp, shx)
  }

  private def buildDbf(rows: Seq[(Long, Long, String)]): Array[Byte] = {
    val fields = Seq(("HHNR", 'N', 10, 0), ("ETNR", 'N', 10, 0), ("NAME", 'C', 8, 0))
    val recSize = 1 + fields.map(_._3).sum
    val headSize = 32 + 32 * fields.length + 1
    val bb = ByteBuffer.allocate(headSize + recSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 0x03.toByte)
    bb.putInt(4, rows.length)
    bb.putShort(8, headSize.toShort)
    bb.putShort(10, recSize.toShort)
    fields.zipWithIndex.foreach { case ((name, typ, len, dec), i) =>
      val base = 32 + 32 * i
      name.getBytes(StandardCharsets.ISO_8859_1).zipWithIndex.foreach {
        case (b, j) => bb.put(base + j, b)
      }
      bb.put(base + 11, typ.toByte)
      bb.put(base + 16, len.toByte)
      bb.put(base + 17, dec.toByte)
    }
    bb.put(headSize - 1, 0x0d.toByte)
    rows.zipWithIndex.foreach { case ((hh, et, nm), i) =>
      val base = headSize + i * recSize
      bb.put(base, ' '.toByte)
      val rec = f"$hh%10d" + f"$et%10d" + nm.padTo(8, ' ')
      rec.getBytes(StandardCharsets.ISO_8859_1).zipWithIndex.foreach {
        case (b, j) => bb.put(base + 1 + j, b)
      }
    }
    bb.put(headSize + recSize * rows.length, 0x1a.toByte)
    bb.array()
  }

  private def writeFixture(): (String, String) = {
    val dir = Files.createTempDirectory("shpfix").toFile
    val contents = lines.map {
      case (_, _, _, pts) if pts.length == 1 => pointContent(pts.head._1, pts.head._2)
      case (_, _, _, pts)                    => polylineContent(pts)
    }
    val (shp, shx) = buildShp(contents)
    val dbf = buildDbf(lines.map(l => (l._1, l._2, l._3)))
    Seq(("routes.shp", shp), ("routes.shx", shx), ("routes.dbf", dbf)).foreach {
      case (name, bytes) =>
        val fos = new FileOutputStream(new java.io.File(dir, name))
        try fos.write(bytes) finally fos.close()
    }
    val zipPath = new java.io.File(dir, "routes.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    try Seq(("routes.shp", shp), ("routes.shx", shx), ("routes.dbf", dbf)).foreach {
      case (name, bytes) =>
        zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    } finally zos.close()
    (new java.io.File(dir, "routes.shp").getAbsolutePath, zipPath.getAbsolutePath)
  }

  private def assertDecoded(rows: Array[Row]): Unit = {
    assert(rows.length == 3)
    val byEt = rows.map(r => (r.getAs[Long]("HHNR"), r.getAs[Long]("ETNR")) -> r).toMap
    val r11 = byEt((1L, 1L))
    assert(r11.getAs[Int]("shape_type") == 3)
    val pts = r11.getSeq[Row](r11.fieldIndex("points"))
      .map(p => (p.getDouble(0), p.getDouble(1)))
    assert(pts == Seq((8.5, 47.3), (8.6, 47.4)))
    assert(byEt((1L, 2L)).getSeq[Row](r11.fieldIndex("points")).length == 3)
    val pt = byEt((2L, 1L))
    assert(pt.getAs[Int]("shape_type") == 1)
    assert(pt.getSeq[Row](pt.fieldIndex("points")).map(p => (p.getDouble(0), p.getDouble(1)))
      == Seq((9.0, 46.0)))
    assert(byEt((1L, 1L)).getAs[String]("NAME") == "a")
  }

  test("shapefile triple decodes: geometry, typed dbf attributes, record order") {
    val (shpPath, _) = writeFixture()
    assertDecoded(Shapefile.read(spark, shpPath).collect())
  }

  test("zip-packaged shapefile decodes identically (MZMV CH_routen shape)") {
    val (_, zipPath) = writeFixture()
    assertDecoded(Shapefile.read(spark, zipPath).collect())
  }

  test("small-partition split covers all records exactly once") {
    val (shpPath, _) = writeFixture()
    val df = Shapefile.read(spark, shpPath, numPartitions = 2)
    assert(df.select("record_nr").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
