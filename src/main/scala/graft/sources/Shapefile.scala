package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipFile
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM ESRI shapefile reader (no native/offline codec needed).
  *
  * Binary layout follows the public "ESRI Shapefile Technical
  * Description" (July 1998): `.shp` holds variable-length geometry
  * records, `.shx` a fixed 8-byte index entry per record, `.dbf`
  * (dBase III) the fixed-width attribute rows, 1:1 with records.
  * The reference consumes shapefiles through geopandas/fiona (GDAL)
  * in read_mzmv (io/dataset_reader.py:395, 434-437); this reader
  * re-expresses the same input Spark-first instead of binding GDAL.
  *
  * Scale design: the `.shx` index (8 bytes/record) is read on the
  * driver and its (offset, length) spans are parallelized; each task
  * seeks into `.shp`/`.dbf` through the Hadoop FileSystem API and
  * decodes only its contiguous record range, so a single large
  * shapefile decodes across the cluster without any driver-side
  * geometry work. A `.zip` input (the shape MZMV ships, CH_routen.zip)
  * is DEFLATE — not range-seekable — so zip entries are decoded from a
  * broadcast byte image instead; unzip first when the file is large.
  *
  * Geometry lands in the engine's linestring convention: `points` is
  * `array<struct<lon,lat>>` (all parts concatenated), `parts` the part
  * start offsets; shape types Null(0), Point(1), PolyLine(3),
  * Polygon(5), MultiPoint(8) and their Z/M variants (11, 13, 15, 18,
  * 21, 23, 25, 28) decode — Z/M payloads trail the XY block and are
  * skipped. Attribute columns are typed from the dBase descriptors
  * (N/F → long or double, L → boolean, else string, ISO-8859-1 — the
  * MZMV encoding, dataset_reader.py:32).
  */
object Shapefile {

  private final case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private final case class DbfHeader(nRecords: Int, headerSize: Int, recordSize: Int,
                                     fields: Seq[DbfField])

  /** Read `path` (a `.shp` whose `.shx`/`.dbf` siblings sit next to it,
    * or a `.zip` containing exactly one such triple) as a DataFrame.
    */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame =
    if (path.toLowerCase.endsWith(".zip")) readZip(spark, path, numPartitions)
    else readFiles(spark, path, numPartitions)

  // -------------------------------------------------------------------
  // plumbing
  // -------------------------------------------------------------------

  private def sibling(shpPath: String, ext: String): String =
    shpPath.replaceAll("(?i)\\.shp$", ext)

  private def openBytes(path: String, offset: Long, len: Int, conf: Configuration): Array[Byte] = {
    val fs = FileSystem.get(new URI(path), conf)
    val in = fs.open(new HPath(path))
    try {
      val buf = new Array[Byte](len)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  private def fileLen(path: String, conf: Configuration): Long = {
    val fs = FileSystem.get(new URI(path), conf)
    fs.getFileStatus(new HPath(path)).getLen
  }

  /** .shx → (offset in bytes, record content length in bytes) per record. */
  private def parseShx(shx: Array[Byte]): Array[(Long, Int)] = {
    val bb = ByteBuffer.wrap(shx).order(ByteOrder.BIG_ENDIAN)
    val n = (shx.length - 100) / 8
    val out = new Array[(Long, Int)](n)
    var i = 0
    while (i < n) {
      val off = bb.getInt(100 + i * 8).toLong * 2
      val len = bb.getInt(100 + i * 8 + 4) * 2
      out(i) = (off, len)
      i += 1
    }
    out
  }

  private def parseDbfHeader(head: Array[Byte]): DbfHeader = {
    val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val hSize = bb.getShort(8) & 0xffff
    val rSize = bb.getShort(10) & 0xffff
    val fields = ArrayBuffer.empty[DbfField]
    var p = 32
    while (p + 32 <= head.length && head(p) != 0x0d) {
      val nameEnd = (p until p + 11).find(head(_) == 0).getOrElse(p + 11)
      val name = new String(head, p, nameEnd - p, StandardCharsets.ISO_8859_1)
      fields += DbfField(name, head(p + 11).toChar, head(p + 16) & 0xff, head(p + 17) & 0xff)
      p += 32
    }
    DbfHeader(nRec, hSize, rSize, fields.toSeq)
  }

  private def fieldType(f: DbfField): DataType = f.typ match {
    case 'N' | 'F' => if (f.dec == 0 && f.typ == 'N' && f.len < 19) LongType else DoubleType
    case 'L'       => BooleanType
    case _         => StringType
  }

  private def schemaFor(fields: Seq[DbfField]): StructType = {
    val geom = Seq(
      StructField("record_nr", LongType, nullable = false),
      StructField("shape_type", IntegerType, nullable = false),
      StructField("parts", ArrayType(IntegerType, containsNull = false), nullable = true),
      StructField("points", ArrayType(StructType(Seq(
        StructField("lon", DoubleType, nullable = false),
        StructField("lat", DoubleType, nullable = false))), containsNull = false),
        nullable = true))
    StructType(geom ++ fields.map(f => StructField(f.name, fieldType(f), nullable = true)))
  }

  /** Decode one .shp record content (after the 8-byte record header). */
  private def decodeShape(content: ByteBuffer): (Int, Array[Int], Array[(Double, Double)]) = {
    content.order(ByteOrder.LITTLE_ENDIAN)
    val st = content.getInt(0)
    def pointsAt(base: Int, n: Int): Array[(Double, Double)] = {
      val pts = new Array[(Double, Double)](n)
      var i = 0
      while (i < n) {
        pts(i) = (content.getDouble(base + i * 16), content.getDouble(base + i * 16 + 8))
        i += 1
      }
      pts
    }
    st match {
      case 0 => (st, Array.empty, Array.empty) // null shape
      case 1 | 11 | 21 => // Point / PointZ / PointM: x, y lead the payload
        (st, Array(0), pointsAt(4, 1))
      case 8 | 18 | 28 => // MultiPoint family: box, n, points
        val n = content.getInt(36)
        (st, Array(0), pointsAt(40, n))
      case 3 | 5 | 13 | 15 | 23 | 25 => // PolyLine / Polygon families
        val nParts = content.getInt(36)
        val nPoints = content.getInt(40)
        val parts = new Array[Int](nParts)
        var i = 0
        while (i < nParts) { parts(i) = content.getInt(44 + i * 4); i += 1 }
        (st, parts, pointsAt(44 + nParts * 4, nPoints))
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  private def decodeDbfRecord(rec: Array[Byte], fields: Seq[DbfField]): Array[Any] = {
    val out = new Array[Any](fields.length)
    var p = 1 // deletion flag byte
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      val raw = new String(rec, p, f.len, StandardCharsets.ISO_8859_1).trim
      out(i) = f.typ match {
        case 'N' | 'F' =>
          if (raw.isEmpty || raw.startsWith("*")) null
          else if (f.dec == 0 && f.typ == 'N' && f.len < 19) java.lang.Long.valueOf(raw.toLong)
          else java.lang.Double.valueOf(raw.toDouble)
        case 'L' => raw.toUpperCase match {
          case "T" | "Y" => java.lang.Boolean.TRUE
          case "F" | "N" => java.lang.Boolean.FALSE
          case _         => null
        }
        case _ => if (raw.isEmpty) null else raw
      }
      p += f.len
      i += 1
    }
    out
  }

  private def rowsFor(recIdx: Range, shpAt: (Long, Int) => Array[Byte],
                      dbfAt: Int => Array[Byte], index: Array[(Long, Int)],
                      fields: Seq[DbfField]): Iterator[Row] =
    recIdx.iterator.map { i =>
      val (off, len) = index(i)
      val content = ByteBuffer.wrap(shpAt(off + 8, len))
      val (st, parts, pts) = decodeShape(content)
      val attrs = decodeDbfRecord(dbfAt(i), fields)
      Row.fromSeq(
        Seq((i + 1).toLong, st, parts.toSeq, pts.map(p => Row(p._1, p._2)).toSeq) ++ attrs)
    }

  /** Per-task contiguous .shp read span cap. Keeps a single read's byte
    * array well under `Int.MaxValue` (JVM array limit) even when the
    * record-count split would put a multi-GB span in one partition.
    */
  private val MaxSpanBytes: Long = 256L * 1024 * 1024

  private def readFiles(spark: SparkSession, shpPath: String, numPartitions: Int): DataFrame = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val shxPath = sibling(shpPath, ".shx")
    val dbfPath = sibling(shpPath, ".dbf")
    val index = parseShx(openBytes(shxPath, 0, fileLen(shxPath, hadoopConf).toInt, hadoopConf))
    val dbfHead = parseDbfHeader(openBytes(dbfPath, 0,
      math.min(fileLen(dbfPath, hadoopConf), 32 + 255 * 32 + 1).toInt, hadoopConf))
    val schema = schemaFor(dbfHead.fields)
    val n = index.length
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism, n))
    val fields = dbfHead.fields
    val (hSize, rSize) = (dbfHead.headerSize, dbfHead.recordSize)
    val confB = spark.sparkContext.broadcast(new graft.util.SerializableHadoopConf(hadoopConf))
    val ranges = splitRanges(index, parts)
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(1, ranges.length))
      .mapPartitions { ranges =>
        val conf = confB.value.value
        ranges.flatMap { case (a, b) =>
          if (a >= b) Iterator.empty
          else {
            // one contiguous read per file per task — records [a, b)
            val shpFrom = index(a)._1
            val shpTo = index(b - 1)._1 + 8 + index(b - 1)._2
            val span = shpTo - shpFrom
            require(span <= Int.MaxValue, s"shp span $span exceeds a single read; more partitions needed")
            val shpBuf = openBytes(shpPath, shpFrom, span.toInt, conf)
            val dbfBuf = openBytes(dbfPath, hSize.toLong + a.toLong * rSize, (b - a) * rSize, conf)
            rowsFor(a until b,
              (off, len) => java.util.Arrays.copyOfRange(
                shpBuf, (off - shpFrom).toInt, (off - shpFrom).toInt + len),
              i => java.util.Arrays.copyOfRange(dbfBuf, (i - a) * rSize, (i - a + 1) * rSize),
              index, fields)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Split `[0, n)` into ~`parts` record ranges, additionally breaking any
    * range whose .shp byte span would exceed [[MaxSpanBytes]].
    */
  private def splitRanges(index: Array[(Long, Int)], parts: Int): Seq[(Int, Int)] = {
    val n = index.length
    val per = math.max(1, (n + parts - 1) / parts)
    val out = ArrayBuffer.empty[(Int, Int)]
    var a = 0
    while (a < n) {
      var b = a + 1
      def spanOf(end: Int): Long = index(end - 1)._1 + 8 + index(end - 1)._2 - index(a)._1
      while (b < math.min(n, a + per) && spanOf(b + 1) <= MaxSpanBytes) b += 1
      out += ((a, b))
      a = b
    }
    out.toSeq
  }

  private def splitRanges(n: Int, parts: Int): Seq[(Int, Int)] = {
    val per = math.max(1, (n + parts - 1) / parts)
    (0 until n by per).map(a => (a, math.min(n, a + per)))
  }

  private def readZip(spark: SparkSession, zipPath: String, numPartitions: Int): DataFrame = {
    def entryBytes(suffix: String): Array[Byte] = {
      val zf = new ZipFile(zipPath)
      try {
        val es = zf.entries()
        var found: Array[Byte] = null
        while (es.hasMoreElements && found == null) {
          val e = es.nextElement()
          val name = e.getName
          val base = name.substring(name.lastIndexOf('/') + 1)
          // skip resource-fork noise (__MACOSX/._routes.shp also ends in .shp)
          val junk = e.isDirectory || base.startsWith(".") || name.contains("__MACOSX")
          if (!junk && name.toLowerCase.endsWith(suffix)) found = zf.getInputStream(e).readAllBytes()
        }
        require(found != null, s"no $suffix entry in $zipPath")
        found
      } finally zf.close()
    }
    val shp = entryBytes(".shp")
    val index = parseShx(entryBytes(".shx"))
    val dbf = entryBytes(".dbf")
    val dbfHead = parseDbfHeader(dbf)
    val schema = schemaFor(dbfHead.fields)
    val fields = dbfHead.fields
    val (hSize, rSize) = (dbfHead.headerSize, dbfHead.recordSize)
    val n = index.length
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism, n))
    val shpB = spark.sparkContext.broadcast(shp)
    val dbfB = spark.sparkContext.broadcast(dbf)
    val idxB = spark.sparkContext.broadcast(index)
    val rdd = spark.sparkContext
      .parallelize(splitRanges(n, parts), math.max(1, parts))
      .mapPartitions { ranges =>
        ranges.flatMap { case (a, b) =>
          rowsFor(a until b,
            (off, len) => java.util.Arrays.copyOfRange(shpB.value, off.toInt, off.toInt + len),
            i => java.util.Arrays.copyOfRange(dbfB.value, hSize + i * rSize, hSize + (i + 1) * rSize),
            idxB.value, fields)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
