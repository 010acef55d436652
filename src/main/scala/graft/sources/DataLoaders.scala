package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kernel.Eval

/** One TSSB benchmark series: dense per-point state labels are derived like
  * the reference (`create_state_labels(cps, segment_labels, n) + 1`). */
final case class TssbDataset(
    dataset: String,
    windowSize: Int,
    changePoints: Array[Int],
    labels: Array[Int],
    timeSeries: Array[Double])

/** One HAS benchmark recording; `dims` is dim-major (sensor-major). */
final case class HasDataset(
    dataset: String,
    windowSize: Int,
    changePoints: Array[Int],
    activities: Array[String],
    dims: Array[Array[Double]])

/** File-format loaders for the reference's two benchmark datasets, parsing
  * the exact on-disk formats of `/root/reference/claspy/data_loader.py`
  * (:49-150 TSSB txt triple, :153-260 HAS zipped CSV) from LOCAL files —
  * this engine never downloads (the reference's urlretrieve step is outside
  * scope in a no-egress environment; point `dir` at an existing checkout).
  */
object DataLoaders {

  /** TSSB: `desc.txt` rows `name,window,cp...`; `properties.txt` rows
    * `name,interpretable,label_cut,resample_rate,label...` (labels divided
    * by label_cut+1); `<name>.txt` whitespace-separated float64s. */
  def loadTssb(dir: String, names: Set[String] = null): Seq[TssbDataset] = {
    def lines(f: String): Seq[String] = {
      val src = scala.io.Source.fromFile(new java.io.File(dir, f), "UTF-8")
      try src.getLines().toList finally src.close()
    }
    val desc = lines("desc.txt").map(_.split(",").map(_.trim)).filter(r =>
      names == null || names.contains(r(0)))
    val prop = lines("properties.txt").map(_.split(",").map(_.trim)).filter(r =>
      names == null || names.contains(r(0)))
    desc.zip(prop).map { case (d, p) =>
      val name = d(0)
      val window = d(1).toInt
      val cps = d.drop(2).filter(_.nonEmpty).map(_.toInt)
      val labelCut = p(2).toInt
      val segLabels = p.drop(4).filter(_.nonEmpty).map(_.toInt / (labelCut + 1))
      val src = scala.io.Source.fromFile(new java.io.File(dir, name + ".txt"), "UTF-8")
      val ts = try src.getLines().flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .map(java.lang.Double.parseDouble).toArray finally src.close()
      val dense = Eval.createStateLabels(cps, segLabels, ts.length).map(_ + 1)
      TssbDataset(name, window, cps, dense, ts)
    }
  }

  /** HAS sensor order per group (data_loader.py:229-250; lat/lon/speed are
    * commented out in the reference too). */
  private val IndoorSensors =
    Array("x-acc", "y-acc", "z-acc", "x-gyro", "y-gyro", "z-gyro", "x-mag", "y-mag", "z-mag")
  private val OutdoorSensors =
    Array("x-acc", "y-acc", "z-acc", "x-mag", "y-mag", "z-mag")

  /** HAS: `has.csv.zip` containing one CSV whose sensor cells are python
    * list literals. Window size is fixed at 50 like the reference. */
  def loadHas(zipPath: String): Seq[HasDataset] = {
    val zf = new java.util.zip.ZipFile(zipPath)
    val csv = try {
      val entry = zf.entries().nextElement()
      val in = zf.getInputStream(entry)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    } finally zf.close()
    val rows = parseCsv(csv)
    val header = rows.head.zipWithIndex.toMap
    rows.tail.filter(_.exists(_.nonEmpty)).map { r =>
      def cell(c: String) = r(header(c))
      val group = cell("group")
      val name = s"${group}_subject${cell("subject")}_routine${cell("routine")} (id${cell("ts_challenge_id")})"
      val cps = parsePyList(cell("change_points")).map(_.toDouble.toInt)
      val acts = parsePyStrList(cell("activities"))
      val sensors = if (group == "indoor") IndoorSensors else OutdoorSensors
      val dims = sensors.map(s => parsePyList(cell(s)).map(java.lang.Double.parseDouble))
      HasDataset(name, 50, cps, acts, dims)
    }
  }

  /** Minimal RFC-4180 CSV: quoted cells (lists contain commas), "" escapes. */
  private def parseCsv(text: String): Seq[Array[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val cell = new java.lang.StringBuilder
    var inQ = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { cell.append('"'); i += 1 }
          else inQ = false
        } else cell.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => row += cell.toString; cell.setLength(0)
        case '\n' =>
          row += cell.toString; cell.setLength(0)
          rows += row.toArray; row.clear()
        case '\r' => // swallow
        case other => cell.append(other)
      }
      i += 1
    }
    if (cell.length > 0 || row.nonEmpty) { row += cell.toString; rows += row.toArray }
    rows.toSeq
  }

  /** `[1.0, 2.5, ...]` → element strings (numbers). */
  private def parsePyList(s: String): Array[String] = {
    val inner = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) Array.empty else inner.split(",").map(_.trim)
  }

  /** `['walk', 'sit']` → unquoted strings. */
  private def parsePyStrList(s: String): Array[String] =
    parsePyList(s).map(_.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\""))

  // ------------------------------------------------------- Spark surfaces

  /** TSSB as a DataFrame (dataset, window_size, cps, labels, time_series) —
    * the per-series kernel queries consume it via groupByKey(dataset). */
  def tssbDF(spark: SparkSession, dir: String, names: Set[String] = null): DataFrame = {
    import spark.implicits._
    loadTssb(dir, names)
      .map(t => (t.dataset, t.windowSize, t.changePoints, t.labels, t.timeSeries))
      .toDF("dataset", "window_size", "cps", "labels", "time_series")
  }

  /** HAS as a DataFrame with an ArrayType(ArrayType(Double)) dim-major
    * series column (SURVEY §1.4 multivariate shape). */
  def hasDF(spark: SparkSession, zipPath: String): DataFrame = {
    import spark.implicits._
    loadHas(zipPath)
      .map(h => (h.dataset, h.windowSize, h.changePoints, h.activities, h.dims))
      .toDF("dataset", "window_size", "cps", "activities", "dims")
  }
}
