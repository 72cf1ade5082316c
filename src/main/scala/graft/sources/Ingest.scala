package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

import graft.operators.{Extract, GediCatalog}

/** Granule ingest — the reference's actual entry point re-expressed for
  * Spark (ref extract.py:100-299: walk granule files, month-filter by
  * filename date, open each with h5py, pull beam-group layers into a
  * DataFrame, pad shot numbers, index rh percentiles, stamp acq_time,
  * optionally quality-filter).
  *
  * Spark-first shape: the ONLY imperative boundary is `GranuleReader`
  * (one granule file -> per-beam primitive column arrays), driven by
  * `mapPartitions` over the granule path list — one task per granule
  * bundle, shots streamed out, nothing collected on the driver. Everything
  * after the reader is declarative: shot padding, rh-percentile indexing,
  * acq_time stamping and the quality predicate are codegen'd projections
  * fused into the SAME stage as the read (no extra pass, no shuffle).
  * At 100 TB this scales by granule count: 1000 executors ingest 1000
  * granules at a time, and the landing write is the stage boundary.
  *
  * HDF5 status: this container has no HDF5 jar (offline, no egress) and
  * the policy is no new deps, so the shipped reader is
  * [[FixtureGranuleReader]] — a tiny self-defined text granule format used
  * by the specs. The swap point for real granules is exactly one class: a
  * jHDF-backed (pure-JVM, public) `GranuleReader` reading `BEAMxxxx/<layer>`
  * datasets — the interface and everything downstream stay unchanged.
  */
object Ingest {

  /** One beam group's layer columns (all arrays share length `n`).
    * Layers land typed by [[layerKind]]: int-ish layers (shot_number,
    * *_flag, num_detectedmodes) as longs, the L2A `rh` profile as a
    * per-shot vector, everything else as doubles. */
  final case class BeamLayers(beam: String, n: Int,
                              longs: Map[String, Array[Long]],
                              doubles: Map[String, Array[Double]],
                              vectors: Map[String, Array[Array[Double]]]) {
    require(longs.values.forall(_.length == n) &&
      doubles.values.forall(_.length == n) &&
      vectors.values.forall(_.length == n),
      s"beam $beam: layer lengths differ from n=$n")
  }

  /** One granule file -> per-beam layer columns. Implementations must be
    * serializable (they run inside executor tasks) and cheap to construct
    * (one instance is shipped per job, opened per file). */
  trait GranuleReader extends Serializable {
    /** Read `layers` for each of `beams` present in the granule; beams
      * missing from the file are silently skipped (ref extract.py:272-275
      * logs and continues). A missing LAYER is an error. */
    def read(path: String, beams: Seq[String], layers: Seq[String]): Seq[BeamLayers]
  }

  sealed trait LayerKind
  case object LongKind extends LayerKind
  case object DoubleKind extends LayerKind
  case object VectorKind extends LayerKind

  /** Storage class of a GEDI layer (public L2A/L2B dataset dtypes):
    * shot_number and the flag/count layers are integers, `rh` is the
    * 101-bin percentile profile vector, all else is floating geolocation /
    * measurement data. */
  def layerKind(layer: String): LayerKind =
    if (layer == "rh") VectorKind
    else if (layer.endsWith("shot_number") || layer.endsWith("_flag") ||
      layer.endsWith("num_detectedmodes")) LongKind
    else DoubleKind

  private val rhVar = "^rh([0-9]+)$".r

  /** Per-variable ingest plan: which layer to read and how the landing
    * column derives from it. `rhNN` on L2A reads the `rh` vector layer and
    * indexes bin NN (ref extract.py:280-286); `shot` zero-pads to 18 chars
    * (ref extract.py:287-290); everything else lands as read. */
  private final case class VarPlan(out: String, srcLayer: String,
                                   kind: LayerKind, rhIdx: Option[Int])

  private def plan(product: String, vars: Seq[(String, String)]): Seq[VarPlan] =
    vars.map {
      case (out, rhVar(idx)) if product == "L2A" =>
        VarPlan(out, "rh", VectorKind, Some(idx.toInt))
      case (out, src) => VarPlan(out, src, layerKind(src), None)
    }

  /** Granule filename date, driver-side — the SAME pattern/format
    * constants as Extract.granuleDate's column-side parse (one contract,
    * two evaluation sites). None when the name carries no date. */
  def granuleDate(name: String): Option[java.time.LocalDateTime] = {
    val m = java.util.regex.Pattern
      .compile(Extract.granuleIdDatePattern).matcher(name)
    if (!m.find()) None
    else scala.util.Try(java.time.LocalDateTime.parse(m.group(1),
      java.time.format.DateTimeFormatter.ofPattern(Extract.granuleDateFormat)))
      .toOption
  }

  /** Ingest explicit granule paths. Returns the landing frame plus the
    * per-granule error counter (the reference's error_tracker,
    * ancillary.py:121-141 — corrupt granules are logged, counted, and
    * skipped rather than failing the whole extraction). */
  def ingestPaths(spark: SparkSession, paths: Seq[String], product: String,
                  beams: Seq[String], vars: Seq[(String, String)],
                  reader: GranuleReader,
                  monthRange: Option[(Int, Int)] = None,
                  applyQualityFilter: Boolean = false,
                  skipCorrupt: Boolean = true): (DataFrame, LongAccumulator) = {
    require(GediCatalog.products.contains(product), s"unknown product $product")
    val errors = spark.sparkContext.longAccumulator("graft_ingest_errors")

    // Month prune by FILENAME date, before any file is opened (ref
    // extract.py:137-146) — driver-side like every DataSource's partition
    // pruning; the granule list is manifest-sized, not data-sized.
    val named = paths.map(p => (p.split("/").last.replaceAll("\\.[A-Za-z0-9]+$", ""), p))
    val kept = monthRange match {
      case None => named
      case Some((a, b)) =>
        val (lo, hi) = if (a > b) (b, a) else (a, b)
        named.filter { case (gid, path) =>
          granuleDate(gid) match {
            case Some(d) => d.getMonthValue >= lo && d.getMonthValue <= hi
            case None =>
              errors.add(1)
              System.err.println(s"[graft ingest] no filename date, skipping $path")
              false
          }
        }
    }

    val plans = plan(product, vars)
    val needed = plans.map(_.srcLayer).distinct
    val beamList = beams
    val rawSchema = StructType(
      StructField("granule_id", StringType, nullable = false) +:
      StructField("beam", StringType, nullable = false) +:
      plans.map(p => StructField("r_" + p.out, p.kind match {
        case LongKind => LongType
        case DoubleKind => DoubleType
        case VectorKind => ArrayType(DoubleType, containsNull = false)
      }, nullable = false)))

    // one partition per granule: task = granule, so a corrupt/slow file
    // retries alone instead of re-running a whole multi-granule slice,
    // and the scheduler load-balances heterogeneous granule sizes
    val slices = math.max(1, kept.size)
    val rdd = spark.sparkContext.parallelize(kept, slices).mapPartitions { it =>
      it.flatMap { case (gid, path) =>
        try {
          reader.read(path, beamList, needed).iterator.flatMap { bl =>
            (0 until bl.n).iterator.map { i =>
              val vals: Seq[Any] = plans.map { p =>
                p.kind match {
                  case LongKind => bl.longs(p.srcLayer)(i)
                  case DoubleKind => bl.doubles(p.srcLayer)(i)
                  case VectorKind => bl.vectors(p.srcLayer)(i).toSeq
                }
              }
              Row.fromSeq(gid +: bl.beam +: vals)
            }
          }
        } catch {
          case NonFatal(e) if skipCorrupt =>
            errors.add(1)
            System.err.println(s"[graft ingest] skipping corrupt granule $path: $e")
            Iterator.empty
        }
      }
    }

    val raw = spark.createDataFrame(rdd, rawSchema)
    val stamped = Extract.stampAcqTime(raw, "granule_id")
    val outCols =
      Seq(col("granule_id"), col("beam"), col("acq_time")) ++ plans.map { p =>
        if (p.srcLayer.endsWith("shot_number"))
          Extract.padShot(col("r_" + p.out)).as(p.out)
        else p.rhIdx match {
          // rh bin NN is 0-based in the profile; element_at is 1-based
          case Some(idx) => Extract.rhPercentile(col("r_" + p.out), idx + 1).as(p.out)
          case None => col("r_" + p.out).as(p.out)
        }
      }
    val landed = stamped.select(outCols: _*)
    (if (applyQualityFilter) Extract.qualityFilter(landed) else landed, errors)
  }

  /** Reference-parity entry: discover granules under `root` for `product`
    * (Manifest.discover with the catalog's filename glob), read the
    * catalog's default base + measurement layers, and land shots. */
  def ingest(spark: SparkSession, root: String, product: String,
             beamGroup: String = "all",
             extraVars: Option[Seq[(String, String)]] = None,
             reader: GranuleReader = new FixtureGranuleReader,
             monthRange: Option[(Int, Int)] = None,
             applyQualityFilter: Boolean = false): (DataFrame, LongAccumulator) = {
    val paths = Manifest.discover(spark, root, GediCatalog.granulePattern(product))
      .select("path").collect().map(_.getString(0)).toSeq.sorted
    // ref extract.py:130-132 raises when the directory holds no granules
    if (paths.isEmpty)
      throw new IllegalArgumentException(
        s"no $product granule files (${GediCatalog.granulePattern(product)}) found under $root")
    val beams = GediCatalog.beamGroups.getOrElse(beamGroup.toLowerCase,
      beamGroup.split(",").toSeq)
    val vars = GediCatalog.defaultBase(product) ++
      extraVars.getOrElse(GediCatalog.defaultVariables(product))
    ingestPaths(spark, paths, product, beams, vars, reader,
      monthRange, applyQualityFilter)
  }
}

/** Self-defined text granule format standing in for HDF5 (see the
  * [[Ingest]] scaladoc for why). One file = one granule:
  *
  * {{{
  * # graft fixture granule v1        (comment lines ignored)
  * BEAM0101 shot_number 12 34 56    (scalar layer: one value per shot)
  * BEAM0101 lat_lowestmode 1.5 2.5 3.5
  * BEAM0101 rh 0.1,0.2 0.3,0.4 0.5,0.6   (vector layer: bins comma-joined)
  * }}}
  *
  * Layer tokens may contain '/' (L2B's geolocation/... paths). Scalar vs
  * long vs vector typing follows [[Ingest.layerKind]] — the same contract
  * a real HDF5 reader satisfies from the datasets' dtypes. */
final class FixtureGranuleReader extends Ingest.GranuleReader {

  /** Manifest.discover hands back Hadoop-style `file:` URIs; this reader
    * is local-filesystem only (a production HDF5 reader would stream via
    * Hadoop's FileSystem API for hdfs/s3 paths). */
  private def localPath(path: String): java.nio.file.Path =
    if (path.startsWith("file:"))
      java.nio.file.Paths.get(new java.net.URI(path).getPath)
    else java.nio.file.Paths.get(path)

  override def read(path: String, beams: Seq[String],
                    layers: Seq[String]): Seq[Ingest.BeamLayers] = {
    val wanted = layers.toSet
    val lines = java.nio.file.Files.readAllLines(localPath(path))
    // beam -> layer -> raw value tokens
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.Map[String, Array[String]]]
    lines.forEach { line =>
      val t = line.trim
      if (t.nonEmpty && !t.startsWith("#")) {
        val parts = t.split("\\s+")
        require(parts.length >= 2, s"bad fixture line in $path: $t")
        val (beam, layer) = (parts(0), parts(1))
        if (wanted.contains(layer))
          acc.getOrElseUpdate(beam, scala.collection.mutable.Map.empty)
            .put(layer, parts.drop(2))
      }
    }
    acc.toSeq.collect { case (beam, byLayer) if beams.contains(beam) =>
      val missing = wanted -- byLayer.keySet
      require(missing.isEmpty, s"$path $beam: missing layers $missing")
      val n = byLayer.values.head.length
      var longs = Map.empty[String, Array[Long]]
      var doubles = Map.empty[String, Array[Double]]
      var vectors = Map.empty[String, Array[Array[Double]]]
      byLayer.foreach { case (layer, toks) =>
        Ingest.layerKind(layer) match {
          case Ingest.LongKind => longs += layer -> toks.map(_.toLong)
          case Ingest.DoubleKind => doubles += layer -> toks.map(_.toDouble)
          case Ingest.VectorKind =>
            vectors += layer -> toks.map(_.split(",").map(_.toDouble))
        }
      }
      Ingest.BeamLayers(beam, n, longs, doubles, vectors)
    }
  }
}
