package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.operators.Ann.CentroidCell

/** Streaming ANN ingest: incremental det-IVF cell assignment of
  * arriving embeddings against a STATIC centroid plane — the vector-side
  * mirror of [[EventTimeOps.corpusIngestIncremental]] (text ingest
  * deduped against a static corpus). A production vector store ingests
  * this way: the coarse quantizer is built offline (batch), ships to
  * every executor as index metadata, and arriving vectors route through
  * it statelessly; only the (vec_id, cell) routing row continues
  * downstream — never the vector through a shuffle.
  *
  * Spark shape: watermark + dropDuplicatesWithinWatermark for
  * exactly-once ingest of re-delivered vector ids (state = ids inside
  * one lateness horizon), then a map-only assignment against the
  * closure-captured plane — append mode, no further state, so the
  * topology scales with partition count and the state store holds ids,
  * not vectors.
  *
  * The assignment arithmetic is bit-identical to the batch index
  * ([[graft.operators.Ann.ivfDetTopK]]'s cell ranking): micro-unit
  * snapping floor(x·10⁶ + 0.5), exact integer dot and norms, affinity
  * floor(10⁴·dot/(√nv·√nc)) with the zero-norm guard, ties to the
  * smallest cell — asserted stream-vs-batch in AnnIngestSpec.
  */
object AnnIngest {

  /** Arriving embedding row. */
  final case class VecIn(vec_id: Long, ts: Timestamp,
                         embedding: Array[Float])

  /** Routed vector: home cell + its affinity in basis points. */
  final case class CellAssign(vec_id: Long, ts: Timestamp, cell: Long,
                              affinity_bp: Long)

  /** Assign each arriving vector its det-IVF home cell. `lateness`
    * bounds both the dedup state and admissible event-time disorder.
    * The plane must be non-empty — routing against no cells is a
    * configuration bug, not an empty result. */
  def assignCells(vecs: Dataset[VecIn], plane: Array[CentroidCell],
                  lateness: String, dedup: Boolean = true)
                 (implicit spark: SparkSession): Dataset[CellAssign] = {
    require(plane.nonEmpty, "empty centroid plane")
    import spark.implicits._
    // sorted copy: the tie rule is "smallest cell wins", which a plane
    // scanned in ascending cell order gives with a strict > compare
    val cells = plane.sortBy(_.cell)
    val watermarked = vecs.withWatermark("ts", lateness)
    val deduped =
      if (dedup) watermarked.dropDuplicatesWithinWatermark("vec_id")
      else watermarked
    deduped.map { v =>
      val xi = new Array[Long](v.embedding.length)
      var nv = 0L
      var i = 0
      while (i < xi.length) {
        val s = math.floor(v.embedding(i).toDouble * 1000000.0 + 0.5).toLong
        xi(i) = s
        nv += s * s
        i += 1
      }
      var bestCell = cells(0).cell
      var bestBp = Long.MinValue
      var c = 0
      while (c < cells.length) {
        val cell = cells(c)
        val n = math.min(xi.length, cell.ci.length)
        var dot = 0L
        var j = 0
        while (j < n) { dot += xi(j) * cell.ci(j); j += 1 }
        val bp =
          if (nv > 0 && cell.nc > 0)
            math.floor(10000.0 * dot
              / (math.sqrt(nv.toDouble) * math.sqrt(cell.nc.toDouble))).toLong
          else 0L
        if (bp > bestBp) { bestBp = bp; bestCell = cell.cell }
        c += 1
      }
      CellAssign(v.vec_id, v.ts, bestCell, bestBp)
    }
  }
}
