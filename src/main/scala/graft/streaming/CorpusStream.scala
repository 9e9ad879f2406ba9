package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Structured Streaming forms of the corpus operators. The batch twins
  * live in graft.ops.Dedup; the signature and banding projections are
  * SHARED (Dedup.minHashSignaturesRaw / Dedup.bandKeys), so a document
  * hashes to the same band buckets whichever engine sees it.
  */
object CorpusStream {

  /** A band-bucket collision: `id_b` arrived and its band `band` hashed
    * into bucket `bucket` already anchored by `id_a` (the bucket's
    * canonical min id). Candidate pairs, NOT verified duplicates — the
    * streaming analog of [[graft.ops.Dedup.minHashLsh]]'s pre-verify
    * banding join. Downstream either verifies against a standing corpus
    * (stream-static gram join) or feeds incremental CC (d11's fold).
    */
  final case class BandHit(id_a: Long, id_b: Long, band: Int, bucket: Long)

  final case class BucketState(minId: Long)

  /** Streaming near-duplicate candidate generation: MinHash-LSH banding
    * as ONE stateful operator. Each arriving document explodes to its
    * `bands` band keys; per (band, bucket) the state holds only the
    * bucket's canonical MIN id (a single long — not the member list), and
    * emissions link every new arrival to that canonical id, plus a
    * re-link when a smaller id takes over the anchor. Connectivity over
    * the emitted links therefore equals bucket co-membership — the same
    * information the batch banding join produces as all-pairs — while
    * per-bucket emission stays linear in arrivals (the batch side needs
    * its hot-bucket cap precisely because bucket^2 pair rows blow up;
    * the anchor-link formulation never materializes them).
    *
    * State at 100 TB: one (long) per distinct live (band, bucket) key.
    * With `ttlSeconds > 0` (requires `withWatermark` upstream) a bucket
    * idle past the horizon is forgotten — the standing-corpus dedup
    * window production streams actually run, since "near-dup of a
    * document from years ago" is the incremental BATCH pipeline's job
    * (d06/d09/d11), not the hot path's. `ttlSeconds = 0` keeps state
    * forever (bounded-corpus replays, tests).
    */
  def lshCandidateStream(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int,
      rowsPerBand: Int,
      ttlSeconds: Long = 0L): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandKeys(
      Dedup.minHashSignaturesRaw(docs, textCol, idCol, bands * rowsPerBand),
      bands, rowsPerBand)
      .as[(Long, Int, Long)]
    val timeout =
      if (ttlSeconds > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[BucketState, BandHit](
        OutputMode.Append, timeout) {
        case ((band, bucket), it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = it.map(_._1).toArray.distinct.sorted
            val prior = state.getOption.map(_.minId)
            val anchor = (prior.toSeq ++ ids).min
            state.update(BucketState(anchor))
            if (ttlSeconds > 0L)
              state.setTimeoutDuration(ttlSeconds * 1000L)
            val newIds = ids.filterNot(prior.contains)
            val links = newIds.filter(_ != anchor)
              .map(i => BandHit(anchor, i, band, bucket)) ++
              // a new smaller id displaced the anchor: re-link the old
              // one so connectivity over emissions is preserved
              prior.filter(_ > anchor)
                .map(p => BandHit(anchor, p, band, bucket))
            links.iterator
          }
      }
  }
}
