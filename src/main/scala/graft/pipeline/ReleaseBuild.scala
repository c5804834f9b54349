package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, CorpusOps}

/** Incremental END-TO-END release build: roll crawl release N+1 forward
  * against persisted state, reading no prior-release text outside the
  * id-keyed candidate verifications — the nightly job a 100 TB corpus
  * operator actually runs, composed from the individually-verified
  * incremental stages (the reference analogue is the release-versioned
  * idempotent upsert loop, `db_etl_upload/uploader.py:320-325`, applied to
  * the whole curation funnel instead of one table):
  *
  *  1. exact dedup against every prior release via the signature store's
  *     `content_md5` column + keep-first within the new slice (q121),
  *  2. near-dup gate: drop new documents whose exact Jaccard reaches the
  *     threshold against any prior-release document (via the store's
  *     band buckets — no prior re-signing) or any earlier kept document
  *     of the new slice (q120),
  *  3. novelty gate: per-document unseen-gram permille against the
  *     persisted gram store, dropping low-novelty documents (q132),
  *  4. frozen-weight quality gate: margin of the pre-trained linear
  *     classifier must be positive — one per-row expression (q134),
  *  5. temperature mix over the survivors (q110).
  *
  * Scale shape: every stage is the verified incremental one — the new
  * slice is signed/shingled once; stores are joined by content hash,
  * (band, bucket), or gram hash; prior text is touched only for the
  * candidate verify; the mix is a broadcast rate table + map-side filter.
  * Nothing prior-release-sized shuffles.
  */
object ReleaseBuild {

  /** Gate thresholds; defaults are the declared q140 fixture's. */
  case class Params(jaccard: Double = 0.5, noveltyFloor: Long = 200,
                    alpha: Double = 0.5, budgetTokens: Long = 4000)

  /** Pure roll-forward over store FRAMES (the declared q140 passes the
    * prior release inline so the query stays pure; the disk path reads the
    * same frames from parquet — ReleaseBuildSpec pins disk ≡ inline).
    *
    * @param sigStore   [[SignatureStore]] rows of every prior release
    * @param gramStore  rows with a `gram_h` column ([[GramStore]] layout)
    * @param verifyDocs text lookup for near-dup candidate verification
    *                   (prior + new releases; candidate-id-keyed access)
    * @param weights    dense classifier weights (frozen, micro-units)
    * @return one row per retained new document:
    *         (doc_id, source, n_tokens, novelty_permille, margin_micro) */
  def rollForward(newDocs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, verifyDocs: DataFrame,
                  sigStore: DataFrame, gramStore: DataFrame,
                  weights: Array[Long], p: Params = Params()): DataFrame = {
    // 1. exact: content-hash anti-join vs store + keep-first in the slice
    val exactKept = SignatureStore.incrementalExactKeep(
      newDocs, idCol, textCol, sigStore)
    val d1 = newDocs.join(exactKept.select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi")
    // 2. near-dup: any verified pair to a prior doc or an earlier kept doc
    val pairs = SignatureStore.incrementalNearDups(
      d1, idCol, textCol, sigStore, verifyDocs, p.jaccard)
    val d2 = d1.join(pairs.select(col("new_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
    // 3. novelty floor against the gram store
    val nov = GramStore.noveltyAgainst(d2, idCol, textCol, gramStore)
      .where(col("novelty_permille") >= p.noveltyFloor)
      .select(col(idCol), col("novelty_permille"))
    val d3 = d2.join(nov, Seq(idCol))
    // 4. frozen-weight margin gate (map-side expression, no join).
    // NOTE (r15, measured): the survivor set is consumed three times
    // downstream (mix totals, mix filter, join-back) — an eager
    // localCheckpoint pin here was A/B'd and REGRESSED q140 8.0→15.4 s:
    // within one action the repeated subtrees dedup through
    // ReusedExchange and AQE materializes independent stages
    // concurrently, while the pin serializes that work at construction
    // time. Left as the planner-shared triple consumption deliberately.
    val d4 = d3.withColumn("margin_micro",
        Classifier.scoreExpr(col(textCol), weights))
      .where(col("margin_micro") > 0)
    // 5. temperature mix over the survivors
    CorpusOps.temperatureMix(d4, idCol, sourceCol, textCol,
        p.alpha, p.budgetTokens)
      .join(d4.select(col(idCol), col("novelty_permille"),
        col("margin_micro")), Seq(idCol))
  }

  /** Disk roll-forward: read both stores (excluding this release's own
    * partition, so a rerun after a partial failure converges — the
    * [[graft.streaming.StreamEntry.ingestDocs]] replay contract), build the
    * release, then append the RETAINED documents' signatures and novel
    * grams as this release's partitions. Returns the retained rows.
    *
    * `verifyDocs` carries a STRONGER contract here than [[rollForward]]'s
    * candidate-id-keyed lookup: it must be the COMPLETE retained corpus
    * plus the night's new docs (prior releases' every retained row, with
    * its stored text). The takedown-recovery path below rebuilds pinned
    * releases' gram margins from it — a pruned frame would silently drop
    * live grams from the restored partitions, a loss the release-bounded
    * end-of-night audits cannot see. */
  def rollForwardOnDisk(spark: SparkSession, newDocs: DataFrame,
                        idCol: String, textCol: String, sourceCol: String,
                        verifyDocs: DataFrame, sigPath: String,
                        gramPath: String, release: String,
                        weights: Array[Long], p: Params = Params(),
                        deepAuditEvery: Int = 0): DataFrame = {
    // converge a takedown crashed between its signature delete and its gram
    // restore before building on the stores (the [[VectorRelease.maintain]]
    // step-0 symmetry: a night must not roll forward over torn state).
    // The recovery frame is the retained PRIOR corpus: the night's new rows
    // are subtracted ROW-wise (id + text), so a new doc reusing a retained
    // member's id cannot inject its text into a pinned release's restored
    // margin (the signature contract allows one id under several releases;
    // membership semi-joins alone can't tell the two texts apart). Lazy —
    // absent marker this whole branch is one fs.exists and the exceptAll
    // never runs.
    val retainedPrior = verifyDocs.select(col(idCol), col(textCol))
      .exceptAll(newDocs.select(col(idCol), col(textCol)))
    recoverTakedown(spark, sigPath, gramPath, retainedPrior, idCol, textCol)
    spark.catalog.refreshByPath(sigPath)
    spark.catalog.refreshByPath(gramPath)
    val sig = SignatureStore.read(spark, sigPath)
      .where(col("release") =!= release)
    val grams = GramStore.read(spark, gramPath)
      .where(col("release") =!= release).select("gram_h")
    // pin the result before the appends dynamically replace store files
    // this plan's reads have listed (same reasoning as GramStore.append)
    val out = rollForward(newDocs, idCol, textCol, sourceCol, verifyDocs,
      sig, grams, weights, p).localCheckpoint()
    val retained = newDocs.join(out.select(idCol), Seq(idCol), "left_semi")
    SignatureStore.append(spark, sigPath, release, retained, idCol, textCol)
    // the retained slice's gram set feeds BOTH the append's novel margin
    // and the gate's provenance card below — compute the shingle pass once
    // and pin it (delta-sized: the night's retained docs only)
    val retGrams = GramStore.grams(retained, textCol).localCheckpoint()
    GramStore.append(spark, gramPath, release, retained, textCol,
      docGrams = Some(retGrams))
    // INTEGRITY GATE (the text-tier twin of [[VectorRelease.maintain]]'s):
    // the night ends by auditing the partitions it just wrote and aborting
    // loudly on any non-zero invariant, so a torn append cannot report
    // success. Checked: this release's signature partition holds EXACTLY
    // the retained ids (missing = a lost append, orphan = a ghost row;
    // dup is scoped out — the signature contract allows an id under
    // several releases), this release's gram partition is a subset of the
    // retained docs' grams (orphan only: missing is legitimate — the
    // margin excludes grams held elsewhere), and the night's freshly
    // written gram margin is NEW to the store — the only
    // one-release-per-gram layout violation an append can introduce,
    // proved against the per-release gram SKETCHES with the column-pruned
    // scan as the on-hit fallback (a dup between two PRIOR partitions is
    // pre-existing corruption, the scheduled q207 card's to catch). Cost:
    // delta-sized passes only on a clean night — nothing store-sized is
    // read, let alone shuffled. The abort leaves the store recoverable —
    // both appends are release-partition idempotent, so a rerun converges
    // (which also re-pairs a sketch torn from its partition by a crash
    // between the two writes — the store-wide crash contract).
    val retainedIds = retained.select(col(idCol).cast("long").as("doc_id"),
      lit(release).as("release"))
    spark.catalog.refreshByPath(sigPath)
    spark.catalog.refreshByPath(gramPath)
    val gramsNow = GramStore.read(spark, gramPath)
    // both release-bounded cards verify in ONE collect (per-card
    // invariants and contexts preserved — StoreAudit.assertZeroAll)
    StoreAudit.assertZeroAll(Seq(
      (StoreAudit.card("signatures",
        SignatureStore.read(spark, sigPath)
          .where(col("release") === release),
        "doc_id", retainedIds, dupInvariant = false),
        Seq("orphan", "missing"), s"release '$release': signature coverage"),
      (StoreAudit.card("grams",
        gramsNow.where(col("release") === release), "gram_h",
        retGrams
          .withColumn("release", lit(release)), dupInvariant = false),
        Seq("orphan"), s"release '$release': gram margin provenance")))
    // The layout probe consults the per-release gram sketches first
    // ([[GramStore.sketchHitReleases]] — the [[VectorRelease.maintain]]
    // delta-newness shape): a Bloom miss is definitive, so a clean night
    // proves its margin new with kilobytes of sketch + one map pass over
    // the delta and reads NO other partition's files; the column-pruned
    // scan survives as the on-hit fallback, pruned to the hit releases.
    // The fallback broadcasts the delta margin only below
    // [[VectorRelease.BroadcastRowCeiling]] (a nightly's novel grams can
    // be hundreds of MB); above it a keyed left-semi shuffle degrades
    // gracefully instead of risking the driver.
    val deltaGrams = gramsNow.where(col("release") === release)
      .select("gram_h")
    val gramHits = GramStore.sketchHitReleases(spark, gramPath, deltaGrams,
      release)
    lastGramProbeScanned = gramHits
    val nLayoutDup =
      if (gramHits.isEmpty) 0L
      else {
        val probe =
          if (deltaGrams.count() <= VectorRelease.BroadcastRowCeiling)
            broadcast(deltaGrams)
          else deltaGrams
        gramsNow.where(col("release").cast("string").isin(gramHits: _*))
          .select("gram_h")
          .join(probe, Seq("gram_h"), "left_semi").count()
      }
    if (nLayoutDup > 0) throw new IllegalStateException(
      s"store integrity audit failed (release '$release': gram store " +
        s"layout): $nLayoutDup of this release's grams already stored " +
        "under a prior release")
    // SCHEDULED DEEP AUDIT — the text tier's [[VectorRelease.maintain]]
    // `deepAuditEvery` cadence ([[StoreAudit.readAuditClock]] beside the
    // gram store): the release-bounded gates above deliberately trust
    // untouched prior releases, so every k-th night pays the full
    // fixture-free text card. Checked: every signature row's doc exists in
    // the retained corpus AND every retained doc signs somewhere (orphan +
    // store-wide missing — this is where verifyDocs' strong contract pays
    // off: it IS the retained corpus plus tonight's new docs, so the
    // signed population is derivable); the gram store holds each gram
    // under exactly ONE release and no gram outside the corpus's gram set
    // (cross_release_dup + orphan — the `missing` direction is
    // deliberately unchecked store-wide: GramStore.vacuum's documented
    // takedown conservativeness legitimately forgets straddling grams, so
    // corpus-grams-absent-from-store is not an invariant). Cost: one
    // corpus text pass for the gram set + signature-store-keyed scans —
    // the scheduled price, paid every k nights instead of never. An
    // aborted night leaves the clock unstamped, so the audit re-arms.
    val (nightsSoFar, lastDeep) = StoreAudit.readAuditClock(spark, gramPath)
    val night = nightsSoFar + 1
    val deepDue = deepAuditEvery > 0 && night - lastDeep >= deepAuditEvery
    if (deepDue) {
      spark.catalog.refreshByPath(sigPath)
      val signedUniverse = retainedPrior
        .select(col(idCol).cast("long").as("doc_id"))
        .unionByName(retained.select(col(idCol).cast("long").as("doc_id")))
      StoreAudit.assertZeroAll(Seq(
        (StoreAudit.card("signatures",
          SignatureStore.read(spark, sigPath), "doc_id",
          signedUniverse, dupInvariant = false),
          Seq("orphan", "missing"),
          s"release '$release' deep audit: signature store vs retained corpus"),
        (StoreAudit.card("grams", gramsNow, "gram_h",
          GramStore.grams(verifyDocs, textCol)),
          Seq("cross_release_dup", "orphan"),
          s"release '$release' deep audit: gram store layout")))
    }
    StoreAudit.writeAuditClock(spark, gramPath, night,
      if (deepDue) night else lastDeep)
    out
  }

  /** The releases the LAST [[rollForwardOnDisk]] gram-layout probe
    * actually scanned (empty = sketches cleared the store) — test
    * instrumentation only, the [[lastRestorePasses]] idiom. */
  @volatile private[graft] var lastGramProbeScanned: Seq[String] = Nil

  /** Realize a document TAKEDOWN across the text tier's persisted stores —
    * the q204 contract ([[VectorRelease.maintain]]'s takedown step) for
    * text. Two moves:
    *
    *  1. [[SignatureStore.delete]] removes the ids' signature rows exactly
    *     (per-document rows — incremental dedup immediately stops seeing
    *     the documents; no exclusion list needed).
    *  2. Each affected release's GRAM partition is restored by re-appending
    *     it from the release's REMAINING member documents
    *     ([[GramStore.append]] rebuilds the release's novel margin against
    *     the other partitions); a release the takedown emptied is vacuumed
    *     instead. The restore runs a SECOND pass when several releases are
    *     affected, so a gram stored under one affected release but
    *     surviving only in another's live docs is re-admitted rather than
    *     lost between the sequential margins. Exact for grams confined to
    *     the affected releases; a taken-down gram that had straddled into
    *     an UNAFFECTED later release's suppressed margin inherits
    *     [[GramStore.vacuum]]'s documented conservativeness — novelty can
    *     only read HIGHER, never wrongly suppress.
    *
    * Frozen artifacts that PREDATE the takedown (classifier weights,
    * quantizer models) stay frozen — retraining them is a separate, heavier
    * decision, exactly the q204 stance on the vector side. `remainingDocs`
    * is the corpus minus the taken-down documents (release membership is
    * recovered from the signature store, so one frame serves every
    * release). Cost: bounded by the affected releases' document counts,
    * never the corpus. Returns signature rows removed.
    *
    * CRASH-SAFE via the [[IndexStore.recover]] marker idiom: the affected
    * releases are computed from PRE-delete membership, so a crash between
    * the signature delete and the gram restore would leave a rerun unable
    * to name them (membership is gone) — the dropped documents' grams
    * would silently outlive the takedown, the unsafe direction for a
    * right-to-be-forgotten path. So the restore obligation is PINNED
    * first: the affected list lands in a `_TAKEDOWN_PENDING` marker next
    * to the gram store (tmp-write + atomic rename) BEFORE the delete, and
    * is dropped only after the restore passes complete. Every entry calls
    * [[recoverTakedown]] first, so a rerun — the batch operator re-invoked,
    * or a streaming replay of the failed micro-batch
    * ([[graft.streaming.StreamEntry.takedownText]]) — converges the
    * crashed predecessor's restore before its own work. All windows
    * converge: pre-marker nothing changed; pre-delete the recovery restore
    * matches still-intact membership (a semantic no-op) and the rerun
    * proceeds normally; mid-restore the recovery re-runs the
    * partition-idempotent appends under post-delete membership; post-
    * restore it re-restores idempotently and drops the marker. */
  def takedownDocs(spark: SparkSession, sigPath: String, gramPath: String,
                   ids: DataFrame, remainingDocs: DataFrame,
                   idCol: String, textCol: String): Long = {
    recoverTakedown(spark, sigPath, gramPath, remainingDocs, idCol, textCol)
    val tomb = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    // membership BEFORE the delete names the releases whose gram margins
    // must be restored afterwards
    spark.catalog.refreshByPath(sigPath)
    val affected = SignatureStore.read(spark, sigPath)
      .join(broadcast(tomb), Seq("doc_id"), "left_semi")
      .select(col("release").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    // pin the restore obligation BEFORE the delete erases the membership
    // that names it (scaladoc: the crash-safety marker)
    if (affected.nonEmpty) writeMarker(spark, gramPath, affected)
    val removed = SignatureStore.delete(spark, sigPath, tomb)
    restoreReleases(spark, sigPath, gramPath, remainingDocs, idCol, textCol,
      affected)
    dropMarker(spark, gramPath)
    removed
  }

  /** Converge a [[takedownDocs]] interrupted between its signature delete
    * and its gram restore: with the `_TAKEDOWN_PENDING` marker present,
    * re-run the restore passes for the pinned releases under CURRENT
    * membership, then drop the marker; absent marker, a no-op (one
    * `fs.exists`). `remainingDocs` is the caller's current retained corpus
    * — at-least-once re-delivery (a rerun nightly, a replayed micro-batch)
    * hands the crashed request set back before any newer one, so current
    * membership ∩ remaining is exactly the surviving-member set the
    * crashed restore owed. */
  def recoverTakedown(spark: SparkSession, sigPath: String, gramPath: String,
                      remainingDocs: DataFrame, idCol: String,
                      textCol: String): Unit = {
    val mp = new org.apache.hadoop.fs.Path(s"$gramPath/$TakedownMarker")
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a predecessor that crashed between writing the .tmp and committing
    // the rename changed nothing (the delete runs only after the commit),
    // but its stale .tmp would survive vacuum and confuse inspection —
    // sweep it here, on every entry
    fs.delete(new org.apache.hadoop.fs.Path(s"$gramPath/$TakedownMarker.tmp"),
      false)
    if (fs.exists(mp)) {
      val in = fs.open(mp)
      val pinned =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toArray.sorted
        finally in.close()
      restoreReleases(spark, sigPath, gramPath, remainingDocs, idCol,
        textCol, pinned)
      dropMarker(spark, gramPath)
    }
  }

  /** Restore pass 1 + the orphan-gated pass 2 over `affected` — shared by
    * [[takedownDocs]] and [[recoverTakedown]]. */
  private def restoreReleases(spark: SparkSession, sigPath: String,
                              gramPath: String, remainingDocs: DataFrame,
                              idCol: String, textCol: String,
                              affected: Array[String]): Unit = {
    def restore(r: String): Unit = {
      spark.catalog.refreshByPath(sigPath)
      val members = SignatureStore.read(spark, sigPath)
        .where(col("release") === r)
        .select(col("doc_id").as("__m_id"))
      val docsR = remainingDocs.join(members,
        col(idCol).cast("long") === col("__m_id"), "left_semi")
      if (docsR.isEmpty)
        GramStore.vacuum(spark, gramPath, name => name != r)
      else
        GramStore.append(spark, gramPath, r, docsR, textCol)
    }
    affected.foreach(restore)
    lastRestorePasses = 1
    // Second pass over the SAME releases when more than one is affected
    // AND pass one actually lost a gram: the first pass restores
    // sequentially, so release rA's margin was computed while a
    // later-restored affected release rB still STALELY held a gram rB's
    // own takedown was about to drop — a gram live only in rA's surviving
    // docs but stored only under rB would end the first pass stored
    // nowhere. After pass one every affected partition reflects
    // post-delete membership (unaffected partitions were a fixed point
    // all along), so one more pass re-admits exactly those orphaned grams
    // and is itself a fixed point: a gram a pass-two restore adds is
    // excluded by every later restore's margin, never dropped again.
    //
    // The loss is DETECTED first — grams of the affected releases'
    // surviving member docs absent from the whole post-pass-one store —
    // and pass two runs only when that set is non-empty: the common
    // multi-release takedown (no gram straddles affected releases) pays
    // one gram pass over the affected survivors plus an anti-join, never
    // a second full margin rebuild (ReleaseBuildSpec pins the skip).
    if (affected.length > 1) {
      val members = SignatureStore.read(spark, sigPath)
        .where(col("release").isin(affected.toSeq: _*))
        .select(col("doc_id").as("__m_id"))
      val survivors = remainingDocs.join(members,
        col(idCol).cast("long") === col("__m_id"), "left_semi")
      spark.catalog.refreshByPath(gramPath)
      val orphaned = GramStore.grams(survivors, textCol)
        .join(GramStore.read(spark, gramPath).select("gram_h"),
          Seq("gram_h"), "left_anti")
      if (!orphaned.isEmpty) {
        affected.foreach(restore)
        lastRestorePasses = 2
      }
    }
  }

  /** REPAIR a corrupted release of the TEXT tier — the
    * [[IndexStore.repairRelease]] twin for the signature/gram stores, the
    * bounded recovery verb the integrity card (q207/q209) points at when
    * the torn tier is textual: a lost or bit-rotted release partition, a
    * crashed append's ghost rows, an operator-deleted directory.
    *
    * `docs` is the release's RETAINED source slice exactly (the same frame
    * a rerun of that night's append would get — recover it from the
    * signature store's membership joined to the corpus when the signature
    * partition survived, from the night's manifest otherwise). Both
    * repairs are one full rebuild-and-replace of the release's OWN
    * partition, never another release's bytes:
    *
    *   - **signatures**: partitions are independent (each release stores
    *     all its own documents' rows), so [[SignatureStore.append]]'s
    *     dynamic overwrite IS the repair — order-free, exact.
    *   - **grams**: the novel-margin layout makes the partition derived
    *     state — "this release's grams absent from every OTHER partition"
    *     — and [[GramStore.append]] re-derives exactly that margin against
    *     the REST of the store. With the other partitions intact this
    *     reproduces the original margin bit-for-bit: later releases
    *     excluded this release's grams when they appended, so a lost gram
    *     of this release lives nowhere else and re-admits; a gram its docs
    *     share with an EARLIER release was never in this partition and
    *     stays excluded (StoreRepairSpec pins repaired ≡ never-corrupted).
    *     One caveat, inherited from [[GramStore.vacuum]]'s documented
    *     conservativeness: if another release appended BETWEEN the tear
    *     and the repair, grams the tear had orphaned may have been
    *     admitted into that night's margin — provenance then differs from
    *     the never-torn history while novelty stays exact (one release per
    *     gram throughout, and the layout card stays zero). The divergence
    *     is BOUNDED and spec-pinned (StoreRepairSpec "gram repair after an
    *     interleaved append"): exactly the torn∩interleaved straddle set,
    *     re-homed to the interleaved release — never a lost gram, never a
    *     duplicated one.
    *
    * Cost: one pass over the release's slice (~200 B/doc signatures +
    * hashed-long grams) plus the margin's gram-keyed anti-join — release-
    * bounded, never corpus-text-sized. Idempotent: repairing a healthy
    * release rewrites it to itself. */
  def repairRelease(spark: SparkSession, sigPath: String, gramPath: String,
                    docs: DataFrame, idCol: String, textCol: String,
                    release: String): Unit = {
    SignatureStore.append(spark, sigPath, release, docs, idCol, textCol)
    GramStore.append(spark, gramPath, release, docs, textCol)
  }

  /** The pending-takedown marker's file name under the gram store —
    * newline-separated affected release names. Package-visible so specs
    * can plant a crashed predecessor. */
  private[graft] val TakedownMarker = "_TAKEDOWN_PENDING"

  /** Commit the marker via tmp-write + rename. The commit's atomicity is
    * the filesystem's rename — exact on HDFS/POSIX, NOT on bare object
    * stores (S3 renames are copy+delete); deployments there need an
    * HDFS-semantics committer layer, the same assumption every dynamic
    * partition overwrite in this repo already makes. */
  private def writeMarker(spark: SparkSession, gramPath: String,
                          affected: Array[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(gramPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$gramPath/$TakedownMarker.tmp")
    val out = fs.create(tmp, true)
    try out.write(affected.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val mp = new org.apache.hadoop.fs.Path(s"$gramPath/$TakedownMarker")
    fs.delete(mp, false)
    require(fs.rename(tmp, mp), s"failed to commit takedown marker $mp")
  }

  private def dropMarker(spark: SparkSession, gramPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(gramPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$gramPath/$TakedownMarker"),
      false)
    // and any uncommitted staging twin (see recoverTakedown's sweep)
    fs.delete(new org.apache.hadoop.fs.Path(s"$gramPath/$TakedownMarker.tmp"),
      false)
  }

  /** Restore passes the LAST [[takedownDocs]] call ran (1 = the orphan
    * probe found nothing and pass two was skipped) — test instrumentation
    * only, pinned by ReleaseBuildSpec's skip case. */
  @volatile private[graft] var lastRestorePasses: Int = 0
}
