package graft.transforms

/** Corpus-derived geometry defaults for the INDEX verb — ONE definition
  * shared by the verb and the scale harnesses, so the defaults a user
  * gets from a bare `INDEX … INTO` are exactly the sizing the harnesses
  * measured flat (graft.BandScale for cells ∝ corpus, graft.CosineScale
  * for 2^bits ∝ corpus).
  *
  * Why derived, not constant: a sign-LSH bucket is a FIXED 1/2^bits
  * slice of the sphere, so with constant bits the per-key collision
  * mass — and therefore probe cost — grows ∝ corpus (CosineScale
  * measured exponent +0.36 over 16× growth at fixed 4 bits, flat when
  * bits grew with log₂ corpus). Likewise a fixed cell count makes each
  * routed cell's row count grow ∝ corpus, while cells ∝ corpus keeps
  * the rows a probe batch scans corpus-independent (BandScale's probe
  * leg, exponent −0.04 over 16×). A constant default would hand a user
  * who runs the one-line INDEX on a big corpus an artifact whose probe
  * cost grows linearly — the exact failure the harnesses were built to
  * catch. The derived values are frozen into the artifact's `meta/` at
  * build time; probes and maintenance read geometry from meta, so
  * nothing downstream changes.
  */
object IndexGeometry {

  /** The derived-bits contract boundary (see [[cosineBits]]' CONTRACT
    * note): a stored-cosine probe at a threshold below this on an
    * artifact whose `bits` was DERIVED warns — the derivation targets
    * dedup-grade thresholds and recall at moderate ones may be
    * silently low (pin BITS and size TABLES up, or serve through
    * KNN/IVF, which reranks exactly). A warning, not an error: the
    * pairs the probe DOES return are exact-verified either way.
    */
  final val derivedBitsThresholdFloor = 0.8

  /** Cell-count cap shared by [[storeCells]] and [[ivfCells]]: one
    * directory per cell bounds build file counts, so past the cap
    * per-cell rows resume growing ∝ corpus. A derivation that HITS the
    * cap warns at build time (the INDEX verb) — the ≫300 M-entry user
    * should pin CELLS and shard the artifact before probes get slow.
    */
  final val maxCells = 65536


  /** Sign-LSH bucket width: 2^bits ∝ entries, targeting ~8 entries per
    * bucket per table (CosineScale's Bits0 = 8 at its 2000-vector base
    * corpus — this formula reproduces the harness's hand-sizing
    * bits = 8 + log₂(k) exactly at every measured k). Floor 4 keeps toy
    * corpora from degenerate 1-bucket tables; cap 30 is the parser's
    * own BITS bound.
    *
    * CONTRACT — derived width assumes DEDUP-grade thresholds (≈ 0.9+):
    * a true near-duplicate's per-hyperplane flip probability is ∝ its
    * tiny angle, so recall survives any bit width (re-ingested exact
    * copies share every bucket at every width). At MODERATE thresholds
    * (similarity search at ~0.5) a boundary pair's flip probability per
    * bit is ~0.35 and each added bit multiplies the per-table collision
    * odds by ~0.65 — wider derived buckets can deterministically miss
    * boundary pairs that 4 bits would catch. Users probing a stored
    * index at such thresholds should pin BITS (and size TABLES up)
    * explicitly, or serve through KNN/IVF, which reranks exactly. The
    * q153 gate pins its geometry for exactly this reason.
    */
  def cosineBits(entries: Long): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, entries / 8.0)) / math.log(2.0)).toInt
    math.min(30, math.max(4, raw))
  }

  /** Partition-cell count for the LSH/TYPO/COSINE stores: next power of
    * two of entries/5 — BandScale's sizing (512 cells at its 2 500-doc
    * base, cells ∝ corpus thereafter), which keeps a probe batch's
    * scanned ROW count (|batch keys| × entries/cells) constant as the
    * corpus grows. Floor 64 bounds toy-corpus file counts from below;
    * cap 65 536 bounds build file counts from above (the partitioned
    * write creates one directory per cell) — past the cap per-cell rows
    * resume growing ∝ corpus and a user indexing ≫ 300 M entries should
    * pin CELLS (and shard the artifact) explicitly.
    */
  def storeCells(entries: Long): Int = {
    val target = math.max(64L, entries / 5)
    val clamped = math.min(maxCells.toLong, target).toInt
    val hob = Integer.highestOneBit(clamped)
    if (hob == clamped) clamped else math.min(maxCells, hob << 1)
  }

  /** IVF cell count: ⌈√entries⌉ — the classical IVF sizing (probe work
    * ≈ cells for the centroid scan + entries/cells per probed cell is
    * minimized at √entries), floored at the KNN verb's 16-cell default
    * and capped like [[storeCells]]. The two-level build quantizer takes
    * over automatically above 64 cells, so the centroid scan itself
    * stays sub-linear at large counts.
    */
  def ivfCells(entries: Long): Int = {
    val target = math.max(16L, math.ceil(math.sqrt(entries.toDouble)).toLong)
    math.min(maxCells.toLong, target).toInt
  }

  /** PQ codebook size (codes per subspace) for `INDEX … PQ <m>` when
    * PQCODES is not pinned: 256 — the industry-standard byte-code width
    * (FAISS IVFADC's k* = 2^8; each code is one byte per subspace) —
    * clamped to the corpus's own entry count LAST (a codebook cannot
    * hold more distinct centroids than there are training subvectors,
    * so a 3-vector corpus gets 3 codes — and a 1-vector corpus 1 code,
    * degenerate but honest: a floor above the entry count would put a
    * promise in meta the codebook pick cannot honor).
    * Unlike cells/bits this default does
    * NOT grow with the corpus: ADC probe cost is ∝ candidates in the
    * routed cells (governed by [[ivfCells]]), and codebook width buys
    * shortlist QUALITY at a constant per-candidate cost, so a constant
    * is the scale-correct choice here.
    */
  def pqCodes(entries: Long): Int =
    math.max(1L, math.min(256L, entries)).toInt
}
