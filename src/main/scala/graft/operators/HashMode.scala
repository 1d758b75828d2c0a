package graft.operators

/** Hash-function choice for the fingerprinting operators
  * ([[TextAnalysis.winnowingFingerprints]], [[Dedup.minhashSignatures]]).
  *
  * [[HashMode.Md5]] produces byte-identical results in any engine — the
  * oracle-graded mode, kept as the default so every existing graded entry
  * is unchanged. [[HashMode.XxHash64]] is the production mode: Spark's
  * codegen'd 64-bit xxHash, roughly an order of magnitude cheaper per call
  * than a full md5 digest + hex slicing — at 100 TB the per-shingle /
  * per-character-position hash IS the dominant constant factor, so the
  * cheap hash is the one a cluster should run. Fingerprint/signature
  * values differ between modes (long vs 8-hex-char string) but every
  * guarantee — winnowing's shared-substring property, MinHash banding's
  * collision probability — is hash-agnostic, which is what the specs gate.
  */
sealed trait HashMode
object HashMode {
  /** md5 prefix slices — reproducible across engines (oracle mode). */
  case object Md5 extends HashMode
  /** Seeded xxhash64 — codegen'd, cheap (production mode). */
  case object XxHash64 extends HashMode
}
