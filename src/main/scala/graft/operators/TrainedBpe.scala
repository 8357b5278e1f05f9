package graft.operators

/** The TRAINED subword vocabulary fixture — [[Bpe.trainDict]]'s output at
  * real merge depth, checked in and applied as a declared-query vocab
  * (q86). The sf corpora's 30-word vocabulary exhausts pair merges at
  * ~90, so the fixture is trained on BpeBench's realistic synthetic
  * Zipf dictionary (100k syllable-composed words) — 1,500 merges deep,
  * and deliberately DISJOINT from the corpus generator's words: seeding
  * them would learn each as a whole unit and degenerate q86 to
  * n_sub = 1 everywhere, where the disjoint dictionary is the realistic
  * cross-domain application and gives corpus words non-trivial
  * multi-unit segmentations (BpeBench's fixture command documents the
  * same rationale). Regenerate with `runMain graft.tools.BpeBench
  * fixture` (deterministic: same dict, same trainer tie rules, same
  * bytes).
  *
  * Application mode is [[Subword]]'s greedy longest-match over the
  * merged-unit inventory (the WordPiece-style application of a
  * BPE-learned vocabulary — Schuster & Nakajima 2012 applying
  * Sennrich et al. 2016 units), which both engines replay exactly.
  */
object TrainedBpe {

  /** the trained merge list, in training order. */
  lazy val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges_trained.txt")
    require(in != null, "fixture resource /graft/bpe_merges_trained.txt missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val t = line.split("\t", 2)
          (t(0), t(1))
        }.toSeq
    } finally in.close()
  }

  /** the unit inventory as a greedy-longest-match vocabulary. */
  lazy val vocab: Subword.Vocab = Bpe.vocabOf(merges)
}
