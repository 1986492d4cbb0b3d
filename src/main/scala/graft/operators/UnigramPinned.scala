package graft.operators

/** The corpus-pinned Unigram vocabulary (piece -> e6 ln-cost) —
  * trained once from `Bpe.wordCounts(documents @ sf0.001, maxWords=300)`
  * with the `Unigram.train` defaults (maxPieceLen=6, seedTopN=150,
  * rounds=2, keepTopV=120). UnigramSpec retrains and asserts equality so
  * the constant stays tied to the trainer; regenerate via
  * `sbt "runMain graft.tools.RepinUnigram"` after an intentional change.
  */
private[operators] object PinnedVocabData {
  val rows: Seq[(String, Long)] = Seq(
    "a" -> 2966776L, "agg" -> 4022875L, "al" -> 4082320L, "at" -> 3383620L,
    "b" -> 2980372L, "c" -> 3387503L, "column" -> 3996980L, "d" -> 4052696L,
    "e" -> 3379751L, "er" -> 4061382L, "f" -> 3370418L, "g" -> 4091268L,
    "group" -> 4043013L, "h" -> 3375898L, "hash" -> 4054860L, "i" -> 3383066L,
    "j" -> 10882490L, "join" -> 4040874L, "k" -> 4069045L, "key" -> 4031305L,
    "l" -> 2974838L, "line" -> 4030247L, "m" -> 4082320L, "mer" -> 4092392L,
    "merge" -> 4041943L, "n" -> 10882490L, "o" -> 4092392L, "order" -> 4000052L,
    "ow" -> 4118605L, "p" -> 10882490L, "par" -> 4069045L, "part" -> 4012436L,
    "q" -> 10882490L, "query" -> 4043013L, "r" -> 4118605L, "s" -> 3382513L,
    "scan" -> 3990864L, "slow" -> 4057030L, "sort" -> 4001078L, "st" -> 3385837L,
    "stream" -> 4059204L, "t" -> 3372059L, "ta" -> 4076767L, "u" -> 4092392L,
    "up" -> 7515194L, "v" -> 10882490L, "value" -> 4026028L, "vector" -> 4046230L,
    "w" -> 10882490L, "window" -> 3999027L, "y" -> 10882490L)
}
