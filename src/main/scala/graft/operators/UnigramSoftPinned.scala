package graft.operators

/** The corpus-pinned SOFT-EM Unigram vocabulary (piece -> e6 ln-cost) —
  * trained once from `Bpe.wordCounts(documents @ sf0.001, maxWords=300)`
  * with the `Unigram.trainSoft` defaults (maxPieceLen=6, seedTopN=150,
  * rounds=2, emIters=2, keepTopV=120). UnigramSpec retrains and asserts
  * equality; regenerate via `sbt "runMain graft.tools.RepinUnigram"`
  * after an intentional trainer change.
  */
private[operators] object PinnedSoftVocabData {
  val rows: Seq[(String, Long)] = Seq(
    "a" -> 2864559L, "ag" -> 20455969L, "agg" -> 4034285L, "al" -> 4292150L,
    "alu" -> 75646743L, "alue" -> 62415735L, "am" -> 41846500L, "an" -> 29087885L,
    "ar" -> 43292345L, "art" -> 43322874L, "as" -> 6928529L, "ash" -> 18614291L,
    "at" -> 3760829L, "b" -> 2990897L, "c" -> 3398028L, "ca" -> 64656765L,
    "can" -> 16916538L, "co" -> 61949520L, "col" -> 68159628L, "colu" -> 63667656L,
    "colum" -> 51747732L, "column" -> 4007506L, "ct" -> 99453138L, "cto" -> 84849467L,
    "ctor" -> 69413098L, "d" -> 4063219L, "de" -> 49486989L, "der" -> 34050619L,
    "e" -> 3373242L, "eam" -> 33289565L, "ector" -> 62435936L, "er" -> 4088168L,
    "erg" -> 33626704L, "erge" -> 20395696L, "ey" -> 21358429L, "f" -> 3380944L,
    "g" -> 4099351L, "ge" -> 21436375L, "gg" -> 15787847L, "gr" -> 44288154L,
    "gro" -> 32262117L, "grou" -> 43310166L, "group" -> 4053538L, "h" -> 3386130L,
    "ha" -> 29203412L, "has" -> 18614291L, "hash" -> 4065675L, "i" -> 3393591L,
    "in" -> 27103386L, "ind" -> 48751999L, "indow" -> 31491454L, "ine" -> 16523220L,
    "j" -> 31616281L, "jo" -> 52193703L, "joi" -> 51791626L, "join" -> 4051399L,
    "k" -> 4079570L, "ke" -> 55763060L, "key" -> 4041830L, "l" -> 2926631L,
    "li" -> 56921153L, "lin" -> 17271786L, "line" -> 4040778L, "lo" -> 44466934L,
    "low" -> 16985032L, "lumn" -> 33979839L, "m" -> 4075353L, "me" -> 19397325L,
    "mer" -> 4120323L, "merg" -> 17284019L, "merge" -> 4053011L, "mn" -> 50089361L,
    "n" -> 31536796L, "ndow" -> 42591072L, "ne" -> 28634864L, "o" -> 5712415L,
    "olumn" -> 18349216L, "or" -> 25813627L, "ord" -> 20266561L, "orde" -> 19446949L,
    "order" -> 4010579L, "ort" -> 16926767L, "oup" -> 33981459L, "ow" -> 4126676L,
    "p" -> 19639177L, "pa" -> 19192442L, "par" -> 4035717L, "part" -> 4066247L,
    "q" -> 31616281L, "quer" -> 55774769L, "query" -> 4053538L, "r" -> 4094353L,
    "rd" -> 38054268L, "rde" -> 37234657L, "rder" -> 21798287L, "rea" -> 36470175L,
    "ream" -> 20127490L, "rg" -> 43724942L, "rge" -> 30493934L, "ro" -> 16629898L,
    "roup" -> 20475222L, "rt" -> 30370657L, "s" -> 3022761L, "sc" -> 56815061L,
    "sca" -> 51741618L, "scan" -> 4001391L, "sh" -> 28439526L, "sl" -> 21330430L,
    "slo" -> 31551787L, "slow" -> 4069885L, "so" -> 29978948L, "sor" -> 16602959L,
    "sort" -> 4011620L, "st" -> 4045535L, "str" -> 39673188L, "stre" -> 30410943L,
    "strea" -> 20412417L, "stream" -> 4069732L, "t" -> 3181741L, "ta" -> 3769282L,
    "to" -> 4326014L, "tre" -> 43326090L, "trea" -> 33327564L, "tream" -> 16984879L,
    "u" -> 4102917L, "ue" -> 57983587L, "umn" -> 41626300L, "up" -> 7525722L,
    "v" -> 31616281L, "va" -> 39708586L, "val" -> 31191035L, "valu" -> 17267563L,
    "value" -> 4036555L, "ve" -> 43762952L, "vec" -> 35754931L, "vect" -> 34096796L,
    "vecto" -> 19493125L, "vector" -> 4056756L, "w" -> 15151129L, "win" -> 34285853L,
    "wind" -> 21270097L, "windo" -> 31491454L, "window" -> 4009552L, "y" -> 30331409L
  )
}
