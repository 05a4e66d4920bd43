package graft.automata

import scala.collection.mutable

/** Deterministic matcher table over ASCII 0..127, produced by subset
  * construction over the *union* of k pattern NFAs.
  *
  * Behavioural re-expression of the reference's merged DFA
  * (/root/reference/src/dfa/dfa.rs:250-413): a dense `numStates*128`
  * transition array (dfa.rs:53 uses the same dense shape) and, per state,
  * the id of the accepted pattern — ties broken by *minimum pattern index*,
  * i.e. first-defined-pattern-wins (dfa.rs:305-325).
  *
  * Serializable by design: compiled once on the driver and shipped to
  * executors inside a broadcast pattern bank; `next` is a single array read
  * on the tokenizer hot path.
  */
final class DenseDfa private[automata] (
    val numStates: Int,
    private val table: Array[Int],  // table(s*128 + c) = next state or -1
    private val acceptPattern: Array[Int] // acceptPattern(s) = pattern id or -1
) extends Serializable {

  @inline def next(state: Int, c: Int): Int =
    if (c >= 128 || c < 0) -1 else table(state * 128 + c)

  @inline def acceptedPattern(state: Int): Int = acceptPattern(state)

  /** Whole-string accept test: Some(patternId) iff the entire input is
    * accepted (reference contract: DFA::simulate, dfa.rs:161-203).
    */
  def simulate(input: String): Option[Int] = {
    var s = 0
    var i = 0
    val n = input.length
    while (i < n) {
      s = next(s, input.charAt(i))
      if (s < 0) return None
      i += 1
    }
    val p = acceptPattern(s)
    if (p >= 0) Some(p) else None
  }

  /** Whether ANY state has a transition on `c` — e.g. `canTransitionOn('\n')`
    * tells whether a pattern could match across line boundaries (the guard
    * the within-file log splitter needs: split points are line starts, which
    * is only sound when no timestamp can swallow a newline).
    */
  def canTransitionOn(c: Char): Boolean = {
    if (c >= 128) return false
    var s = 0
    while (s < numStates) {
      if (table(s * 128 + c) >= 0) return true
      s += 1
    }
    false
  }

  /** Longest match starting at `from`: packs (endExclusive, patternId) as
    * (end.toLong << 32) | patternId, or -1L when nothing matches. Implements
    * the last-accept memo the reference lexer uses for timestamps
    * (/root/reference/src/lexer/lexer.rs:284-305).
    */
  def longestMatch(input: CharSequence, from: Int): Long = {
    var s = 0
    var i = from
    val n = input.length
    var best = -1L
    while (i < n) {
      val c = input.charAt(i)
      if (c >= 128) return best
      s = table(s * 128 + c)
      if (s < 0) return best
      i += 1
      val p = acceptPattern(s)
      if (p >= 0) best = (i.toLong << 32) | (p & 0xFFFFFFFFL)
    }
    best
  }
}

/** Incremental per-character simulator over a [[DenseDfa]] — the standalone
  * equivalent of the reference's `DfaSimulator::simulate_single_char`
  * (/root/reference/src/dfa/dfa.rs:415-458): feed one character at a time,
  * get back (accepted pattern id or -1, still-valid). The tokenizers inline
  * this loop on the hot path; this class exposes it as the reusable
  * `regex-engine` surface (reference README.md:125-131).
  */
final class DfaSimulator(dfa: DenseDfa) {
  private var state: Int = 0

  def resetSimulation(): Unit = state = 0

  /** Step the simulation by one character. Returns the pattern id accepted
    * AT the new state (-1 if none) and whether the step found a valid
    * transition. On a dead end the current state is left UNCHANGED — exactly
    * the reference's `simulate_single_char` (dfa.rs:415-458) — so a later
    * character with a valid transition from the last good state resumes
    * matching without a [[resetSimulation]].
    */
  def simulateSingleChar(c: Char): (Int, Boolean) = {
    val nxt = dfa.next(state, c)
    if (nxt < 0) return (-1, false)
    state = nxt
    (dfa.acceptedPattern(nxt), true)
  }
}

object DenseDfa {

  /** Subset construction over the union of `nfas`; pattern id = index. */
  def fromNfas(nfas: Seq[Nfa]): DenseDfa = {
    // Merge into one global state space: global id = offset(i) + localState.
    val k = nfas.length
    val offsets = new Array[Int](k)
    var total = 0
    var i = 0
    while (i < k) { offsets(i) = total; total += nfas(i).stateCount; i += 1 }

    val acceptOf = new Array[Int](total) // global state -> pattern id or -1
    java.util.Arrays.fill(acceptOf, -1)
    i = 0
    while (i < k) { acceptOf(offsets(i) + nfas(i).accept) = i; i += 1 }

    def closure(states: Iterable[Int]): mutable.BitSet = {
      val seen = mutable.BitSet.empty
      val stack = mutable.ArrayDeque.from(states)
      states.foreach(seen += _)
      while (stack.nonEmpty) {
        val g = stack.removeLast()
        // Locate owning NFA by linear scan over k (k is small, compile-time only)
        var ni = k - 1
        while (offsets(ni) > g) ni -= 1
        val nfa = nfas(ni)
        val ts = nfa.transitionsFrom(g - offsets(ni))
        var j = 0
        while (j < ts.length) {
          val t = ts(j)
          if (t.isEpsilon) {
            val dst = offsets(ni) + t.to
            if (!seen.contains(dst)) { seen += dst; stack += dst }
          }
          j += 1
        }
      }
      seen
    }

    val startSet = closure(nfas.indices.map(ni => offsets(ni) + nfas(ni).start))

    val subsetToId = mutable.HashMap[mutable.BitSet, Int](startSet -> 0)
    val subsets = mutable.ArrayBuffer[mutable.BitSet](startSet)
    val rows = mutable.ArrayBuffer[Array[Int]]()
    val accepts = mutable.ArrayBuffer[Int]()
    val worklist = mutable.ArrayDeque(0)

    def acceptIdOf(set: mutable.BitSet): Int = {
      var best = -1
      set.foreach { g =>
        val p = acceptOf(g)
        if (p >= 0 && (best < 0 || p < best)) best = p
      }
      best
    }
    accepts += acceptIdOf(startSet)

    while (worklist.nonEmpty) {
      val sid = worklist.removeHead()
      val set = subsets(sid)
      // move(set, c) for all c at once: bucket destination states per symbol
      val buckets = Array.fill(128)(null: mutable.BitSet)
      set.foreach { g =>
        var ni = k - 1
        while (offsets(ni) > g) ni -= 1
        val nfa = nfas(ni)
        val ts = nfa.transitionsFrom(g - offsets(ni))
        var j = 0
        while (j < ts.length) {
          val t = ts(j)
          if (!t.isEpsilon) {
            val dst = offsets(ni) + t.to
            var c = 0
            while (c < 64) {
              if ((t.lo & (1L << c)) != 0) {
                if (buckets(c) == null) buckets(c) = mutable.BitSet.empty
                buckets(c) += dst
              }
              if ((t.hi & (1L << c)) != 0) {
                if (buckets(c + 64) == null) buckets(c + 64) = mutable.BitSet.empty
                buckets(c + 64) += dst
              }
              c += 1
            }
          }
          j += 1
        }
      }
      val row = new Array[Int](128)
      java.util.Arrays.fill(row, -1)
      var c = 0
      while (c < 128) {
        if (buckets(c) != null) {
          val dstSet = closure(buckets(c))
          val dstId = subsetToId.getOrElseUpdate(dstSet, {
            val id = subsets.length
            subsets += dstSet
            accepts += acceptIdOf(dstSet)
            worklist += id
            id
          })
          row(c) = dstId
        }
        c += 1
      }
      // rows may be appended out of order relative to subset creation; index by sid
      while (rows.length <= sid) rows += null
      rows(sid) = row
    }

    // Any subset created but never popped (impossible — worklist drains) and
    // rows alignment: ensure every subset has a row.
    while (rows.length < subsets.length) rows += null
    var s = 0
    while (s < subsets.length) {
      if (rows(s) == null) { rows(s) = new Array[Int](128); java.util.Arrays.fill(rows(s), -1) }
      s += 1
    }

    val flat = new Array[Int](subsets.length * 128)
    s = 0
    while (s < subsets.length) {
      System.arraycopy(rows(s), 0, flat, s * 128, 128)
      s += 1
    }
    new DenseDfa(subsets.length, flat, accepts.toArray)
  }

  /** Compile a list of pattern strings (priority = position). */
  def compile(patterns: Seq[String]): DenseDfa =
    fromNfas(patterns.map(p => Nfa.compile(graft.regex.RegexParser.parse(p))))
}
