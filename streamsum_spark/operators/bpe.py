"""BPE tokenizer training and application over the corpus — the real
subword pipeline behind text_token_counts' BPE-ish regex estimate
(SURVEY §2 text family; the reference system has no tokenizer surface).

Algorithm: classic byte-pair-encoding merge learning (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public): words split to characters + an end-of-word marker; each round
merges the most frequent adjacent symbol pair (non-overlapping,
left-to-right) across the frequency-weighted vocabulary.

Spark-first scale shape — the corpus is touched ONCE:

- ``word_freqs`` is the only corpus-scan (explode + one shuffle with
  map-side combine).  Everything after runs on the DISTINCT-WORD
  relation, which is vocabulary-sized (~10^7-10^8 rows at 100 TB —
  gigabytes, not terabytes).
- Training is the classic HYBRID: the vocabulary-sized frequency
  table is collected ONCE behind an explicit row-count guard
  (``max_vocab_rows``) and the merge loop runs in driver memory with
  INCREMENTAL pair counts — each round touches only the words that
  contain the merged pair (indexed pair -> word set) and selects the
  next pair from a lazy-deletion max-heap, so a round costs
  O(affected symbol mass + log #pairs), NOT a Spark job.  Measured:
  2,000 merges over a 4,000-word synthetic vocabulary in ~1 s
  (sub-0.1 s per 100 rounds; pinned with a loose wall-clock bound in
  tests/test_bpe.py) vs ~60 s per 100 rounds for the per-round-job
  loop this replaces.  A production 32k-merge vocabulary is minutes
  of driver CPU instead of hours of job scheduling.
- Above the guard (vocabularies too large to collect) training falls
  back to the fully distributed per-round loop
  (``_train_bpe_distributed``): one pair-count aggregation per round
  (explode adjacent pairs -> groupBy sum -> top-1: ONE row per round
  crosses the wire) and an expression-level JVM-side fold rewriting
  the symbol arrays, localCheckpoint truncating lineage per round.
  Correct and shuffle-light, but O(n_merges) sequential jobs — the
  escape hatch, not the default.
- Tie-break is deterministic (max count, then lexicographically
  smallest pair) so the learned merge sequence is reproducible across
  engines, partitionings, and BOTH strategies — pinned identical to a
  pure-Python reference implementation (and cross-strategy) in
  tests/test_bpe.py.
- ``bpe_segment_words`` applies learned merges per DISTINCT word with
  a rank-greedy Arrow-batched pass (bounded per-word state — the
  SURVEY §4.2 Python license), and ``bpe_token_counts`` joins that
  vocabulary-sized mapping back onto the corpus tokens — AQE
  broadcasts the mapping while it measures small, shuffle-joins
  otherwise.  The corpus text itself is never shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark.functions.expressions import TOKENS_EXPR as _TOKS
from streamsum_spark.tables import table
from streamsum_spark.util import rebalance_for_cpu

if TYPE_CHECKING:
    import pandas as pd

END = "</w>"


def word_freqs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(word, freq) over the documents corpus — the one corpus scan."""
    if docs is None:
        docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(F.expr(_TOKS)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """(syms array<string>, freq): characters plus the end marker."""
    return wf.select(
        F.expr(f"array_append(split(word, ''), '{END}')").alias("syms"),
        "freq",
    )


def _merge_fold(a: str, b: str):
    """Column expression rewriting ``syms`` with pair (a, b) merged
    non-overlapping left-to-right — an expression-level fold, symbols
    passed as literals (never interpolated into SQL text)."""
    merged = F.lit(a + b)

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Merge all non-overlapping (a, b) occurrences left-to-right."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_bpe_inmemory(
    freqs: dict[str, int], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Classic incremental BPE trainer over a collected (word, freq)
    vocabulary: pair counts maintained as deltas (only words containing
    the merged pair are touched each round, via a pair -> word-index
    set), next pair selected from a lazy-deletion max-heap ordered
    (count desc, pair asc) — the exact tie-break of the distributed
    path and the pure-Python reference."""
    import heapq

    words: list[list] = [[list(w) + [END], f] for w, f in freqs.items()]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        # lazy deletion: top of heap must match the CURRENT count
        while heap and pair_counts.get(heap[0][1], 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap or -heap[0][0] < min_freq:
            break
        a, b = heap[0][1]
        merges.append((a, b))
        delta: dict[tuple[str, str], int] = {}
        for idx in pair_words.pop((a, b), set()):
            syms, f = words[idx]
            new = _merge_word(syms, a, b)
            for p in zip(syms, syms[1:]):
                delta[p] = delta.get(p, 0) - f
                s = pair_words.get(p)
                if s is not None:
                    s.discard(idx)
            for p in zip(new, new[1:]):
                delta[p] = delta.get(p, 0) + f
                pair_words.setdefault(p, set()).add(idx)
            words[idx][0] = new
        for p, d in delta.items():
            if d == 0:
                continue
            nc = pair_counts.get(p, 0) + d
            if nc > 0:
                pair_counts[p] = nc
                heapq.heappush(heap, (-nc, p))
            else:
                pair_counts.pop(p, None)
    return merges


def train_bpe(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 200,
    min_freq: int = 2,
    docs: DataFrame | None = None,
    max_vocab_rows: int = 20_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; stops early
    when the best pair's frequency drops below ``min_freq``.  Returns
    the ordered merge list (the tokenizer model).

    The corpus is scanned once (``word_freqs``, materialized via
    localCheckpoint).  When the distinct vocabulary fits the explicit
    ``max_vocab_rows`` guard it is collected and trained in driver
    memory with incremental pair counts — rounds cost milliseconds,
    not Spark jobs.  Larger vocabularies fall back to the distributed
    per-round loop.  Both paths learn the identical merge sequence
    (same deterministic tie-break; cross-pinned in tests)."""
    wf = word_freqs(spark, sf_dir, docs).localCheckpoint()
    if wf.count() <= max_vocab_rows:
        freqs = {r.word: r.freq for r in wf.collect()}
        return _train_bpe_inmemory(freqs, n_merges, min_freq)
    return _train_bpe_distributed(wf, n_merges, min_freq)


def _train_bpe_distributed(
    wf: DataFrame, n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Fully distributed fallback for vocabularies above the collect
    guard: one pair-count aggregation per merge round (ONE row to the
    driver per round) + a JVM-side expression fold rewriting symbols.
    O(n_merges) sequential jobs — use only when the vocabulary cannot
    be collected."""
    words = _initial_symbols(wf).localCheckpoint()
    # NOTE on round parallelism: the merge fold is an interpreted
    # higher-order function (not codegen'd), so rounds are CPU-bound
    # even on a small vocab relation — coalescing to fewer tasks was
    # measured SLOWER (14.8 s vs 12.4 s for 20 rounds at sf0.1 on 32
    # cores); keep the session's parallelism.
    merges: list[tuple[str, str]] = []
    pair_expr = (
        "explode(transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)))"
    )
    for _ in range(n_merges):
        top = (
            words.where(F.size("syms") > 1)
            .select(F.expr(pair_expr).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_freq:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        # checkpoint EVERY round: the fold is a higher-order function
        # (interpreted per element, not codegen'd), so leaving it
        # pending would re-evaluate it in both of the next round's
        # scans — materializing once is cheaper, and it truncates
        # lineage, the mandatory move for iterative DataFrame loops
        words = words.select(
            _merge_fold(a, b).alias("syms"), "freq"
        ).localCheckpoint()
    return merges


def _segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy application of learned merges to one word: repeatedly
    merge the best-ranked adjacent pair — the standard BPE apply
    algorithm, equivalent to replaying the merges in training order."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        a, b = syms[best], syms[best + 1]
        # merge ALL non-overlapping occurrences of this pair (matches
        # the training fold's left-to-right rewrite)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word) -> (word, pieces array<string>) for a DISTINCT-word
    relation, Arrow-batched; the merge ranks ride to executors as a
    closure (the model is n_merges pairs — KBs to low MBs, the same
    bounded-broadcast license as the decontaminate benchmark grams)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": pdf["word"].map(lambda w: _segment(w, ranks)),
                }
            )

    return words.select("word").mapInPandas(run, "word string, pieces array<string>")


def bpe_token_counts(
    spark: SparkSession,
    sf_dir: str,
    merges: list[tuple[str, str]],
    docs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) — the corpus tokenized with a
    learned model: per-word piece counts computed once on the distinct
    vocabulary, joined back onto the corpus word stream (AQE broadcasts
    the vocabulary-sized mapping when it fits), summed per document.
    The real-token-count twin of text_token_counts' regex estimate."""
    if docs is None:
        docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKS)).alias("word")
    ).where(F.col("word") != "")
    mapping = bpe_segment_words(
        tok.select("word").distinct(), merges
    ).select("word", F.size("pieces").cast("long").alias("n_pieces"))
    return (
        tok.join(mapping, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
        )
    )
